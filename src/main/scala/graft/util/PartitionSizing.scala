package graft.util

/** Data-scaled shuffle sizing for the suite drivers (r11 verdict #2).
  *
  * The initial shuffle partition count must grow with the data so
  * per-task buffers stay bounded (a fixed cpus-count made sf1mut tasks
  * 10× fatter than sf0.1's and heap-OOM'd an 8 GB driver), but must not
  * exceed what small data can amortize (a fixed 8×cpus was measured +9%
  * median per-query at sf0.1, 3× on per-round iterative loops). The
  * rule: ~one initial partition per MB of on-disk fixture input, clamped
  * to [cpus, 8×cpus] — compressed parquet bytes under-estimate the
  * exploded shuffle working set (postings, shingle and pair tables) by
  * roughly the 10–100× that makes 1 MB of source a sensible per-task
  * shuffle budget under an 8 GB heap with 32 concurrent tasks. AQE's
  * coalescer then merges small outputs back to the advisory size, so
  * over-partitioning costs only scheduling, never skew.
  */
object PartitionSizing {

  /** Initial AQE shuffle partitions for a fixture directory. Falls back
    * to `cpus` when the directory cannot be sized. */
  def initialPartitions(sfDir: String, cpus: Int): Int = {
    val inputMb = try {
      val p = new org.apache.hadoop.fs.Path(sfDir)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      (fs.getContentSummary(p).getLength >> 20).toInt
    } catch { case _: Throwable => 0 }
    math.max(cpus, math.min(8 * cpus, inputMb))
  }
}
