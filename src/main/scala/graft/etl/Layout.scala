package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Write-side data layout for read-side data skipping.
  *
  * At 100 TB the cheapest scan is the one that never happens: parquet
  * readers (Spark included) prune row groups and files whose column
  * min/max statistics exclude the predicate. Those statistics only help
  * when the writer CLUSTERS values — a randomly-ordered write leaves every
  * file's [min, max] spanning the whole domain and nothing prunes.
  *
  * [[writeSorted]] range-partitions by the cluster key(s) and sorts within
  * partitions, so each output file owns a narrow, disjoint key range —
  * point/range predicates on the leading key touch O(1) of the files.
  *
  * [[zorder2]] interleaves the bits of TWO dimensions into one sort key, so
  * clustering serves predicates on either dimension (a lexicographic sort
  * only serves the leading one): a z-range contains each dimension's range
  * at ~√(selectivity) — the standard multi-dimensional layout trick
  * (Z-ordering), implemented as pure integer Column algebra.
  */
object Layout {

  /** Range-partition + in-partition sort + parquet write: `targetFiles`
    * files with disjoint sorted key ranges (Spark's range partitioner
    * samples boundaries; sortWithinPartitions makes row groups monotonic
    * inside each file). */
  def writeSorted(df: DataFrame, sortCols: Seq[Column], path: String,
                  targetFiles: Int): Unit = {
    require(sortCols.nonEmpty, "need at least one sort column")
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    df.repartitionByRange(targetFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: bin-pack a parquet directory's files into
    * ≈`targetBytes` outputs. The small-files problem is a read-side tax at
    * scale (one scheduler task + one open per file; metadata pressure), so
    * ingest pipelines compact after every append wave. `coalesce` (no
    * shuffle) merges inputs; the result swaps in atomically via the same
    * two-rename discipline as the streaming upsert sink. Returns
    * (filesBefore, filesAfter); a no-op when already compact. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val cur = new org.apache.hadoop.fs.Path(path)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.util.Fs.recover(fs, cur)
    val files = fs.listStatus(cur).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    if (n >= files.length) return (files.length, files.length)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    graft.util.Fs.swapInto(fs, tmp, cur)
    val after = fs.listStatus(cur).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** 64-bit Morton (Z-order) value of two non-negative dimensions that fit
    * in 32 bits: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Deterministic integer algebra — bitwise identical cross-engine. */
  def zorder2(x: Column, y: Column): Column = {
    val xL = x.cast("long")
    val yL = y.cast("long")
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, i) =>
      acc +
        call_function("shiftleft",
          call_function("shiftright", xL, i).bitwiseAND(lit(1L)), i * 2) +
        call_function("shiftleft",
          call_function("shiftright", yL, i).bitwiseAND(lit(1L)), i * 2 + 1))
  }
}
