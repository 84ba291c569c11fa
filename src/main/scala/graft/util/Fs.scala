package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Directory-swap discipline shared by the rewrite-style sinks (streaming
  * upsert, compaction): never overwrite a directory in place while readers
  * (including the job's own input scan) may hold it open. */
object Fs {

  /** If a previous swap crashed between renames, the table lives at
    * `.old` — restore it. */
  def recover(fs: FileSystem, cur: Path): Unit = {
    val old = new Path(cur.toString + ".old")
    if (!fs.exists(cur) && fs.exists(old)) fs.rename(old, cur)
  }

  /** Atomically (two renames) replace `cur` with `tmp`; `.old` is the
    * crash-recovery intermediate and is deleted on success. */
  def swapInto(fs: FileSystem, tmp: Path, cur: Path): Unit = {
    val old = new Path(cur.toString + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(tmp, cur)
    fs.delete(old, true)
  }
}
