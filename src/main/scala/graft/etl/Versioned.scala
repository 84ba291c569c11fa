package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table with time travel — the lakehouse read
  * contract (Delta/Iceberg-style) built from primitives already in the
  * library: each commit writes a new immutable `v=<n>` directory, then a
  * one-line `_latest` pointer flips atomically (a rename of a tiny file
  * is atomic on HDFS-like stores and on the local FS). Readers resolve
  * the pointer once and then scan an immutable directory, so a reader
  * never observes a half-written version and concurrent commits never
  * disturb in-flight scans — the property the `.old`-swap sinks
  * ([[graft.util.Fs]]) provide for single-version tables, extended to a
  * retained history.
  *
  * At 100 TB: commits are O(new data) writes + one pointer rename;
  * `vacuum` bounds storage by dropping versions older than the retention
  * window (never the live one). Schema: whatever each commit wrote —
  * schema evolution is the writer's concern, as in any directory table.
  *
  * Concurrency contract: SINGLE WRITER (the usual table-format default
  * without a lock service) — two racing commits could claim the same
  * version directory. Readers are unrestricted. [[commitIdempotent]]
  * gives replay-safety for exactly-once streaming sinks: a batch id
  * already at-or-behind the live version is a no-op, so foreachBatch
  * re-deliveries after a crash never double-commit.
  */
object Versioned {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(s"$root/_latest")
  private def pointerTmp(root: String) = new Path(s"$root/_latest.tmp")

  /** The pointer flip is write-tmp → delete-live → rename-tmp (rename
    * does not overwrite on HDFS-like stores, hence the delete). A crash
    * between the delete and the rename would otherwise erase the pointer
    * and reset versioning to v=0 — but `_latest.tmp` is always fully
    * written and closed before the delete, so it IS the live pointer:
    * finish the interrupted rename before any read or commit. Safe under
    * the single-writer contract; a racing reader's recovery rename at
    * worst fails benignly after the writer's own rename won. */
  private def recoverPointer(f: org.apache.hadoop.fs.FileSystem,
                             root: String): Unit =
    if (!f.exists(pointer(root)) && f.exists(pointerTmp(root)))
      f.rename(pointerTmp(root), pointer(root))

  private def readPointer(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    recoverPointer(f, root)
    if (!f.exists(pointer(root))) None
    else {
      val in = f.open(pointer(root))
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Commit `df` as the next version; returns the new version number.
    * The data lands fully before the pointer flips. */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long = {
    val f = fs(spark, root)
    val next = readPointer(spark, root).map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    val tmp = new Path(s"$root/_latest.tmp")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(pointer(root))) f.delete(pointer(root), false)
    f.rename(tmp, pointer(root))
    next
  }

  /** Idempotent commit keyed by a monotonically-increasing `batchId`
    * (Structured Streaming's foreachBatch contract): commits as version
    * `batchId` exactly once; a replayed batch (id ≤ live version) is a
    * no-op. Returns true iff this call performed the commit. */
  def commitIdempotent(spark: SparkSession, root: String,
                       df: DataFrame, batchId: Long): Boolean = {
    readPointer(spark, root) match {
      case Some(live) if batchId <= live => false
      case prior =>
        require(batchId == prior.map(_ + 1).getOrElse(0L),
          s"non-contiguous batchId $batchId after version $prior")
        val f = fs(spark, root)
        df.write.mode("overwrite").parquet(s"$root/v=$batchId")
        val tmp = new Path(s"$root/_latest.tmp")
        val out = f.create(tmp, true)
        try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
        if (f.exists(pointer(root))) f.delete(pointer(root), false)
        f.rename(tmp, pointer(root))
        true
    }
  }

  /** Latest committed version number, if any commit exists. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    readPointer(spark, root)

  /** Read the latest snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root,
      latestVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed version under $root")))

  /** Time travel: read snapshot `version` exactly as committed. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val dir = s"$root/v=$version"
    require(fs(spark, root).exists(new Path(dir)),
      s"version $version does not exist under $root")
    spark.read.parquet(dir)
  }

  /** Drop versions older than `keepLast` behind the live one; never the
    * live version itself. Returns dropped version numbers. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val live = latestVersion(spark, root).getOrElse(return Nil)
    val f = fs(spark, root)
    val cutoff = live - keepLast + 1
    val dropped = f.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
      .filter(_ < cutoff).sorted
    dropped.foreach(v => f.delete(new Path(s"$root/v=$v"), true))
    dropped
  }
}
