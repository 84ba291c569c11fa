package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming key-latest upsert into a parquet table via `foreachBatch` —
  * the "materialized dimension" sink: each micro-batch merges into the
  * store keeping one row per key, the one with the greatest
  * `(ts, tieBreak)`.
  *
  * Idempotent by construction: merging the same batch twice (failure
  * replay between checkpoint commits) reduces to the same keep-latest
  * winner, so re-delivery cannot corrupt the table — the exactly-once
  * story for a sink Spark does not natively transact against.
  *
  * Write discipline: the merge result lands in `<path>.tmp` and swaps in
  * with two renames (table → `.old`, tmp → table) — never an in-place
  * overwrite of the directory being read, which races the scan that feeds
  * the merge. (On object stores, swap the rename for a transactional table
  * format; the merge semantics here are exactly a Delta/Iceberg MERGE's
  * keep-latest specialization.)
  *
  * Scale: the merge is one window over hash(key) — the same single-shuffle
  * shape as batch sessionization. State lives in the table, not the
  * stream: no growing in-memory state store.
  */
object Upsert {

  /** Last-writer-wins reduction: one row per `key`, the one with the
    * greatest (ts, tieBreak) — the pure merge step [[mergeLatest]] applies
    * per micro-batch, exposed so the batch twin (and its DuckDB gate row,
    * q_stream_upsert_latest) anchors the EXACT logic the streaming sink
    * runs. One hash exchange on the key; per-key top-1 via row_number, no
    * global sort. */
  def keepLatest(df: DataFrame, key: String, ts: String,
                 tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Merge `updates` into the parquet table at `path`, keeping per key the
    * row with max (ts, tieBreak). Exposed for direct batch use + tests. */
  def mergeLatest(updates: DataFrame, path: String,
                  key: String, ts: String, tieBreak: String): Unit = {
    val spark = updates.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    // crash recovery: a failure between the two swap renames leaves the
    // table at `.old` only — restore it before reading
    graft.util.Fs.recover(fs, cur)
    val existing =
      if (fs.exists(cur)) spark.read.parquet(path).select(updates.columns.map(col): _*)
      else updates.limit(0)
    val merged = keepLatest(existing.unionByName(updates), key, ts, tieBreak)

    val tmp = new Path(path + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    graft.util.Fs.swapInto(fs, tmp, cur)
  }

  /** Streaming writer: AvailableNow-drains `updates` into the keyed table.
    * Caller starts/awaits; checkpointing makes batch replay the only
    * failure mode — which [[mergeLatest]] absorbs idempotently. */
  def upsertLatest(updates: DataFrame, path: String, checkpoint: String,
                   key: String, ts: String, tieBreak: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeLatest(batch, path, key, ts, tieBreak)
      }
  }
}
