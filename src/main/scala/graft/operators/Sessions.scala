package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Batch gap-based sessionization: assign every event a per-key session
  * index such that consecutive events more than `gapUs` apart start a new
  * session (the batch twin of `graft.streaming.Sessionize`, which holds the
  * same semantics incrementally with `flatMapGroupsWithState`).
  *
  * Plan shape (the one you want at 100 TB): a single hash exchange on the
  * session key feeds BOTH windows — `lag` to detect gaps and the running
  * `sum` that turns gap flags into session ordinals share the identical
  * (partition, order) spec, so Catalyst plans one Exchange + one Sort and
  * evaluates the two frames in a single WindowExec pass. No second shuffle,
  * no self-join.
  *
  * Scale caveat (same as the as-of join): parallelism is bounded by the
  * number of distinct keys. For user-keyed event streams (millions of
  * users) that is ideal; for 3-key corpora, pre-split the key space by
  * time bucket and stitch (see `AsOfJoin.lastValueBeforeSalted`).
  */
object Sessions {

  /** Appends `session_idx` (1-based, per key, in `(ts, tieBreak)` order).
    *
    * `ts` must be a TimestampType column; gap comparison happens on exact
    * integer microseconds (`unix_micros`), so results are bitwise
    * reproducible across engines — no double arithmetic anywhere.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                 gapUs: Long): DataFrame = {
    val reserved = Seq("__us", "__new", "session_idx")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty, s"input columns clash with reserved names: ${clash.mkString(",")}")
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")

    val w = Window.partitionBy(key).orderBy(col("__us"), tieBreak)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__us", unix_micros(ts))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
             col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run))
      .drop("__us", "__new")
  }
}
