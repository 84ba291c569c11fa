package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-series resampling with gap filling — regularize an irregular event
  * stream onto a fixed calendar grid and carry the last observation
  * forward (the standard feature-engineering step before joining
  * time-series features to training examples).
  *
  * Plan shape at scale: one shuffle keyed (key, bucket) reduces events to
  * at most one observation per bucket BEFORE the calendar spine
  * materializes, so the expensive part is bounded by keys × buckets, not
  * by raw event volume; the spine explode is a per-key `sequence` (no
  * cross join against a calendar dimension); the forward fill is one
  * running `last(ignoreNulls)` window over the same key partitioning the
  * join just produced — Catalyst reuses the exchange.
  *
  * Determinism: "last observation in a bucket" ties break on a caller
  * tiebreak column (unique event id), and the fill copies values verbatim
  * — no arithmetic, so the DuckDB oracle reproduces rows exactly.
  */
object Resample {

  /** Daily last-observation-carried-forward series per key.
    *
    * Output: (key, day DATE, value, observed) — one row per key per day
    * of the key's own [min, max] observed-day range; `observed` marks
    * buckets with a real event, filled buckets repeat the latest prior
    * value. */
  def dailyLocf(df: DataFrame, key: Column, ts: Column, value: Column,
                tiebreak: Column): DataFrame = {
    val base = df.select(key.as("key"),
      to_date(date_trunc("DAY", ts)).as("day"),
      ts.as("__ts"), tiebreak.as("__tb"), value.as("value"))
    val wLast = Window.partitionBy(col("key"), col("day"))
      .orderBy(col("__ts").desc, col("__tb").desc)
    val obs = base.withColumn("__rn", row_number().over(wLast))
      .where(col("__rn") === 1)
      .select(col("key"), col("day"), col("value"))
    val spine = obs.groupBy(col("key"))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col("key"), explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("key", "day"), "left")
      .withColumn("observed", col("value").isNotNull)
      .withColumn("value", last(col("value"), ignoreNulls = true).over(wFill))
      .select("key", "day", "value", "observed")
  }
}
