package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-fill contract: per-key calendar spans, last-in-bucket tiebreak,
  * forward fill of missing days, observed flags. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: two events on Jan 1 (the later one must win), then a gap
    // until Jan 4 — days 2 and 3 must be filled with 20.0
    (1L, ts("2024-01-01 09:00:00"), 10.0, 100L),
    (1L, ts("2024-01-01 17:00:00"), 20.0, 101L),
    (1L, ts("2024-01-04 12:00:00"), 40.0, 102L),
    // user 2: a single day — exactly one output row, no fill
    (2L, ts("2024-02-10 00:00:00"), 7.0, 200L)
  ).toDF("user_id", "ts", "value", "event_id")

  private def run() = Resample
    .dailyLocf(events, col("user_id"), col("ts"), col("value"), col("event_id"))
    .select(col("key"), col("day").cast("string").as("day"), col("value"), col("observed"))
    .as[(Long, String, Double, Boolean)].collect().toSet

  test("per-key span, last-in-bucket wins, gaps forward-filled") {
    assert(run() == Set(
      (1L, "2024-01-01", 20.0, true),
      (1L, "2024-01-02", 20.0, false),
      (1L, "2024-01-03", 20.0, false),
      (1L, "2024-01-04", 40.0, true),
      (2L, "2024-02-10", 7.0, true)))
  }

  test("same-timestamp ties break on the tiebreak column") {
    val tied = Seq(
      (1L, ts("2024-03-01 09:00:00"), 1.0, 5L),
      (1L, ts("2024-03-01 09:00:00"), 2.0, 6L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Resample.dailyLocf(tied, col("user_id"), col("ts"),
      col("value"), col("event_id")).select("value").as[Double].collect()
    assert(out.toSeq == Seq(2.0), "highest tiebreak id must win")
  }
}
