package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Batch sessionization contract: gap strictly-greater splits, per-key
  * isolation, tie-break determinism, reserved-name guard. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("gap > threshold starts a new session; <= threshold continues") {
    val df = Seq(
      (1L, "u1", ts("09:00:00")), // session 1
      (2L, "u1", ts("09:29:00")), // +29m → still 1
      (3L, "u1", ts("09:59:00")), // +30m exactly → still 1 (strict >)
      (4L, "u1", ts("10:30:00")), // +31m → session 2
      (5L, "u2", ts("09:00:00"))  // other key → its own session 1
    ).toDF("event_id", "user_id", "ts")
    val out = Sessions.sessionize(df, col("user_id"), col("ts"), col("event_id"),
        gapUs = 30L * 60 * 1000000)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 2L)
    assert(out(5L) == 1L)
  }

  test("equal timestamps order by tie-break, never split") {
    val df = Seq(
      (2L, "u", ts("09:00:00")),
      (1L, "u", ts("09:00:00")),
      (3L, "u", ts("11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessions.sessionize(df, col("user_id"), col("ts"), col("event_id"),
        gapUs = 60L * 1000000)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 2L)
  }

  test("reserved column names are rejected") {
    val df = Seq((1L, "u", ts("09:00:00"), 0L)).toDF("event_id", "user_id", "ts", "__us")
    val e = intercept[IllegalArgumentException] {
      Sessions.sessionize(df, col("user_id"), col("ts"), col("event_id"), 1000L)
    }
    assert(e.getMessage.contains("__us"))
  }
}
