package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Token-bucket rate limiter: event-time refill, per-key isolation,
  * replay determinism. */
class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private def run(events: Seq[RateEvent], capacity: Double,
                  ratePerSec: Double): Seq[RateVerdict] = {
    val mem = MemoryStream[RateEvent](spark)
    mem.addData(events: _*)
    val q = RateLimit.admit(
      mem.toDS().withWatermark("ts", "10 seconds").as[RateEvent],
      capacity, ratePerSec)
      .writeStream.format("memory").queryName("rl_out")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("rl_out")
      .as[RateVerdict].collect().toSeq.sortBy(v => (v.key, v.ts.getTime, v.payload))
    spark.sql("DROP TABLE IF EXISTS rl_out")
    out
  }

  test("a burst beyond capacity is rejected until event-time refill") {
    // capacity 2, 1 token/sec: t0 and t0 admitted, third at t0 rejected,
    // t+1s admitted (refilled 1 token), t+1.5s rejected again
    val events = Seq(
      RateEvent("k", ts(0), 1), RateEvent("k", ts(0), 2), RateEvent("k", ts(0), 3),
      RateEvent("k", ts(1), 4), RateEvent("k", ts(1), 5))
    val out = run(events, capacity = 2.0, ratePerSec = 1.0)
    assert(out.map(v => (v.payload, v.admitted)) ==
      Seq((1L, true), (2L, true), (3L, false), (4L, true), (5L, false)))
  }

  test("keys have independent buckets") {
    val events = Seq(
      RateEvent("a", ts(0), 1), RateEvent("a", ts(0), 2),
      RateEvent("b", ts(0), 3), RateEvent("b", ts(0), 4))
    val out = run(events, capacity = 1.0, ratePerSec = 0.1)
    assert(out.map(v => (v.key, v.payload, v.admitted)) ==
      Seq(("a", 1L, true), ("a", 2L, false), ("b", 3L, true), ("b", 4L, false)))
  }

  test("replaying the identical stream yields identical verdicts (event-time determinism)") {
    val events = (0 until 20).map(i => RateEvent("k", ts(i / 2), i.toLong))
    val a = run(events, capacity = 3.0, ratePerSec = 0.5)
    val b = run(events, capacity = 3.0, ratePerSec = 0.5)
    assert(a == b)
    assert(a.count(_.admitted) > 0 && a.count(!_.admitted) > 0)
  }
}
