package graft.streaming

import graft.SparkSpec
import graft.operators.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Batch ↔ streaming equivalence for gap sessionization: the incremental
  * `flatMapGroupsWithState` path (streaming.Sessionize) and the window-based
  * batch path (operators.Sessions) must produce IDENTICAL sessions on the
  * same events — the Kappa-architecture guarantee that a backfill through
  * the batch operator agrees with what the live stream emitted. */
class BatchStreamParitySpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 30L * 60 * 1000

  // deterministic pseudo-random event set: 5 users × 40 events, gaps
  // drawn from a fixed LCG so some land on either side of the threshold
  private val events: Seq[(Long, Timestamp)] = {
    var seed = 42L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    (1L to 5L).flatMap { u =>
      var t = Timestamp.valueOf("2024-01-01 08:00:00").getTime + u * 1000
      (1 to 40).map { _ =>
        val gap = math.abs(next()) % (3 * GapMs) // 0..90 min
        t += gap
        (u, new Timestamp(t))
      }
    }
  }

  test("streaming sessions == batch sessions on the same event set") {
    // --- streaming path: feed everything, then a far-future sentinel event
    // advances the watermark so every open session closes via timeout
    val mem = MemoryStream[SessionEvent](spark)
    val q = Sessionize.sessions(
        mem.toDS().withWatermark("ts", "0 seconds").as[SessionEvent], GapMs)
      .writeStream.format("memory").queryName("parity_sessions")
      .outputMode("append").start()
    mem.addData(events.map { case (u, ts) => SessionEvent(u, ts, "e") }: _*)
    q.processAllAvailable()
    mem.addData(SessionEvent(999L, Timestamp.valueOf("2030-01-01 00:00:00"), "e"))
    q.processAllAvailable()
    val streamed = spark.table("parity_sessions")
      .where(col("user_id") =!= 999L)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    q.stop()

    // --- batch path over the identical rows
    val batch = Sessions.sessionize(
        events.toDF("user_id", "ts").withColumn("event_id", monotonically_increasing_id()),
        col("user_id"), col("ts"), col("event_id"), GapMs * 1000)
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

    assert(streamed.nonEmpty && streamed.size > 5, "fixture must yield several sessions")
    assert(streamed == batch,
      s"batch-only: ${batch -- streamed}; stream-only: ${streamed -- batch}")
  }

  test("streaming rate-limit verdicts == batch verdicts on the same event set") {
    // anchors q_stream_rate_limit's batch twin to the live operator: both
    // run RateLimit.foldBucket, and this proves the micro-batched streaming
    // delivery (state carried across triggers) replays to the identical
    // verdict sequence. capacity 2, 1 token per 10 min over 0–90 min gaps
    // → a real mix of admits and rejects.
    val cap = 2.0
    val rate = 1.0 / 600.0
    val rateEvents = events.zipWithIndex.map { case ((u, ts), i) =>
      RateEvent(u.toString, ts, i.toLong)
    }
    val mem = MemoryStream[RateEvent](spark)
    val q = RateLimit.admit(
        mem.toDS().withWatermark("ts", "0 seconds").as[RateEvent], cap, rate)
      .writeStream.format("memory").queryName("parity_rate")
      .outputMode("append").start()
    // two waves: state must carry across micro-batches (per key, events
    // stay time-ordered across the split — delivery order within a key is
    // what the state contract guarantees under event-time processing)
    val (w1, w2) = rateEvents.sortBy(e => (e.ts.getTime, e.payload))
      .splitAt(rateEvents.size / 2)
    mem.addData(w1: _*)
    q.processAllAvailable()
    mem.addData(w2: _*)
    q.processAllAvailable()
    val streamed = spark.table("parity_rate")
      .select(col("key"), col("payload"), col("admitted"))
      .as[(String, Long, Boolean)].collect().toSet
    q.stop()

    val batch = RateLimit.admitBatch(rateEvents.toDS(), cap, rate)
      .select(col("key"), col("payload"), col("admitted"))
      .as[(String, Long, Boolean)].collect().toSet

    assert(batch.count(_._3) > 0 && batch.count(!_._3) > 0,
      "fixture must yield both admits and rejects")
    assert(streamed == batch,
      s"batch-only: ${batch -- streamed}; stream-only: ${streamed -- batch}")
  }
}
