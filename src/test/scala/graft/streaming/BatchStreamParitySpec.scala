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
}
