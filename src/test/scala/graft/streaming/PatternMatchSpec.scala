package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** CEP pattern-detection contract: greedy-earliest non-overlapping
  * matching, span expiry with re-arm, noise transparency, and
  * stream/batch parity on a randomized interleaving. */
class PatternMatchSpec extends SparkSpec {
  import spark.implicits._

  private val pat = Seq("view", "cart", "buy")
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private def ev(u: Long, m: Int, t: String) = SessionEvent(u, ts(m), t)

  private def runStream(events: Seq[SessionEvent], spanMs: Long,
                        name: String): Set[PatternHit] = {
    val mem = MemoryStream[SessionEvent](spark)
    val hits = PatternMatch.detect(
      mem.toDS().withWatermark("ts", "10 minutes").as[SessionEvent],
      pat, spanMs)
    val q = hits.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      events.foreach { e => mem.addData(e); q.processAllAvailable() }
      spark.table(name).as[PatternHit].collect().toSet
    } finally q.stop()
  }

  test("completes a sequence within span; ignores noise; resets after match") {
    val events = Seq(
      ev(1, 0, "view"), ev(1, 1, "scroll"), ev(1, 2, "cart"),
      ev(1, 3, "scroll"), ev(1, 4, "buy"), // hit 1: 0 → 4
      ev(1, 5, "view"), ev(1, 6, "cart"), ev(1, 7, "buy")) // hit 2: 5 → 7
    val got = runStream(events, spanMs = 10 * 60 * 1000L, "pat_basic")
    assert(got == Set(
      PatternHit(1, ts(0), ts(4), 4 * 60 * 1000L),
      PatternHit(1, ts(5), ts(7), 2 * 60 * 1000L)))
  }

  test("span expiry discards the partial and re-arms on a fresh head stage") {
    val events = Seq(
      ev(2, 0, "view"), ev(2, 1, "cart"),
      ev(2, 8, "buy"), // 8 min > 5 min span: expired, buy is not a head
      ev(2, 9, "view"), ev(2, 10, "cart"), ev(2, 11, "buy")) // hit: 9 → 11
    val got = runStream(events, spanMs = 5 * 60 * 1000L, "pat_expiry")
    assert(got == Set(PatternHit(2, ts(9), ts(11), 2 * 60 * 1000L)))
  }

  test("matches never overlap: completion resets instead of sharing a prefix") {
    val events = Seq(
      ev(3, 0, "view"), ev(3, 1, "cart"), ev(3, 2, "buy"),
      ev(3, 3, "buy")) // second buy has no open partial
    val got = runStream(events, spanMs = 10 * 60 * 1000L, "pat_overlap")
    assert(got == Set(PatternHit(3, ts(0), ts(2), 2 * 60 * 1000L)))
  }

  test("stream output equals the batch twin on a randomized interleaving") {
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "cart", "buy", "scroll", "ping")
    val events = (0 until 120).map { i =>
      ev(1 + rnd.nextInt(4), i % 60, types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts.getTime, e.user_id))
    val spanMs = 7 * 60 * 1000L
    val streamed = runStream(events, spanMs, "pat_parity")
    val batch = PatternMatch.detectBatch(
      spark.createDataset(events), pat, spanMs).collect().toSet
    assert(streamed == batch)
  }
}
