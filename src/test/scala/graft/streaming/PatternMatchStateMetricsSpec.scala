package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Numeric state-store contract for [[PatternMatch.detect]] (r7 verdict
  * ask #8): under a 100k-user randomized stream the CEP operator's state
  * must track OPEN PARTIALS, not events and not users-ever-seen, and the
  * watermark must evict expired partials to zero. The structural specs
  * (parity, provider matrix) prove values; this one pins the scale
  * contract with the engine's own StateOperatorProgress numbers:
  *
  *  - peak `numRowsTotal` == exactly the open-partial count (60k), not
  *    the 180k events or 100k users that flowed through;
  *  - `numRowsRemoved` across the run == every expired partial (eviction
  *    actually fires — state is not write-only);
  *  - final `numRowsTotal` == 0 once the watermark passes every span;
  *  - peak `memoryUsedBytes` stays far under the heap (a per-partial
  *    fixed-size record, not per-event buffering).
  */
class PatternMatchStateMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  test("100k-user stream: state rows = open partials, evicted to zero") {
    val users = 100000
    val rnd = new scala.util.Random(42)
    // 40% of users complete view→click→purchase inside the 60 s span
    // (state never persisted past their batch); the rest leave an open
    // stage-1 partial that only the watermark can remove
    val completing = (0 until users).filter(_ => rnd.nextDouble() < 0.4)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val views = (0 until users).map(u =>
      SessionEvent(u.toLong, ts(base + u), "view"))
    val follows = completing.flatMap(u => Seq(
      SessionEvent(u.toLong, ts(base + u + 10000), "click"),
      SessionEvent(u.toLong, ts(base + u + 20000), "purchase")))
    val nOpen = users - completing.size

    val mem = MemoryStream[SessionEvent](spark)
    val query = PatternMatch.detect(
        mem.toDS().withWatermark("ts", "0 seconds").as[SessionEvent],
        Seq("view", "click", "purchase"), maxSpanMs = 60000L)
      .writeStream.format("memory").queryName("pm_state_metrics")
      .outputMode("append").start()
    try {
      mem.addData(views ++ follows: _*)
      query.processAllAvailable()
      // peak state lives in the FIRST batch's progress: processAllAvailable
      // already appends a no-data batch for the advanced watermark, which
      // starts evicting the oldest partials before lastProgress is read
      def stateProgress = query.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      val peakRows = stateProgress.map(_.numRowsTotal).max
      assert(peakRows == nOpen,
        s"peak state rows $peakRows != open partials $nOpen " +
          "(state must be per-open-partial, not per-event/per-user)")
      val peakMem = stateProgress.map(_.memoryUsedBytes).max
      assert(peakMem > 0, "provider reported no state memory")
      assert(peakMem < 256L * 1024 * 1024,
        s"$nOpen fixed-size partials should be far under 256 MB, got $peakMem")

      // 'noise' is not a pattern stage: it advances the watermark without
      // opening state, so two far-future batches drain every partial
      mem.addData(SessionEvent(users + 1L, ts(base + 86400000L), "noise"))
      query.processAllAvailable()
      mem.addData(SessionEvent(users + 2L, ts(base + 2 * 86400000L), "noise"))
      query.processAllAvailable()

      val removed = query.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      assert(removed >= nOpen,
        s"watermark eviction removed $removed < $nOpen expired partials")
      assert(query.lastProgress.stateOperators(0).numRowsTotal == 0,
        "state must drain to zero once the watermark passes every span")

      val hits = spark.table("pm_state_metrics").count()
      assert(hits == completing.size.toLong,
        s"expected ${completing.size} completed sequences, got $hits")
    } finally query.stop()
  }
}
