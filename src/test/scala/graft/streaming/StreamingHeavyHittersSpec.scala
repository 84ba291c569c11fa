package graft.streaming

import graft.SparkSpec
import graft.operators.HeavyHitters.MisraGries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming heavy hitters: the SAME mergeable Misra–Gries Aggregator
  * that powers the batch two-pass operator runs as a streaming
  * aggregation — micro-batches merge their bounded summaries into the
  * running state, so the stream maintains an O(capacity) frequency
  * sketch with no per-key state table. The MG merge bound
  * (error ≤ n/(capacity+1), recall of every key above it) must hold for
  * the state after ANY prefix of batches — that is exactly the
  * mergeable-summaries guarantee the batch spec pins, here exercised
  * across Structured Streaming's incremental merge path. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG summary over micro-batches keeps the merge bound and recall") {
    val mem = MemoryStream[String](spark)
    val agg = mem.toDS()
      .select(MisraGries(16).toColumn.name("mg"))
    val q = agg.writeStream.format("memory").queryName("stream_hh")
      .outputMode("complete").start()

    // Zipf-ish: key i appears ceil(120/i) times, shuffled, in 4 batches
    val vals = scala.util.Random.shuffle(
      (1 to 120).flatMap(i => Seq.fill((120 + i - 1) / i)(s"k$i")))
    val batches = vals.grouped(vals.size / 4 + 1).toSeq
    var fed = Vector.empty[String]
    for (b <- batches) {
      mem.addData(b: _*)
      q.processAllAvailable()
      fed ++= b
      val state = spark.table("stream_hh").as[Map[String, Long]].head()
      assert(state.size <= 16, "state must stay within capacity")
      val truth = fed.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = fed.size.toLong / 17
      for ((k, est) <- state) {
        assert(est <= truth(k), s"overcount for $k after ${fed.size} rows")
        assert(est >= truth(k) - bound, s"undercount beyond bound for $k")
      }
      for ((k, c) <- truth if c > bound)
        assert(state.contains(k), s"lost frequent key $k after ${fed.size} rows")
    }
    q.stop()
  }
}
