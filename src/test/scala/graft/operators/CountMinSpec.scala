package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min contract: never underestimates, bounded overestimate mass,
  * and sketches of disjoint slices merge into the whole-input sketch. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64

  private val items = (
    Seq.fill(50)("hot") ++ Seq.fill(10)("warm") ++
      (0 until 40).map(i => s"cold$i")
  ).toDF("v")

  test("estimates never underestimate; exact for most keys at this load") {
    val sk = CountMin.sketch(items, col("v"), D, W)
    val est = CountMin.estimate(sk, items, col("v"), D, W)
      .as[(String, Long)].collect().toMap
    val truth = Map("hot" -> 50L, "warm" -> 10L) ++
      (0 until 40).map(i => s"cold$i" -> 1L)
    truth.foreach { case (v, t) =>
      assert(est(v) >= t, s"$v: est ${est(v)} underestimates true $t")
    }
    // 100 items over 64 buckets × 4 rows: the min-over-rows estimate is
    // exact for the heavy keys with overwhelming probability (seeded md5)
    assert(est("hot") == 50L && est("warm") == 10L)
  }

  test("streaming sketch: counters accumulate across micro-batches to the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String](spark)
    val q = CountMin.sketch(mem.toDF().toDF("v"), col("v"), D, W)
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a", "c")
    q.processAllAvailable()
    val streamed = spark.table("cm_stream")
      .as[(Int, Long, Long)].collect().toSet
    val batch = CountMin.sketch(Seq("a", "a", "b", "a", "c").toDF("v"),
      col("v"), D, W).as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch,
      "the streaming sketch state must equal the batch sketch of all data")
    q.stop()
  }

  test("sketches of disjoint slices merge by union + re-sum") {
    val a = items.limit(60)
    val b = items.exceptAll(a)
    val merged = CountMin.sketch(a, col("v"), D, W)
      .unionByName(CountMin.sketch(b, col("v"), D, W))
      .groupBy("r", "bucket").agg(sum(col("cnt")).as("cnt"))
    val whole = CountMin.sketch(items, col("v"), D, W)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val w = whole.as[(Int, Long, Long)].collect().toSet
    assert(m == w, "merged partial sketches must equal the whole-input sketch")
  }
}
