package graft.operators

import graft.SparkSpec
import graft.operators.HeavyHitters.MisraGries
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish multiset: value i (1..nKeys) appears ceil(nKeys/i) times —
    * a long tail with a few genuinely frequent keys, so a small capacity
    * actually exercises the decrement/trim paths (capacity << distinct). */
  private def zipfValues(nKeys: Int): Seq[String] =
    (1 to nKeys).flatMap(i => Seq.fill((nKeys + i - 1) / i)(s"k$i"))

  test("MG reduce keeps at most `capacity` counters and never undercounts by more than n/(capacity+1)") {
    val vals = scala.util.Random.shuffle(zipfValues(200))
    val mg = MisraGries(16)
    val buf = vals.foldLeft(mg.zero)(mg.reduce)
    assert(buf.size <= 16)
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = vals.size.toLong / 17
    for ((k, est) <- buf) {
      assert(est <= truth(k), s"MG must never overcount ($k)")
      assert(est >= truth(k) - bound, s"undercount beyond bound ($k)")
    }
    // recall: every key with freq > n/(capacity+1) must be present
    for ((k, c) <- truth if c > bound) assert(buf.contains(k), s"lost frequent key $k")
  }

  test("MG merge preserves the error bound across an arbitrary merge tree") {
    val vals = scala.util.Random.shuffle(zipfValues(300))
    val mg = MisraGries(24)
    // 7 uneven chunks reduced independently, then merged pairwise left-to-right
    val chunks = vals.grouped(vals.size / 7 + 1).toSeq
    val merged = chunks.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
    assert(merged.size <= 24)
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = vals.size.toLong / 25
    for ((k, est) <- merged) assert(est <= truth(k) && est >= truth(k) - bound)
    for ((k, c) <- truth if c > bound) assert(merged.contains(k), s"lost frequent key $k")
  }

  test("exact() equals the naive groupBy+HAVING on skewed data with capacity << distinct") {
    val vals = zipfValues(500) // 500 distinct, ~3400 rows
    val df = vals.toDF("v").repartition(8)
    val k = 100
    val got = HeavyHitters.exact(df, col("v"), k = k, capacity = 128)
      .as[(String, Long)].collect().toSeq
    val n = vals.size.toLong
    val expect = vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * k > n }
      .sortBy { case (v, c) => (-c, v) }
    assert(got == expect)
  }

  test("exact() rejects capacity < k (recall guarantee would be void)") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, col("v"), k = 10, capacity = 9)
    }
  }
}
