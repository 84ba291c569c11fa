package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: first value (in (v, id) order) whose cumulative
    * weight crosses half the group total. */
  private def naive(rows: Seq[(String, Double, Long, Long)]): Map[String, Double] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4))
      val total = sorted.map(_._3).sum
      var cum = 0L
      g -> sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
    }

  test("bucket-pruned median equals the naive scan, duplicates and skew included") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 4000L).map { i =>
      val g = s"g${i % 5}"
      // heavy duplication: values drawn from a small grid, incl. negatives
      val v = (rng.nextInt(200) - 50) * 2.5
      (g, v, 1L + rng.nextInt(9).toLong, i)
    }
    val got = WeightedMedian.weightedMedian(
        rows.toDF("g", "v", "wt", "id"),
        grp = col("g"), v = col("v"), wt = col("wt"), ord = col("id"),
        bucketWidth = 40.0)
      .select("grp", "w_median").as[(String, Double)].collect().toMap
    assert(got == naive(rows))
  }

  test("zero and fractional weights violate the contract and fail loudly") {
    def run(rows: Seq[(String, Double, Double, Long)]) =
      WeightedMedian.weightedMedian(rows.toDF("g", "v", "wt", "id"),
        col("g"), col("v"), col("wt"), col("id"), bucketWidth = 1.0).collect()
    def contractError(body: => Any): Unit = {
      val e = intercept[Exception](body)
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("integral and >= 1")),
        s"expected the weight-contract message, got: ${messages(e)}")
    }
    contractError(run(Seq(("a", 1.0, 0.0, 1L), ("a", 2.0, 1.0, 2L))))
    contractError(run(Seq(("a", 1.0, 0.9, 1L), ("a", 2.0, 1.0, 2L))))
    contractError(run(Seq(("a", 1.0, 2.5, 1L), ("a", 2.0, 1.0, 2L))))
  }

  test("single-row groups and all-equal values") {
    val rows = Seq(("a", 5.0, 3L, 1L), ("b", 2.0, 1L, 2L),
      ("b", 2.0, 1L, 3L), ("b", 2.0, 1L, 4L))
    val got = WeightedMedian.weightedMedian(rows.toDF("g", "v", "wt", "id"),
        col("g"), col("v"), col("wt"), col("id"), bucketWidth = 1.0)
      .select("grp", "w_median").as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 5.0, "b" -> 2.0))
  }
}
