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

  test("single-row groups and all-equal values") {
    val rows = Seq(("a", 5.0, 3L, 1L), ("b", 2.0, 1L, 2L),
      ("b", 2.0, 1L, 3L), ("b", 2.0, 1L, 4L))
    val got = WeightedMedian.weightedMedian(rows.toDF("g", "v", "wt", "id"),
        col("g"), col("v"), col("wt"), col("id"), bucketWidth = 1.0)
      .select("grp", "w_median").as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 5.0, "b" -> 2.0))
  }
}
