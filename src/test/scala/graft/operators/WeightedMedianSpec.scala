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

  test("medianRank2 equals the naive two-middle-rank rule; windows never sort a whole group") {
    val rng = new scala.util.Random(11)
    // odd- and even-sized groups, duplicates, negatives
    val rows = (1L to 3001L).map { i =>
      (s"g${i % 4}", ((rng.nextInt(400) - 100) * 25).toDouble, i)
    }
    def naive: Map[String, Double] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
        val n = sorted.size
        g -> (sorted((n + 1) / 2 - 1) + sorted(n / 2))
      }
    val df = WeightedMedian.medianRank2(rows.toDF("g", "v", "id"),
      grp = col("g"), v = col("v"), ord = col("id"), bucketWidth = 500.0)
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == naive)
    // the scale contract: a window partitioned by the group ALONE may only
    // run over an already-aggregated (per-bucket) table — the raw-row scan
    // must be windowed by (group, bucket), never a full-group sort. AQE
    // hides exec nodes behind AdaptiveSparkPlanExec/QueryStageExec, so
    // flatten through them after execution finalized the plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case o => o +: o.children.flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val wins = all.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, s"no WindowExec found in:\n${all.mkString("\n")}")
    wins.filter(_.partitionSpec.length < 2).foreach { w =>
      assert(flatten(w.child).collect { case a: BaseAggregateExec => a }.nonEmpty,
        s"group-only window over un-aggregated input:\n$w")
    }
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
