package graft.etl

import graft.SparkSpec

/** Quality-report contract: exact violation counts per check kind, nulls
  * don't violate bounds/set checks, single-pass plan. */
class QualityReportSpec extends SparkSpec {
  import spark.implicits._
  import QualityReport._

  private lazy val df = Seq(
    (Some(1L), Some(10.0), Some("A")),
    (Some(2L), Some(60.0), Some("X")),  // bounds + set violations
    (Some(2L), None, Some("N")),        // duplicate key; null measure
    (None, Some(20.0), None)            // null key; null category
  ).toDF("k", "m", "c")

  test("violation counts are exact; nulls violate only completeness") {
    val out = report(df, Seq(
      Complete("k"), Unique("k"), Bounds("m", 0.0, 50.0),
      InSet("c", Seq("A", "N", "R"))))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("complete", "k")) == ((1L, false)))
    assert(out(("unique", "k")) == ((1L, false)))   // 3 non-null - 2 distinct
    assert(out(("bounds", "m")) == ((1L, false)))   // only 60.0; null passes
    assert(out(("in_set", "c")) == ((1L, false)))   // only X; null passes
  }

  test("all-pass table reports zero violations") {
    val clean = Seq((1L, 5.0, "A"), (2L, 6.0, "N")).toDF("k", "m", "c")
    val out = report(clean, Seq(Complete("k"), Unique("k"),
      Bounds("m", 0.0, 50.0), InSet("c", Seq("A", "N"))))
    assert(out.collect().forall(_.getBoolean(3)))
  }

  test("any number of checks compiles to a single aggregation") {
    val plan = report(df, Seq(Complete("k"), Unique("k"), Bounds("m", 0, 1),
      InSet("c", Seq("A")), Complete("m"), Complete("c")))
      .queryExecution.executedPlan.toString
    // one scan feeding one aggregate chain — no join/union of per-check jobs
    assert(!plan.contains("Union"))
  }
}
