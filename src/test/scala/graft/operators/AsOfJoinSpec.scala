package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join contract: latest-prior match, <= tie semantics, null when no
  * prior right row, per-key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")

  test("latest prior row wins; equal ts matches; no prior → null; keys isolated") {
    val left = Seq(
      (1L, "a", ts("09:00")),  // before any cfg → null
      (2L, "a", ts("10:00")),  // == cfg@10:00 → 100
      (3L, "a", ts("10:30")),  // after cfg@10:00 → 100
      (4L, "a", ts("11:05")),  // after cfg@11:00 → 110
      (5L, "b", ts("12:00"))   // key b has its own cfg → 200
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts("10:00"), 100.0),
      ("a", ts("11:00"), 110.0),
      ("b", ts("11:30"), 200.0)
    ).toDF("k", "rts", "cfg")

    val out = AsOfJoin.lastValueBefore(left, right, "k", "ts", "rts", Seq("cfg"))
      .select("id", "cfg").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(100.0))
    assert(out(3L).contains(100.0))
    assert(out(4L).contains(110.0))
    assert(out(5L).contains(200.0))
  }

  test("a genuinely-null payload field does not look through to older rows") {
    // right rows: t=1 has (x=1, y=null); t=2 has (x=null, y=2). A left row
    // at t=3 must get exactly the t=2 row (x=null, y=2) — per-column fill
    // would stitch (x=1, y=2), a row that never existed.
    val left = Seq((1L, "a", ts("10:03"))).toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts("10:01"), Option(1.0), Option.empty[Double]),
      ("a", ts("10:02"), Option.empty[Double], Option(2.0))
    ).toDF("k", "rts", "x", "y")
    val out = AsOfJoin.lastValueBefore(left, right, "k", "ts", "rts", Seq("x", "y"))
      .select("x", "y").collect()(0)
    assert(out.isNullAt(0), "x must be the t=2 row's null, not t=1's 1.0")
    assert(out.getDouble(1) == 2.0)
  }

  test("salted variant is row-identical to the plain one across bucket widths") {
    // fixture: events joined to a sparse cfg subset of itself — ts spans
    // force multi-bucket stitching (in-bucket hit, carry from an earlier
    // bucket, and no-prior nulls all occur)
    val events = graft.Tables.events(spark, sf)
    val left = events.select("event_id", "event_type", "ts")
    val cfg = events.where($"event_id" % 97 === 0)
      .select($"event_type", $"ts", $"value".as("cfg_value"))
    val plain = AsOfJoin.lastValueBefore(left, cfg,
        "event_type", "ts", "ts", Seq("cfg_value"))
      .select("event_id", "cfg_value")
      .as[(Long, Option[Double])].collect().toMap
    for (bucketMs <- Seq(1000L, 3600L * 1000, 30L * 86400 * 1000)) {
      val salted = AsOfJoin.lastValueBeforeSalted(left, cfg,
          "event_type", "ts", "ts", Seq("cfg_value"), bucketMs)
        .select("event_id", "cfg_value")
        .as[(Long, Option[Double])].collect().toMap
      assert(salted == plain, s"bucketMs=$bucketMs")
    }
    assert(plain.values.exists(_.isEmpty) && plain.values.exists(_.nonEmpty),
      "fixture must exercise both matched and no-prior rows")
  }

  test("salted variant: numeric ts buckets in the column's own unit") {
    val left = Seq((1L, "a", 5L), (2L, "a", 25L), (3L, "a", 99L)).toDF("id", "k", "t")
    val right = Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.lastValueBeforeSalted(left, right, "k", "t", "rt", Seq("v"), 10L)
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty && out(2L).contains(2.0) && out(3L).contains(2.0))
  }

  test("payload-name collision with left columns is rejected") {
    val l = Seq((1L, "a", ts("09:00"), 0.0)).toDF("id", "k", "ts", "cfg")
    val r = Seq(("a", ts("08:00"), 1.0)).toDF("k", "rts", "cfg")
    intercept[IllegalArgumentException](
      AsOfJoin.lastValueBefore(l, r, "k", "ts", "rts", Seq("cfg")))
  }
}
