package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-diff contract: I/U/D classification, null-safe compares,
  * unchanged rows absent, deleted rows carry null payloads. */
class ChangeDataSpec extends SparkSpec {
  import spark.implicits._

  private val prev = Seq(
    (1L, Some("a"), 10.0), // unchanged
    (2L, Some("b"), 20.0), // value update
    (3L, None, 30.0),      // null → value update (null-safe)
    (4L, Some("d"), 40.0)  // deleted in next
  ).toDF("k", "s", "v")

  private val next = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 21.0),
    (3L, Some("c"), 30.0),
    (5L, Option.empty[String], 50.0) // inserted, with a null field
  ).toDF("k", "s", "v")

  test("I/U/D classification with null-safe struct compare") {
    val out = ChangeData.snapshotDiff(prev, next, "k", Seq("s", "v"))
      .select("k", "op", "s", "v")
      .as[(Long, String, Option[String], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains(1L), "unchanged row must be absent")
    assert(out(2L) == (2L, "U", Some("b"), Some(21.0)))
    assert(out(3L) == (3L, "U", Some("c"), Some(30.0)),
      "null -> non-null must classify as update, not equality")
    assert(out(4L) == (4L, "D", None, None), "deletes carry null payloads")
    assert(out(5L) == (5L, "I", None, Some(50.0)))
    assert(out.size == 4)
  }

  test("applying the changeset to prev reproduces next exactly") {
    val cs = ChangeData.snapshotDiff(prev, next, "k", Seq("s", "v"))
    val applied = prev
      .join(cs.select(col("k"), col("op")), Seq("k"), "left_anti") // untouched
      .unionByName(cs.where(col("op") =!= "D").select("k", "s", "v"))
    val a = applied.as[(Long, Option[String], Double)].collect().toSet
    val n = next.as[(Long, Option[String], Double)].collect().toSet
    assert(a == n, "prev + changeset must equal next")
  }
}
