package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join: exact BETWEEN semantics regardless of
  * bucket width, inclusive ends, cross-bucket intervals, duplicate-free
  * output, and the broadcast plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L))
    .toDF("pid", "p")
  private val intervals = Seq((10L, 0L, 10L), (20L, 8L, 30L), (30L, 50L, 60L))
    .toDF("iid", "s", "e")

  private def run(width: Long) =
    RangeJoin.pointInInterval(points, "p", intervals, "s", "e", width)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("matches BETWEEN semantics; ends inclusive; no interval → no row") {
    val expected = Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L))
    assert(run(7L) == expected)   // intervals straddle several buckets
    assert(run(1000L) == expected) // everything in one bucket
    assert(run(1L) == expected)    // one bucket per unit
  }

  test("an interval spanning many buckets matches each point exactly once") {
    val wide = Seq((1L, 0L, 100L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, "p", wide, "s", "e", 3L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(out.length == 4) // every point matched once, never duplicated
  }

  test("broadcast hint yields a broadcast hash join (fact side unshuffled)") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 7L,
      broadcastIntervals = true).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("reserved __bucket name and non-positive width rejected") {
    val bad = Seq((1L, 2L)).toDF("p", "__bucket")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(bad, "p", intervals, "s", "e", 7L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 0L)
    }
  }
}
