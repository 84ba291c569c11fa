package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted aggregation contract: two-phase results equal single-phase
  * exactly, for counts and integer-exact sums. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf).cache()

  test("saltedCount equals plain groupBy count for every key and bucket size") {
    val plain = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    for (buckets <- Seq(1, 4, 32)) {
      val salted = Skew.saltedCount(ev, col("event_type"), Seq(col("event_id")), buckets)
        .as[(String, Long)].collect().toMap
      assert(salted == plain, s"buckets=$buckets")
    }
  }

  test("saltedSum equals plain sum on an integral column") {
    val plain = ev.groupBy("event_type").agg(sum("user_id"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedSum(ev, col("event_type"), col("user_id"),
      Seq(col("event_id")), 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}
