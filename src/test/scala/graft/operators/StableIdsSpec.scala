package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stable-id contract: dense 0-based ids in key order, identical across
  * partitionings, collision rejection. */
class StableIdsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf).cache()

  test("ids are dense, 0-based, and follow the ordering key") {
    val withIds = StableIds.assignIds(ev.select("event_id"), Seq($"event_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(withIds.map(_._2).toSeq == withIds.indices.map(_.toLong))
    // event_id ascending ⇒ id ascending
    assert(withIds.map(_._1).toSeq == withIds.map(_._1).sorted.toSeq)
  }

  test("assignment is partition-layout independent") {
    val a = StableIds.assignIds(ev.select("event_id"), Seq($"event_id"))
      .as[(Long, Long)].collect().toSet
    val b = StableIds.assignIds(ev.select("event_id").repartition(13), Seq($"event_id"))
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("existing id column is rejected") {
    intercept[IllegalArgumentException](
      StableIds.assignIds(ev.withColumn("id", lit(1)), Seq($"event_id")))
  }
}
