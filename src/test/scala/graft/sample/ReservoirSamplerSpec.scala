package graft.sample

import graft.SparkSpec
import graft.sample.Samplers.SampleOrder
import org.apache.spark.sql.functions._

/** Reservoir-aggregator contract: exact k, partition-layout independence,
  * and row-for-row equivalence with the window-rank sampler under the same
  * hash priority. */
class ReservoirSamplerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf).cache()
  private val seed = 42L

  private def reservoirSample(k: Int): Map[String, Set[Long]] =
    ev.select(col("event_type"),
        xxhash64(lit(seed), col("event_id")).as("prio"), col("event_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(BottomKByPriority(k).toColumn.name("ids"))
      .collect().map { case (g, ids) => g -> ids.toSet }.toMap

  test("exact k per group; groups smaller than k return all") {
    val k = 7
    val got = reservoirSample(k)
    val totals = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    totals.foreach { case (g, n) =>
      assert(got(g).size == math.min(k.toLong, n), s"group $g")
    }
  }

  test("selects exactly the same rows as the window-rank sampler") {
    val k = 11
    val agg = reservoirSample(k)
    val win = Samplers.perGroup(ev, Seq(col("event_type")), k,
        SampleOrder.HashOf(seed, Seq(col("event_id"))))
      .select("event_type", "event_id").as[(String, Long)]
      .collect().groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    assert(agg == win)
  }

  test("partition-layout independent") {
    val k = 5
    val a = reservoirSample(k)
    val b = ev.repartition(17, col("value"))
      .select(col("event_type"),
        xxhash64(lit(seed), col("event_id")).as("prio"), col("event_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(BottomKByPriority(k).toColumn.name("ids"))
      .collect().map { case (g, ids) => g -> ids.toSet }.toMap
    assert(a == b)
  }
}
