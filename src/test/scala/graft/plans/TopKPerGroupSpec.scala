package graft.plans

import graft.SparkSpec
import graft.sample.Samplers
import graft.sample.Samplers.SampleOrder
import org.apache.spark.sql.functions._

/** Custom-plan contract: the heap exec selects exactly the window path's
  * rows, plans without a sort, and handles small groups / ties. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf).cache()

  test("selects exactly the same rows as the window-rank path") {
    for (order <- Seq(
        SampleOrder.By(Seq($"event_id")),
        SampleOrder.HashOf(42, Seq($"event_id")))) {
      val planned = Samplers.perGroupPlanned(ev, Seq($"event_type"), 7, order)
        .select("event_type", "event_id").as[(String, Long)].collect().toSet
      val window = Samplers.perGroup(ev, Seq($"event_type"), 7, order)
        .select("event_type", "event_id").as[(String, Long)].collect().toSet
      assert(planned == window, s"order=$order")
    }
  }

  test("physical plan uses TopKPerGroupExec with no sort") {
    val df = Samplers.perGroupPlanned(ev, Seq($"event_type"), 5,
      SampleOrder.By(Seq($"event_id")))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1500))
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("Window"),
      s"must not sort:\n${plan.take(1500)}")
  }

  test("falls back to the spillable sort path above the live-group threshold") {
    // 50k distinct groups through a 1k-group ceiling: every task degrades
    // to the UnsafeExternalRowSorter path; selection must stay identical
    // to the window-rank reference (handoff losslessness)
    val df = spark.range(0, 200000)
      .select((col("id") % 50000).as("g"), col("id").as("v"))
    val planned = Samplers.perGroupPlanned(df, Seq(col("g")), 2,
        SampleOrder.By(Seq(col("v"))), maxGroupsInMemory = 1000)
      .select("g", "v").as[(Long, Long)].collect().toSet
    val window = Samplers.perGroup(df, Seq(col("g")), 2,
        SampleOrder.By(Seq(col("v"))))
      .select("g", "v").as[(Long, Long)].collect().toSet
    assert(planned.size == 100000) // 4 rows per group, top 2 each
    assert(planned == window)
  }

  test("groups smaller than k return all rows; k=1 returns one per group") {
    val totals = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    val k = 100000 // larger than any group
    val all = Samplers.perGroupPlanned(ev, Seq($"event_type"), k,
        SampleOrder.By(Seq($"event_id")))
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(all == totals)
    val one = Samplers.perGroupPlanned(ev, Seq($"event_type"), 1,
        SampleOrder.By(Seq($"event_id")))
      .select("event_type", "event_id").as[(String, Long)].collect()
    assert(one.length == totals.size)
    // k=1 with ascending id order = min id per group
    val minIds = ev.groupBy("event_type").agg(min("event_id"))
      .as[(String, Long)].collect().toSet
    assert(one.toSet == minIds)
  }
}
