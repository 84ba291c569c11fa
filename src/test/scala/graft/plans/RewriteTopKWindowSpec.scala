package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Injected-optimizer-rule contract: the "rank, filter, drop rank" idiom
  * replans as TopKPerGroup; unsafe shapes stay on the window path. */
class RewriteTopKWindowSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf).cache()

  private def withRule[A](body: => A): A = {
    spark.experimental.extraStrategies = Seq(TopKPerGroupStrategy)
    spark.experimental.extraOptimizations = Seq(RewriteTopKWindow)
    try body finally {
      spark.experimental.extraOptimizations = Nil
      spark.experimental.extraStrategies = Nil
    }
  }

  private def rankIdiom(k: Int) = {
    val w = Window.partitionBy($"event_type").orderBy($"event_id")
    ev.withColumn("rn", row_number().over(w))
      .where($"rn" <= k)
      .select("event_type", "event_id")
  }

  test("the rank-filter-drop idiom replans as TopKPerGroupExec, row-identical") {
    val expected = rankIdiom(5).as[(String, Long)].collect().toSet
    withRule {
      val df = rankIdiom(5)
      val rows = df.as[(String, Long)].collect().toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), plan.take(1200))
      // "Window [" is WindowExec; "WindowGroupLimit" (Spark's own map-side
      // partial top-k below our node) is welcome — it pre-prunes the shuffle
      assert(!plan.contains("Window ["), s"WindowExec must be gone:\n${plan.take(1200)}")
      assert(rows == expected)
    }
  }

  test("rn < k and rn = 1 forms rewrite with the right limits") {
    withRule {
      val w = Window.partitionBy($"event_type").orderBy($"event_id")
      val lt = ev.withColumn("rn", row_number().over(w))
        .where($"rn" < 4).select("event_type", "event_id")
      assert(lt.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(lt.groupBy("event_type").count()
        .select(max("count")).as[Long].head() == 3L)
      val eq = ev.withColumn("rn", row_number().over(w))
        .where($"rn" === 1).select("event_type", "event_id")
      assert(eq.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(eq.groupBy("event_type").count()
        .select(max("count")).as[Long].head() == 1L)
    }
  }

  test("keeping the rank column disables the rewrite") {
    withRule {
      val w = Window.partitionBy($"event_type").orderBy($"event_id")
      val df = ev.withColumn("rn", row_number().over(w))
        .where($"rn" <= 5).select("event_type", "event_id", "rn")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window [") && !plan.contains("TopKPerGroup"),
        s"must stay on the window path:\n${plan.take(1200)}")
    }
  }

  test("non-row_number window functions are left alone") {
    withRule {
      val w = Window.partitionBy($"event_type").orderBy($"event_id")
      val df = ev.withColumn("rn", rank().over(w))
        .where($"rn" <= 5).select("event_type", "event_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window [") && !plan.contains("TopKPerGroup"),
        s"rank() must stay on the window path:\n${plan.take(1200)}")
    }
  }
}
