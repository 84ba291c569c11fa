package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedicated pin for the r14 session-config change
  * `spark.sql.join.preferSortMergeJoin=false` (VERDICT r13 "Next round"
  * #3): the flag must let the planner choose a shuffled-hash join exactly
  * when its size guards hold (one side provably much smaller, per-
  * partition build within the local-hash-map budget), never by fiat — and
  * the two strategies must agree on results. Unlike a SHUFFLE_HASH hint,
  * the flag keeps the planner's guards, so it cannot force an OOM-sized
  * hash build at scale.
  *
  * The frames are sized so the small side is above the (lowered)
  * broadcast threshold but inside the local-hash-map budget — the exact
  * window where the flag changes the plan.
  */
class JoinPreferenceSpec extends SparkSpec {

  private def session(preferSmj: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // small side (~800 B estimated) sits ABOVE this (no broadcast) but
    // below threshold × partitions (local hash map allowed)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "600")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.join.preferSortMergeJoin", preferSmj.toString)
    s
  }

  private def joined(s: SparkSession) = {
    val big = s.range(10000).select((col("id") % 100).as("k"), col("id").as("w"))
    val small = s.range(100).select(col("id").as("k"))
    big.join(small, "k")
  }

  test("flag picks shuffled-hash inside the planner's size guards; default stays sort-merge") {
    val off = joined(session(preferSmj = false))
    val on = joined(session(preferSmj = true))
    val offPlan = off.queryExecution.executedPlan.toString
    val onPlan = on.queryExecution.executedPlan.toString
    assert(offPlan.contains("ShuffledHashJoin"),
      s"preferSortMergeJoin=false should plan SHJ here:\n$offPlan")
    assert(onPlan.contains("SortMergeJoin"),
      s"default should plan SMJ here:\n$onPlan")
    val a = off.groupBy("k").agg(sum("w").as("s")).orderBy("k").collect().toSeq
    val b = on.groupBy("k").agg(sum("w").as("s")).orderBy("k").collect().toSeq
    assert(a === b)
  }
}
