package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("prune keeps every matching row (no false negatives) and join result is identical") {
    val fact = (1L to 10000L).map(i => (i, i % 997)).toDF("rid", "k")
    val dim = Seq(3L, 11L, 400L, 996L).toDF("dk")
    val pruned = BloomPrune.prune(fact, col("k"), dim, col("dk"),
      expectedItems = 100, numBits = 8192)
    val prunedJoin = pruned.join(dim, col("k") === col("dk"))
      .select("rid").as[Long].collect().sorted
    val plainJoin = fact.join(dim, col("k") === col("dk"))
      .select("rid").as[Long].collect().sorted
    assert(prunedJoin.sameElements(plainJoin))
  }

  test("prune drops the bulk of non-matching rows") {
    val fact = (1L to 20000L).map(i => (i, i)).toDF("rid", "k")
    val dim = (1L to 50L).toDF("dk") // 50 of 20000 keys match
    val kept = BloomPrune.prune(fact, col("k"), dim, col("dk"),
      expectedItems = 1000, numBits = 64 * 1024).count()
    // fp rate at 64 Kib / 50 keys is ~0 — allow generous slack anyway
    assert(kept >= 50 && kept < 500, s"kept $kept of 20000")
  }

  test("the bloom build is a subquery, not a driver-side collect") {
    val fact = (1L to 100L).map(i => (i, i)).toDF("rid", "k")
    val dim = (1L to 10L).toDF("dk")
    val plan = BloomPrune.prune(fact, col("k"), dim, col("dk"), 10, 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"expected a subquery-hosted bloom build in:\n$plan")
    assert(plan.contains("might_contain"), s"expected might_contain in:\n$plan")
  }
}
