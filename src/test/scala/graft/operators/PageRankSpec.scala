package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank contract: mass conservation (up to truncation),
  * symmetry, hub dominance, dangling-node teleport floor. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  test("symmetric 2-cycle splits mass equally") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.integerPageRank(edges, col("src"), col("dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    // each: 0.15/2 + 0.85·(scale/2) ≈ scale/2
    assert(math.abs(out(1L) - Scale / 2) < 1000L)
  }

  test("a hub receiving from many spokes outranks the spokes") {
    // star: spokes 1..5 → hub 0, hub → spoke 1 (so hub has out-degree)
    val edges = ((1L to 5L).map(s => (s, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val out = PageRank.integerPageRank(edges, col("src"), col("dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) > out(1L), "hub must outrank the receiving spoke")
    assert((2L to 5L).forall(s => out(0L) > out(s)))
    assert((2L to 5L).map(out).distinct.size == 1, "symmetric spokes tie")
  }

  test("dangling nodes keep exactly the teleport base") {
    // 1 → 2; node 2 has no out-edges (dangling)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = PageRank.integerPageRank(edges, col("src"), col("dst"), iters = 1)
      .as[(Long, Long)].collect().toMap
    val base = 15L * (Scale / 2) / 100L
    assert(out(1L) == base, "no inbound edges → teleport only")
    assert(out(2L) == base + 85L * (Scale / 2) / 100L)
  }

  test("total mass never exceeds scale and stays near it") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val total = PageRank.integerPageRank(edges, col("src"), col("dst"), iters = 4)
      .agg(sum("pr")).as[Long].head()
    assert(total <= Scale)
    assert(total > Scale - Scale / 1000, "truncation loss must be tiny")
  }
}
