package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    StarComponents.components(pairs.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long)].collect().toMap

  test("chains, cliques, isolated pairs, self-contained components") {
    // chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
    val got = cc(pairs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges in few rounds (diameter-independence smoke)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 201)
  }

  test("property: identical components to the min-label propagation operator") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 40)
      es <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))
    } yield es.filter { case (a, b) => a != b }
    for (i <- 1 to 15; es <- edgeGen(Gen.Parameters.default, Seed(i.toLong))
         if es.nonEmpty) {
      val star = cc(es)
      val prop = graft.dedup.Dedup.duplicateClusters(
          es.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long)].collect().toMap
      assert(star == prop, s"edges=$es")
    }
  }
}
