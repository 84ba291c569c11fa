package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Majority label propagation: self-vote stability, majority adoption,
  * deterministic tie-break, isolated nodes untouched. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[(Long, Long)], edges: Seq[(Long, Long)], iters: Int) = {
    val e = edges.toDF("src", "dst")
    val undirected = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    LabelPropagation.propagate(nodes.toDF("id", "label"), col("id"), col("label"),
        undirected, col("src"), col("dst"), iters)
      .as[(Long, Long)].collect().toMap
  }

  test("a minority node surrounded by a majority flips; the majority is stable") {
    // star: center 0 labeled 9, spokes 1-3 labeled 5
    val out = run(Seq((0L, 9L), (1L, 5L), (2L, 5L), (3L, 5L)),
      Seq((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
    assert(out(0L) == 5L, "center adopts the 3-vs-1 majority")
    // each spoke sees {own 5, center 9} → tie 1-1 → smallest label wins
    assert(out(1L) == 5L && out(2L) == 5L && out(3L) == 5L)
  }

  test("tie breaks to the smallest label") {
    // pair with different labels: each sees 1 vote for each → min wins
    val out = run(Seq((1L, 7L), (2L, 3L)), Seq((1L, 2L)), iters = 1)
    assert(out(1L) == 3L && out(2L) == 3L)
  }

  test("isolated nodes keep their label across rounds") {
    val out = run(Seq((1L, 4L), (2L, 8L)), Seq.empty, iters = 2)
    assert(out == Map(1L -> 4L, 2L -> 8L))
  }

  test("two rounds reach two hops") {
    // chain: 0(9) - 1(9) - 2(1) - 3(1) - 4(1): round1 flips 1? votes for
    // node1: self 9, n0 9, n2 1 → stays 9. node2: self 1, n1 9, n3 1 → 1.
    // Stable config must persist across a second round identically.
    val r1 = run(Seq((0L, 9L), (1L, 9L), (2L, 1L), (3L, 1L), (4L, 1L)),
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), iters = 1)
    val r2 = run(Seq((0L, 9L), (1L, 9L), (2L, 1L), (3L, 1L), (4L, 1L)),
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), iters = 2)
    assert(r1 == r2, "stable labeling is a fixed point")
  }
}
