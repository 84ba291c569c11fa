package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

/** Lineage hygiene for the iterative operators: `checkpointEvery` must
  * (a) leave every value exactly equal to the recurrence computed by an
  * independent in-memory implementation, and (b) truncate the unrolled
  * plan so 10+-iteration runs don't grow superlinearly in analysis/
  * codegen time. The unrolled variant is ONLY analyzed, never executed —
  * its planning blow-up is precisely the pathology these options exist to
  * avoid (a 10-iteration unrolled PageRank spends minutes in analysis on
  * this 300-node fixture).
  */
class GraphIterationSpec extends SparkSpec {
  import spark.implicits._

  /** Analyzed-plan node count — available without executing. */
  private def planSize(df: DataFrame): Int = {
    def size(p: LogicalPlan): Int = 1 + p.children.map(size).sum
    size(df.queryExecution.analyzed)
  }

  // deterministic scale-free-ish digraph: 300 nodes, preferential wiring
  private lazy val edgeList: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(13)
    (1 to 1500).map { _ =>
      val a = rng.nextInt(300).toLong
      val b = (rng.nextInt(300) * rng.nextInt(300) / 300).toLong
      (a, b)
    }.filter(e => e._1 != e._2).distinct
  }
  private lazy val edges = edgeList.toDF("src", "dst")

  test("PageRank: 10 checkpointed iterations match the in-memory integer recurrence; unrolled plan grows, checkpointed stays bounded") {
    val scale = 1000000000000L
    // independent in-memory recurrence (same integer arithmetic)
    val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = 15L * (scale / n) / 100L
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 10) {
      val contrib = pr.collect { case (nd, r) if deg.contains(nd) => nd -> r / deg(nd) }
      val sums = edgeList.groupBy(_._2).map { case (d, es) =>
        d -> es.flatMap(e => contrib.get(e._1)).sum
      }
      pr = nodes.map(nd => nd -> (base + 85L * sums.getOrElse(nd, 0L) / 100L)).toMap
    }
    val ckpt = PageRank.integerPageRank(edges, col("src"), col("dst"),
      iters = 10, checkpointEvery = 3)
    assert(ckpt.orderBy("node").as[(Long, Long)].collect().toSeq ==
      nodes.map(nd => nd -> pr(nd)))
    // plan growth: the unrolled 10-iteration plan must dwarf the
    // checkpointed one (lineage truncated at iteration 9)
    val plain = PageRank.integerPageRank(edges, col("src"), col("dst"),
      iters = 10)
    assert(planSize(ckpt) * 4 < planSize(plain),
      s"expected truncated lineage, got ${planSize(ckpt)} vs ${planSize(plain)}")
  }

  test("bfsHops: 10 checkpointed hops match in-memory BFS; plan bounded") {
    val seedNode = 0L
    // in-memory BFS
    val adj = edgeList.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var expected = Map(seedNode -> 0L)
    var frontier = Set(seedNode)
    for (h <- 1 to 10) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil)) -- expected.keySet
      expected = expected ++ next.map(_ -> h.toLong)
      frontier = next
    }
    val seed = Seq((seedNode, 0L)).toDF("node", "hop")
    val ckpt = Graph.bfsHops(edges, seed, maxHops = 10, checkpointEvery = 3)
    assert(ckpt.orderBy("node").as[(Long, Long)].collect().toSeq ==
      expected.toSeq.sortBy(_._1))
    assert(planSize(ckpt) * 4 < planSize(Graph.bfsHops(edges, seed, maxHops = 10)))
  }

  test("bellmanFord: 10 checkpointed rounds match in-memory relaxation; plan bounded") {
    val cost = edgeList.map(e => e -> (e._1 % 7 + e._2 % 5 + 1)).toMap
    var expected = Map(0L -> 0L)
    for (_ <- 1 to 10) {
      val relaxed = edgeList.flatMap { e =>
        expected.get(e._1).map(d => e._2 -> (d + cost(e)))
      }
      expected = (expected.toSeq ++ relaxed).groupBy(_._1)
        .map { case (nd, ds) => nd -> ds.map(_._2).min }
    }
    val we = edges.withColumn("cost", col("src") % 7 + col("dst") % 5 + 1)
    val seed = Seq((0L, 0L)).toDF("node", "dist")
    val ckpt = Graph.bellmanFord(we, seed, rounds = 10, checkpointEvery = 3)
    assert(ckpt.orderBy("node").as[(Long, Long)].collect().toSeq ==
      expected.toSeq.sortBy(_._1))
    assert(planSize(ckpt) * 4 < planSize(Graph.bellmanFord(we, seed, rounds = 10)))
  }

  test("LabelPropagation: 10 checkpointed rounds match in-memory majority vote; plan bounded") {
    val nodeIds = edgeList.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val inNbrs = edgeList.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    var expected = nodeIds.map(nd => nd -> nd % 11).toMap
    for (_ <- 1 to 10) {
      expected = nodeIds.map { nd =>
        val votes = (inNbrs.getOrElse(nd, Nil).map(expected) :+ expected(nd))
          .groupBy(identity).map { case (lb, vs) => (lb, vs.size) }
        // most votes, ties to smallest label
        nd -> votes.toSeq.map { case (lb, c) => (-c, lb) }.min._2
      }.toMap
    }
    val nodes = nodeIds.toDF("id").withColumn("label", col("id") % 11)
    def run(every: Int) = LabelPropagation.propagate(nodes, col("id"),
      col("label"), edges, col("src"), col("dst"), iters = 10,
      checkpointEvery = every)
    val ckpt = run(3)
    assert(ckpt.orderBy("id").as[(Long, Long)].collect().toSeq ==
      nodeIds.map(nd => nd -> expected(nd)))
    assert(planSize(ckpt) * 4 < planSize(run(0)))
  }
}
