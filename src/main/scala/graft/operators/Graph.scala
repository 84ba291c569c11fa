package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact triangle counting.
  *
  * The naive three-way self-join enumerates every wedge at every vertex —
  * on a skewed graph one hub of degree d contributes O(d²) wedges, which
  * at web scale is the whole job. The standard fix (degree-ordered edge
  * orientation) directs every edge from its lower-(degree, id) endpoint to
  * the higher one; each triangle then has exactly ONE vertex with two
  * out-edges, and the forward degree of every vertex is bounded by
  * O(sqrt(m)), so the wedge join is O(m^{3/2}) worst-case regardless of
  * skew — the hub's d² collapses because almost all its edges point IN.
  *
  * Everything is equi-joins + aggregations: degrees (one shuffle on node),
  * orientation (two dimension-style joins against the degree table), the
  * wedge self-join (shuffle on the wedge center), and the closing-edge
  * equi-join against the canonical edge set. No driver-side collection;
  * counts are exact integers, so the all-pairs SQL oracle proves equality.
  */
object Graph {

  /** Canonical undirected edge set: distinct (min, max) pairs, self-loops
    * dropped. One shuffle (the distinct). */
  def canonicalEdges(edges: DataFrame, u: String, v: String): DataFrame =
    edges
      .select(least(col(u), col(v)).as("u"), greatest(col(u), col(v)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()

  /** Exact triangle count. Returns a single row
    * (n_nodes, n_edges, n_triangles), all BIGINT.
    *
    * `edges` may contain duplicates, self-loops, or both orientations —
    * the canonical pass normalizes. Node ids must fit in a long with
    * headroom: the orientation key packs (degree, id) as
    * degree·10⁹ + id, a deterministic total order shared with any
    * re-implementation (ties in degree break by id).
    */
  def triangleCount(edges: DataFrame, u: String, v: String): DataFrame = {
    val e = canonicalEdges(edges, u, v)

    val deg = e
      .select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n")
      .agg(count(lit(1)).as("deg"))

    // orientation key: total order by (degree, id). The degree table is
    // nodes-sized; both joins are plain equi-joins that scale with it.
    val keyed = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        col("u"), col("v"),
        (col("du") * lit(1000000000L) + col("u")).as("ku"),
        (col("dv") * lit(1000000000L) + col("v")).as("kv"))

    // direct each edge low-key -> high-key; keep the target's key so the
    // wedge join can order the two out-edges without re-joining degrees
    val dir = keyed.select(
      when(col("ku") <= col("kv"), col("u")).otherwise(col("v")).as("s"),
      when(col("ku") <= col("kv"), col("v")).otherwise(col("u")).as("t"),
      greatest(col("ku"), col("kv")).as("tk"))

    // wedges: two out-edges of the same center, ordered by target key so
    // each unordered pair appears once. Forward degree is O(sqrt(m)).
    val wedges = dir
      .as("e1")
      .join(dir.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.tk") < col("e2.tk"))
      .select(
        least(col("e1.t"), col("e2.t")).as("u"),
        greatest(col("e1.t"), col("e2.t")).as("v"))

    // a wedge closes iff its endpoint pair is an edge; e is distinct, so
    // the inner join preserves wedge multiplicity — one match per triangle
    val tri = wedges.join(e, Seq("u", "v")).agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(tri)
  }
}
