package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants of q_eng_brier (Murphy decomposition of the decile-binned
  * rank forecaster): the identity brier = reliability − resolution +
  * uncertainty must hold to per-bin integer-division slack, and every
  * component must respect its analytic bounds. */
class BrierSpec extends SparkSpec {

  test("decomposition identity and bounds on the fixture") {
    val r = SparkEntry.queries("q_eng_brier")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val n = row.getAs[Long]("n_tot")
    val pos = row.getAs[Long]("pos_tot")
    val brier = row.getAs[Long]("brier_ppm2")
    val rel = row.getAs[Long]("rel_ppm2")
    val res = row.getAs[Long]("res_ppm2")
    val unc = row.getAs[Long]("unc_ppm2")
    val gap = row.getAs[Long]("identity_gap_ppm2")
    assert(n > 0 && pos >= 0 && pos <= n)
    // ppm² bounds: brier ∈ [0, 1e12], unc ∈ [0, 0.25e12],
    // resolution cannot exceed uncertainty (law of total variance)
    assert(brier >= 0 && brier <= 1000000000000L)
    assert(unc >= 0 && unc <= 250000000000L)
    assert(rel >= 0 && res >= 0 && res <= unc)
    // the emitted gap is exactly brier − (rel − res + unc), and the true
    // rational identity holds to per-bin DIV rounding: ≤ 1 per bin and
    // ≤ 3 for the final three divisions, across ≤ 10 bins
    assert(math.abs(gap) <= 13, s"identity gap $gap exceeds rounding slack")
  }

  test("mergeable bin path is slicing-invariant (merge is exact addition)") {
    val sc = EvalQueries.scored(spark, sf)
    val one = EvalQueries.brierDecomposition(sc, slices = 1).collect()(0)
    val eight = EvalQueries.brierDecomposition(sc, slices = 8).collect()(0)
    val many = EvalQueries.brierDecomposition(sc, slices = 37).collect()(0)
    assert(one == eight && eight == many)
  }

  test("envelope: ~3e6 synthetic rows match a BigInt driver reference") {
    // the comment-promised >2e6-order path, now code: per-slice integer
    // bin tables merged by addition, final DECIMAL(38) arithmetic checked
    // bit-for-bit against exact BigInt at a scale where the res numerator
    // (pos·N)²·1e12 no longer fits in int64
    import org.apache.spark.sql.functions._
    val n = 3000000L
    val sc = spark.range(n).select(
      (col("id") + 1L).as("o_orderkey"),
      pmod(col("id") * 2654435761L, lit(999983L)).as("cents"))
      .withColumn("label",
        when(pmod(col("cents"), lit(5L)) === 0L || col("cents") > 500000L,
          1L).otherwise(0L))
    val bins = EvalQueries.brierBins(sc, slices = 8).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("pos"), r.getAs[Long]("sp")))
    assert(bins.length == 10 && bins.map(_._1).sum == n)
    val nt = BigInt(bins.map(_._1).sum)
    val pt = BigInt(bins.map(_._2).sum)
    val T = BigInt(1000000000000L)
    var sse = BigInt(0); var relsum = BigInt(0); var ressum = BigInt(0)
    var beyondInt64 = false
    for ((bn, pos, sp) <- bins) {
      val diff = BigInt(sp) - BigInt(pos) * 1000000
      val rdif = BigInt(pos) * nt - pt * BigInt(bn)
      sse += (diff * diff + BigInt(pos) * (BigInt(bn) - pos) * T) / BigInt(bn)
      relsum += diff * diff / BigInt(bn)
      ressum += rdif * rdif * T / (BigInt(bn) * nt * nt)
      if (rdif * rdif * T > BigInt(Long.MaxValue)) beyondInt64 = true
    }
    assert(beyondInt64, "test must exercise beyond-int64 intermediates")
    val row = EvalQueries.brierDecomposition(sc, slices = 8).collect()(0)
    assert(row.getAs[Long]("n_tot") == n)
    assert(BigInt(row.getAs[Long]("brier_ppm2")) == sse / nt)
    assert(BigInt(row.getAs[Long]("rel_ppm2")) == relsum / nt)
    assert(BigInt(row.getAs[Long]("res_ppm2")) == ressum / nt)
    assert(BigInt(row.getAs[Long]("unc_ppm2")) == pt * (nt - pt) * T / (nt * nt))
  }
}
