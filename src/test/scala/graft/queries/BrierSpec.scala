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
}
