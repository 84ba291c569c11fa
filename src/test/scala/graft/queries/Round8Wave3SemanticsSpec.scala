package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 wave 3 statistics (isotonic/PAVA, SPRT,
  * Adjusted Rand Index), independent of the DuckDB gate — both engines
  * share the formulas, so a shared mistake would gate green. Fixture
  * statistics are recomputed driver-side at sf0.001 with BigInt brute
  * force including every truncation point; the factored helpers
  * additionally get synthetic frames exercising branches the fixture
  * never reaches (PAVA violator pooling, SPRT lower-boundary H0
  * acceptance, perfect/independent ARI).
  */
class Round8Wave3SemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** (orderkey, cents, label) brute-force base, ascending orderkey. */
  private lazy val scored: Seq[(Long, Long, Long)] = {
    val ret = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("lab"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .collect().toSeq
      .map(r => (lng(r, 0), lng(r, 1), ret.getOrElse(lng(r, 0), 0L)))
      .sortBy(_._1)
  }

  test("q_eng_isotonic equals the brute-force minimax over truncated rates") {
    val n = scored.size
    val ranked = scored.sortBy(t => (t._2, t._1)) // (cents, orderkey) asc
    val bins = ranked.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 20 / n }
      .map { case (b, rows) =>
        (b, rows.size.toLong, rows.map(_._1._3).sum)
      }.toSeq.sortBy(_._1)
    val B = bins.size
    def rate(j: Int, k: Int): BigInt = {
      val slice = bins.slice(j, k + 1)
      BigInt(slice.map(_._3).sum) * 1000000 / slice.map(_._2).sum
    }
    val want = bins.indices.map { i =>
      val fit = (0 to i).map { j =>
        (i until B).map(k => rate(j, k)).min
      }.max
      (bins(i)._1, bins(i)._2, bins(i)._3,
        (BigInt(bins(i)._3) * 1000000 / bins(i)._2).toLong, fit.toLong)
    }
    val got = SparkEntry.queries("q_eng_isotonic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // and the defining property: the fit is monotone non-decreasing
    assert(got.map(_._5) == got.map(_._5).sorted)
  }

  test("isotonicFit pools adjacent violators (classic PAVA semantics)") {
    // exact-ppm rates: (bin0: 4/8 = 0.5, bin1: 1/5 = 0.2) — a violator
    // pair; PAVA pools to 5/13 both. Minimax: fit0 = min(4/8, 5/13) =
    // 5/13; fit1 = max(min(1/5), min over j=0 (5/13)) = 5/13.
    val v = Seq((0L, 8L, 4L), (1L, 5L, 1L)).toDF("bin", "n_bin", "pos_bin")
    val got = EvalQueries.isotonicFit(v).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pooled = BigInt(5) * 1000000 / 13
    assert(got == Map(0L -> pooled.toLong, 1L -> pooled.toLong))

    // already-monotone input is unchanged (exact ppm denominators)
    val m = Seq((0L, 4L, 1L), (1L, 2L, 1L), (2L, 5L, 4L))
      .toDF("bin", "n_bin", "pos_bin")
    val gotM = EvalQueries.isotonicFit(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotM == Map(0L -> 250000L, 1L -> 500000L, 2L -> 800000L))

    // partial pool: rates (0.8, 0.1, 0.3) — PAVA pools all three?
    // pool(1,2) = (1+3)/(10+10) = 0.2 < 0.8 → pool all: 12/30 = 0.4.
    val p = Seq((0L, 10L, 8L), (1L, 10L, 1L), (2L, 10L, 3L))
      .toDF("bin", "n_bin", "pos_bin")
    val gotP = EvalQueries.isotonicFit(p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotP == Map(0L -> 400000L, 1L -> 400000L, 2L -> 400000L))
  }

  test("q_eng_sprt equals the brute-force walk") {
    var cum = 0L
    var hit: Option[(Long, Long)] = None
    for (((_, _, lab), i) <- scored.zipWithIndex if hit.isEmpty) {
      cum += (if (lab == 1L) 154150L else -287682L)
      if (cum >= 2944438L || cum <= -2944438L) hit = Some((i + 1L, cum))
    }
    val (wantN, wantLlr) = hit.get // the fixture's ~0.737 rate must cross
    val row = SparkEntry.queries("q_eng_sprt")(spark, sf).collect().head
    assert(row.getLong(0) == wantN)
    assert(row.getLong(1) == wantLlr)
    assert(row.getString(2) ==
      (if (wantLlr >= 2944438L) "accept_h1" else "accept_h0"))
  }

  test("sprtDetect lower boundary and no-crossing cases") {
    // all-misses stream: each step −287682; crosses −2944438 at
    // ⌈2944438/287682⌉ = 11 steps → accept_h0 with llr = −3164502.
    val lo = (1L to 20L).map(k => (k, -287682L)).toDF("key", "llr")
    val gotLo = EvalQueries.sprtDetect(lo, 2944438L).collect()
    assert(gotLo.length == 1)
    assert(gotLo.head.getLong(0) == 11L)
    assert(gotLo.head.getLong(1) == -287682L * 11)
    assert(gotLo.head.getString(2) == "accept_h0")

    // balanced walk that never exits → empty result on BOTH engines
    val flat = (1L to 40L)
      .map(k => (k, if (k % 2 == 1) 100000L else -100000L))
      .toDF("key", "llr")
    assert(EvalQueries.sprtDetect(flat, 2944438L).collect().isEmpty)
  }

  test("q_sim_ari equals the brute-force ARI over the trained cells") {
    val cells = SparkEntry.queries("q_sim_ivf_kmeans")(spark, sf)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    val labs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    val ctg = cells.toSeq.map { case (id, c) => (c, labs(id)) }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, BigInt(v.size)) }
      .toSeq
    val sumIdx2 = ctg.map { case (_, _, x) => x * (x - 1) }.sum
    val aSums = ctg.groupBy(_._1).values.map(_.map(_._3).sum)
    val bSums = ctg.groupBy(_._2).values.map(_.map(_._3).sum)
    val sumA2 = aSums.map(a => a * (a - 1)).sum
    val sumB2 = bSums.map(b => b * (b - 1)).sum
    val n = aSums.sum
    val pairs2 = n * (n - 1)
    val ePpm = sumA2 * 1000000 / pairs2
    val e2 = 2 * sumB2 * ePpm / 1000000
    val num = 2 * sumIdx2 - e2
    val den = sumA2 + sumB2 - e2
    // BigInt / truncates toward zero — the mulDivWideSigned contract
    val wantAri = if (den <= 0) BigInt(0) else num * 1000000 / den
    val row = SparkEntry.queries("q_sim_ari")(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == aSums.size.toLong)
    assert(row.getLong(2) == bSums.size.toLong)
    assert(row.getLong(3) == wantAri.toLong)
  }

  test("ariFromContingency: perfect = 1e6, independent/degenerate = 0") {
    // perfect agreement: diagonal contingency → exactly 1e6 (num == den
    // identically, whatever the truncated expected term is)
    val perfect = Seq((0L, 0L, 10L), (1L, 1L, 20L), (2L, 2L, 30L))
      .toDF("cell", "lab", "nij")
    assert(SimilarityQueries.ariFromContingency(perfect)
      .collect().head.getLong(3) == 1000000L)

    // one cluster vs all-singleton labels: index 0, expectation 0 → 0
    val deg = (0L until 12L).map(l => (0L, l, 1L)).toDF("cell", "lab", "nij")
    assert(SimilarityQueries.ariFromContingency(deg)
      .collect().head.getLong(3) == 0L)

    // exactly independent 2×2 (all nij = 25): true ARI = −0.0102
    // (finite-n chance correction), two-step truncation → −10101 ppm
    val ind = Seq((0L, 0L, 25L), (0L, 1L, 25L), (1L, 0L, 25L), (1L, 1L, 25L))
      .toDF("cell", "lab", "nij")
    assert(SimilarityQueries.ariFromContingency(ind)
      .collect().head.getLong(3) == -10101L)
  }
}
