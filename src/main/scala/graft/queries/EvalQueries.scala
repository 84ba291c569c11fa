package graft.queries

import graft.Tables
import graft.functions.WideDiv.{mulDivWide, mulDivWideDec, mulDivWideSigned, ppmWide, sqlMulDiv, sqlMulDivSigned, sqlPpm, wide}
import graft.operators.StableIds
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Round-7 model-eval / feature-prep wave: the classifier-quality and
  * feature-engineering statistics a training-data pipeline runs over its
  * own heuristic labelers (quality scores, dedup flags, langid) before
  * trusting them at corpus scale — AUC, two-sample KS drift, calibration /
  * lift tables, leave-one-out target encoding, inter-rater agreement.
  *
  * The shared "prediction task" is built entirely from harness tables:
  * score = order total in exact cents, label = order contains a returned
  * lineitem (`l_returnflag = 'R'`). Everything downstream is exact integer
  * arithmetic (ppm outputs via the DECIMAL(38) wide path), so the DuckDB
  * twins compare bit-for-bit.
  *
  * Scale discipline: the rank-sum statistics (AUC, KS) run over the
  * DISTINCT-score domain through [[StableIds.rankAndCumSums]] — one
  * range-partitioned two-phase scan yielding the running counts of both
  * classes, never a single-partition `ORDER BY` window over an unbounded
  * domain. The calibration deciles rank per-row the same way
  * ([[StableIds.withRank]]). Outputs are all bounded (1–50 rows).
  */
object EvalQueries {

  /** (o_orderkey, o_custkey, o_orderpriority, cents, label): one row per
    * order. Lineitem partial-aggregates to per-order labels BEFORE the join
    * shuffle, so the join moves (orderkey, 1-bit) pairs, never line items. */
  private[queries] def scored(s: SparkSession, d: String): DataFrame =
    // memoized (opt r13): 19 eval/stats queries consume this projection,
    // and most reference it twice in one plan (totals + ranked pass), so
    // un-memoized the lineitem partial-agg + orders join re-ran per
    // reference per iteration. Same lifecycle discipline as the dedup
    // signature memos (QueryCaches tick/evict; build cost ledgered).
    QueryCaches.memo(s, d, "eval_scored") {
      val ret = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("label"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("cents"), coalesce(col("label"), lit(0L)).as("label"))
    }

  /** DuckDB twin of [[scored]]. */
  private[queries] val scoredSql =
    """scored AS (
         SELECT o_orderkey, o_custkey, o_orderpriority,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                CAST(COALESCE(r.label, 0) AS BIGINT) AS label
         FROM orders o LEFT JOIN (
           SELECT l_orderkey,
                  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS label
           FROM lineitem GROUP BY 1) r ON o.o_orderkey = r.l_orderkey)"""

  /** Decile bin tables for the Brier/Murphy readout, built MERGEABLY:
    * rank the scored rows once (range-partitioned, no global window),
    * aggregate per (slice, bin) — slice = pmod(o_orderkey, `slices`), a
    * deterministic stand-in for "per partition / per day at 100 TB" —
    * then merge by summing the three additive integer columns (n = row
    * count, pos = Σlabel, sp = Σp_ppm). Addition is exact and
    * order-free, so the merged table is bitwise the direct groupBy(bin)
    * table regardless of slicing; per-slice partials are what an
    * arbitrarily large corpus ships to the final 10-row reduce. */
  private[queries] def brierBins(sc: DataFrame, slices: Int): DataFrame = {
    val tot = sc.agg(count(lit(1)).as("n_tot"), sum(col("label")).as("pos_tot"))
    val partials = StableIds.withRank(sc,
        Seq(col("cents").desc, col("o_orderkey")), "rk")
      .crossJoin(broadcast(tot))
      // greatest(…,1): a one-row slice forecasts p=0 instead of
      // NULL-dividing (Spark DIV) vs erroring (DuckDB //) — the guard is
      // mirrored in the oracle so the degenerate case is defined equally
      .withColumn("p_ppm",
        expr("(n_tot - rk) * 1000000 DIV greatest(n_tot - 1, 1)"))
      .withColumn("bin", expr("(rk - 1) * 10 DIV n_tot"))
      .groupBy(pmod(col("o_orderkey"), lit(slices.toLong)).as("slice"),
        col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"),
        sum(col("p_ppm")).as("sp"))
    partials.groupBy("bin")
      .agg(sum("n").as("n"), sum("pos").as("pos"), sum("sp").as("sp"))
  }

  /** Murphy decomposition from a merged (bin, n, pos, sp) integer bin
    * table: per bin, SSE = ((S − pos·1e6)² + pos·(n−pos)·1e12)/n (the
    * rel + within-bin-variance split, both numerators non-negative),
    * resolution = (pos·N − POS·n)²·1e12/(n·N²), with N/POS re-derived by
    * summing the merged bins (so the helper needs nothing but the
    * additive table). The emitted identity gap brier − (rel − res + unc)
    * is the summed per-bin DIV rounding only (|gap| ≤ ~bins, bitwise
    * equal cross-engine). DECIMAL(38) envelope: the res numerator
    * (pos·N)²·1e12 ≤ 1e38 holds to N ≈ 3e6 rows per evaluated table;
    * larger corpora renormalize per evaluation slice — the bin MERGE
    * itself (pure long addition) never overflows before ~9e18 rows. */
  private[queries] def brierDecomposition(sc: DataFrame,
                                          slices: Int = 8): DataFrame = {
    val merged = brierBins(sc, slices)
    val tot = merged.agg(sum("n").as("nt"), sum("pos").as("pt"))
    val bins = merged.crossJoin(broadcast(tot))
    val diff = wide(col("sp") - col("pos") * 1000000L)
    val rdif = wide(col("pos") * col("nt") - col("pt") * col("n"))
    val terms = bins.select(col("n"), col("pos"), col("nt"), col("pt"),
      mulDivWide(diff * diff + wide(col("pos")) * wide(col("n") - col("pos"))
        * wide(lit(1000000000000L)), lit(1L), wide(col("n"))).as("sse"),
      mulDivWide(diff * diff, lit(1L), wide(col("n"))).as("rel"),
      mulDivWide(rdif * rdif, lit(1000000000000L),
        wide(col("n")) * wide(col("nt")) * wide(col("nt"))).as("res"))
    terms.groupBy()
      .agg(max(col("nt")).as("n_tot"), max(col("pt")).as("pos_tot"),
        sum(col("sse")).as("sse"), sum(col("rel")).as("relsum"),
        sum(col("res")).as("ressum"))
      .select(col("n_tot"), col("pos_tot"),
        mulDivWide(col("sse"), lit(1L), col("n_tot")).as("brier_ppm2"),
        mulDivWide(col("relsum"), lit(1L), col("n_tot")).as("rel_ppm2"),
        mulDivWide(col("ressum"), lit(1L), col("n_tot")).as("res_ppm2"),
        mulDivWide(wide(col("pos_tot")) * wide(col("n_tot") - col("pos_tot")),
          lit(1000000000000L),
          wide(col("n_tot")) * wide(col("n_tot"))).as("unc_ppm2"))
      .withColumn("identity_gap_ppm2",
        col("brier_ppm2") - (col("rel_ppm2") - col("res_ppm2")
          + col("unc_ppm2")))
  }

  /** Benjamini–Hochberg step-up over a (name, p_ub_ppm) frame: rank by
    * (p asc, name asc), reject ranks ≤ max{i : p_(i)·m ≤ i·α·1e6}. Factored
    * out so the property spec can drive synthetic p-value frames with
    * mixed accept/reject outcomes through the SAME code path the fixture
    * query uses (the fixture is deliberately uniform, so the honest gate
    * result rejects nothing and would leave this branch unexercised).
    * The Window is over the caller's BOUNDED test-family domain. */
  /** Per-nation Chebyshev p-value upper bounds on the return-rate test —
    * the (n_name, p_ub_ppm) frame both FDR procedures rank. See
    * q_eng_fdr_bh's comment for the two-step dev-division contract. */
  private def nationReturnPv(s: SparkSession, d: String): DataFrame = {
    val oc = scored(s, d)
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val byNation = oc.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
    val tot = byNation
      .agg(sum(col("n")).as("n_tot"), sum(col("pos")).as("pos_tot"))
    byNation.crossJoin(broadcast(tot))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("dev", abs(wide(col("pos")) * wide(col("n_tot")) -
        wide(col("n")) * wide(col("pos_tot"))))
      .withColumn("varnum", wide(col("n")) * wide(col("pos_tot")) *
        wide(col("n_tot") - col("pos_tot")))
      .withColumn("q1",
        when(col("dev") > 0, mulDivWide(col("varnum"), lit(1L), col("dev"))))
      .withColumn("p_ub_ppm",
        when(col("dev") === 0 || wide(col("q1")) >= col("dev"), lit(1000000L))
          .otherwise(mulDivWide(col("q1"), lit(1000000L), col("dev"))))
      .select(col("n_name"), col("p_ub_ppm"))
  }

  private[queries] def bhStepUp(pv: DataFrame, alphaPpm: Long): DataFrame =
    stepUp(pv, alphaPpm, harmonic = false)

  /** Benjamini–Yekutieli variant: the arbitrary-dependence-robust step-up
    * divides α by H_m = Σ_{i≤m} 1/i. H_m enters as the integer
    * per-term-truncated micro-scale sum Σ⌊1e6/i⌋ (both engines build the
    * identical value over the bounded family), so the rejection rule
    * p·m·H_ppm ≤ i·α_ppm·1e6 stays exact int64 — p ≤ 1e6, m and H
    * bounded by the caller's test-family domain. */
  private[queries] def byStepUp(pv: DataFrame, alphaPpm: Long): DataFrame =
    stepUp(pv, alphaPpm, harmonic = true)

  private def stepUp(pv: DataFrame, alphaPpm: Long,
                     harmonic: Boolean): DataFrame = {
    val mdf = pv.agg(count(lit(1)).as("m"))
    val ranked = pv
      .withColumn("rk",
        row_number().over(Window.orderBy(col("p_ub_ppm"), col("n_name")))
          .cast("long"))
      .crossJoin(broadcast(mdf))
    val rejectAt =
      if (harmonic)
        col("p_ub_ppm") * col("m") *
          expr("aggregate(sequence(1L, m), 0L, (acc, i) -> acc + 1000000 DIV i)") <=
          col("rk") * alphaPpm * lit(1000000L)
      else
        col("p_ub_ppm") * col("m") <= col("rk") * alphaPpm
    val km = ranked.agg(max(when(rejectAt, col("rk"))).as("kmax"))
    ranked.crossJoin(broadcast(km))
      .select(col("n_name"), col("p_ub_ppm"), col("rk"),
        when(col("rk") <= coalesce(col("kmax"), lit(0L)), 1L).otherwise(0L)
          .as("rejected"))
      .orderBy(col("rk"))
  }

  /** PAVA via the minimax identity over a BOUNDED (bin, n_bin, pos_bin)
    * frame: iso_ppm(i) = max_{j≤i} min_{k≥i} ⌊1e6·pos(j..k)/n(j..k)⌋.
    * Factored so specs can drive synthetic bin frames (violator pools,
    * already-monotone inputs) through the exact code path the fixture
    * query uses. Caller guarantees the bin domain is small (≤ ~100): the
    * interval table is O(B²), the interval×bin join O(B³), the Window is
    * over the B-row domain. */
  private[queries] def isotonicFit(bins: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cn", sum(col("n_bin")).over(w))
      .withColumn("cp", sum(col("pos_bin")).over(w))
    val lo = cum.select(col("bin").as("j"),
      (col("cn") - col("n_bin")).as("cn0"), (col("cp") - col("pos_bin")).as("cp0"))
    val hi = cum.select(col("bin").as("k2"), col("cn").as("cn1"), col("cp").as("cp1"))
    val ivl = lo.join(broadcast(hi), col("j") <= col("k2"))
      .select(col("j"), col("k2"),
        ppmWide(col("cp1") - col("cp0"), col("cn1") - col("cn0")).as("a_ppm"))
    bins.select(col("bin"))
      .join(broadcast(ivl), col("j") <= col("bin") && col("bin") <= col("k2"))
      .groupBy(col("bin"), col("j")).agg(min(col("a_ppm")).as("mn"))
      .groupBy(col("bin")).agg(max(col("mn")).as("iso_ppm"))
  }

  /** Wald SPRT stopping rule over a (key, llr) stream ordered by `key`:
    * first rank where the running micro-nat LLR exits ±`bound`. One
    * two-phase rankAndCumSums scan + a broadcast row-lookup; returns
    * (n_obs, llr_micro, decision) — empty iff the walk never exits.
    * Factored so specs can drive synthetic streams with hand-computed
    * crossings (including lower-boundary H0 acceptance, which a
    * high-rate fixture never exercises). */
  private[queries] def sprtDetect(stream: DataFrame, bound: Long): DataFrame = {
    val cum = StableIds.rankAndCumSums(stream, Seq(col("key")),
      Seq("llr" -> "cum_llr"))
    val cross = cum
      .where(col("cum_llr") >= bound || col("cum_llr") <= -bound)
      .agg(min(col("rank")).as("n_obs"))
    cum.join(broadcast(cross), col("rank") === col("n_obs"))
      .select(col("n_obs"), col("cum_llr").as("llr_micro"),
        when(col("cum_llr") >= bound, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"))
  }

  /** Tie-corrected Mann-Whitney U over a row frame: arm A = rows where
    * `g1`, value = `v`. Average ranks ride one distinct-value
    * [[StableIds.rankAndCumSums]] scan (2× scaling keeps tied mid-ranks
    * integer: avgrank·2 = 2·cum_before + t + 1); the variance floor
    * V = ⌊n_a·n_b·(N(N−1)(N+1) − Σ(t³−t)) / (12N(N−1))⌋ is exact
    * DECIMAL(38) arithmetic, and z = (2U − n_a·n_b) / 2√V is one IEEE
    * tree over the exact integers. Returns a single row
    * (n_a, n_b, u1x2 = 2·U_A, z). Factored so specs can drive synthetic
    * heavily-tied frames through the exact code path the fixture query
    * uses (the fixture's cents are near-unique, so the tie-correction
    * terms are barely exercised there). */
  private[queries] def mannWhitneyU(rows: DataFrame, v: Column,
                                    g1: Column): DataFrame = {
    val sc = rows
      .select(v.as("v"), when(g1, 1L).otherwise(0L).as("g1"))
      .groupBy(col("v"))
      .agg(sum(col("g1")).as("n1"),
        (count(lit(1)) - sum(col("g1"))).as("n2"))
    val agg = StableIds.rankAndCumSums(sc, Seq(col("v")),
        Seq("n1" -> "cum1", "n2" -> "cum2"))
      .select(
        (wide(col("n1")) *
          wide((col("cum1") - col("n1") + col("cum2") - col("n2")) * 2L +
            col("n1") + col("n2") + 1L)).as("r2term"),
        col("n1"), col("n2"),
        (wide(col("n1") + col("n2")) * wide(col("n1") + col("n2")) *
          wide(col("n1") + col("n2")) -
          wide(col("n1") + col("n2"))).as("tieterm"))
      .agg(sum(col("r2term")).as("r1x2"), sum(col("n1")).as("t1"),
        sum(col("n2")).as("t2"), sum(col("tieterm")).as("ties"))
    val n = col("t1") + col("t2")
    agg
      .withColumn("u1x2",
        (col("r1x2") - wide(col("t1")) * wide(col("t1") + lit(1L)))
          .cast("long"))
      .withColumn("adiff", col("u1x2") - col("t1") * col("t2"))
      .withColumn("vfloor", mulDivWide(
        wide(col("t1")) * wide(col("t2")) *
          (wide(n) * wide(n - lit(1L)) * wide(n + lit(1L)) - col("ties")),
        lit(1L),
        wide(lit(12L)) * wide(n) * wide(n - lit(1L))))
      .select(col("t1").as("n_a"), col("t2").as("n_b"),
        col("u1x2"),
        (col("adiff").cast("double") /
          (lit(2.0) * sqrt(col("vfloor").cast("double")))).as("z"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // AUC of the cents score predicting the returned label, as the exact
    // Mann-Whitney rank-sum with the standard tie correction: over the
    // distinct-score domain, U2 = Σ np(s)·(2·negBelow(s) + nn(s)) — twice
    // the U statistic so ties stay integral — and AUC = U2 / (2·P·N).
    // The running negative count comes from ONE two-phase range-partitioned
    // scan (rankAndCumSums), not a global window; per-term products run in
    // DECIMAL(38) (np × cumulative counts is sums-of-rows × rows — past
    // int64 at the 100 TB design point).
    "q_eng_auc" -> ((s, d) => {
      val sc = scored(s, d)
        .groupBy(col("cents"))
        .agg(sum(col("label")).as("np"),
          (count(lit(1)) - sum(col("label"))).as("nn"))
      val cum = StableIds.rankAndCumSums(sc, Seq(col("cents")),
        Seq("nn" -> "cumnn"))
      cum.select(
          (wide(col("np")) *
            wide((col("cumnn") - col("nn")) * 2L + col("nn"))).as("t"),
          col("np"), col("nn"))
        .agg(sum(col("t")).as("u2"),
          sum(col("np")).as("npos"), sum(col("nn")).as("nneg"))
        .select(
          mulDivWide(col("u2"), lit(1000000L),
            wide(col("npos")) * wide(col("nneg")) * wide(lit(2L))).as("auc_ppm"),
          col("npos"), col("nneg"))
    }),

    // two-sample Kolmogorov-Smirnov distance between the order-value
    // distributions of urgent vs non-urgent orders: D = max_s |F1(s)-F2(s)|,
    // computed cross-multiplied in DECIMAL(38) (|cum1·N2 - cum2·N1|) so the
    // ECDFs never touch floating point. Both running counts come from the
    // SAME two-phase scan over the distinct-score domain — this is what
    // rankAndCumSums' multi-value form exists for.
    "q_eng_ks_test" -> ((s, d) => {
      val sc = scored(s, d)
        .withColumn("g1",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
        .groupBy(col("cents"))
        .agg(sum(col("g1")).as("n1"),
          (count(lit(1)) - sum(col("g1"))).as("n2"))
      val tot = sc.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
      StableIds.rankAndCumSums(sc, Seq(col("cents")),
          Seq("n1" -> "cum1", "n2" -> "cum2"))
        .crossJoin(broadcast(tot))
        .select(abs(wide(col("cum1")) * wide(col("t2")) -
            wide(col("cum2")) * wide(col("t1"))).as("diff"),
          col("t1"), col("t2"))
        .groupBy(col("t1"), col("t2"))
        .agg(max(col("diff")).as("maxdiff"))
        .select(
          mulDivWide(col("maxdiff"), lit(1000000L),
            wide(col("t1")) * wide(col("t2"))).as("ks_ppm"),
          col("t1").as("n_urgent"), col("t2").as("n_other"))
    }),

    // Mann-Whitney U (Wilcoxon rank-sum) between urgent and non-urgent
    // order values: the nonparametric two-sample location test that
    // complements the KS distance above. Average ranks ride the SAME
    // distinct-score rankAndCumSums scan (2× scaling keeps tied mid-ranks
    // integer: avgrank·2 = 2·cum_before + t + 1), the tie-corrected
    // variance floor V = ⌊n1·n2·(N(N−1)(N+1) − Σ(t³−t)) / (12N(N−1))⌋ is
    // exact DECIMAL(38) arithmetic mirrored floor-for-floor in DuckDB, and
    // z is one identical IEEE tree over the exact integers (A / 2√V; the
    // sub-integer truncation of V is ~1e-16 relative at fixture scale and
    // bit-identical cross-engine by construction).
    "q_eng_mann_whitney" -> ((s, d) =>
      mannWhitneyU(scored(s, d), col("cents"),
          col("o_orderpriority") === "1-URGENT")
        .withColumnRenamed("n_a", "n_urgent")
        .withColumnRenamed("n_b", "n_other")),

    // Cohen's d effect size between the urgent / non-urgent order-value
    // arms — the standardized-mean-difference companion to the MW-U rank
    // test: one conditional-moment aggregate (count, Σ, Σ² per arm, the
    // squares in DECIMAL(38)), then d = (m1−m2)/s_pooled as a single
    // identical IEEE tree over the exact integer moments (integer-valued
    // DECIMAL(38,0) → DOUBLE is correctly rounded in both engines — the
    // decSumToDouble audit).
    "q_eng_cohens_d" -> ((s, d) => {
      val o = scored(s, d).select(
        (col("o_orderpriority") === "1-URGENT").as("g"), col("cents"))
      val a = o.agg(
        count(when(col("g"), 1)).as("n1"),
        count(when(!col("g"), 1)).as("n2"),
        sum(when(col("g"), wide(col("cents")))).as("s1"),
        sum(when(!col("g"), wide(col("cents")))).as("s2"),
        sum(when(col("g"), wide(col("cents")) * wide(col("cents"))))
          .as("q1"),
        sum(when(!col("g"), wide(col("cents")) * wide(col("cents"))))
          .as("q2"))
      def dbl(c: Column): Column = c.cast("double")
      val ss1 = dbl(col("q1")) - dbl(col("s1")) * dbl(col("s1")) / dbl(col("n1"))
      val ss2 = dbl(col("q2")) - dbl(col("s2")) * dbl(col("s2")) / dbl(col("n2"))
      a.select(col("n1").as("n_urgent"), col("n2").as("n_other"),
        ((dbl(col("s1")) / dbl(col("n1")) - dbl(col("s2")) / dbl(col("n2"))) /
          sqrt((ss1 + ss2) / (dbl(col("n1")) + dbl(col("n2")) - lit(2.0))))
          .as("cohens_d"))
    }),

    // Cochran-Armitage trend test: does the returned-order rate trend
    // monotonically across the ordered priority scale (score = the
    // priority digit 1..5)? The dose-response audit a pipeline runs on
    // any ordinal quality band before trusting it as a filter. One
    // bounded (score → n_i, r_i) aggregate; z² is one exact rational —
    // numerator N·(N·Σsr − R·Σsn)², denominator
    // R·(N−R)·(N·Σs²n − (Σsn)²) — floored once to ppm in DECIMAL(38).
    "q_eng_cochran_armitage" -> ((s, d) => {
      val g = scored(s, d)
        .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("sc"),
          col("label"))
        .groupBy(col("sc"))
        .agg(count(lit(1)).as("n_i"), sum(col("label")).as("r_i"))
      val a = g.agg(sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
        sum(col("sc") * col("n_i")).as("sn"),
        sum(col("sc") * col("r_i")).as("sr"),
        sum(col("sc") * col("sc") * col("n_i")).as("s2n"))
      val t = wide(col("n")) * wide(col("sr")) - wide(col("r")) * wide(col("sn"))
      a.select(col("n"), col("r"),
        signum(t).cast("long").as("trend_sign"),
        mulDivWide(wide(col("n")) * t * t, lit(1000000L),
          wide(col("r")) * wide(col("n") - col("r")) *
            (wide(col("n")) * wide(col("s2n")) -
              wide(col("sn")) * wide(col("sn")))).as("z2_ppm"))
    }),

    // Cochran's Q: did the same customers' ordering behavior change
    // across 1995/1996/1997? Blocks = customers, treatments = years,
    // x_ij = customer i placed ≥1 order in year j. The repeated-measures
    // binary test kappa/McNemar generalize to k > 2. One distinct
    // (customer, year) flag table (bounded by 3 rows per customer), then
    // Q = (k−1)(kΣC_j² − N²)/(kN − ΣR_i²) in exact integers.
    "q_eng_cochran_q" -> ((s, d) => {
      val x = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"),
          year(to_date(col("o_orderdate"))).cast("long").as("yr"))
        .where(col("yr").between(1995L, 1997L))
        .distinct()
      val rows = x.groupBy(col("ck")).agg(count(lit(1)).as("ri"))
      val colsT = x.groupBy(col("yr")).agg(count(lit(1)).as("cj"))
      val tot = rows.agg(sum(col("ri")).as("nn"),
        sum(col("ri") * col("ri")).as("r2"), count(lit(1)).as("b"))
      val csum = colsT.agg(sum(col("cj") * col("cj")).as("c2"))
      tot.crossJoin(broadcast(csum))
        .select(col("b").as("n_blocks"), col("nn").as("n_flags"),
          mulDivWide(
            wide(lit(2L)) * (wide(lit(3L)) * wide(col("c2")) -
              wide(col("nn")) * wide(col("nn"))),
            lit(1000000L),
            wide(lit(3L)) * wide(col("nn")) - wide(col("r2"))).as("q_ppm"))
    }),

    // calibration / lift table: equidepth deciles of the score (ranked
    // scalably — range-partitioned zipWithIndex, no global window), per-bin
    // observed positive rate in ppm and lift vs the base rate in ppm.
    // The reliability readout a pipeline runs on every heuristic quality
    // scorer before using it to filter a corpus.
    "q_eng_calibration" -> ((s, d) => {
      val sc = scored(s, d)
      val tot = sc.agg(count(lit(1)).as("n_tot"), sum(col("label")).as("pos_tot"))
      StableIds.withRank(sc, Seq(col("cents").desc, col("o_orderkey")), "rk")
        .crossJoin(broadcast(tot))
        .withColumn("bin", expr("(rk - 1) * 10 DIV n_tot"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_bin"), sum(col("label")).as("pos_bin"),
          max(col("n_tot")).as("n_tot"), max(col("pos_tot")).as("pos_tot"))
        .select(col("bin"), col("n_bin"), col("pos_bin"),
          ppmWide(col("pos_bin"), col("n_bin")).as("pos_rate_ppm"),
          mulDivWide(wide(col("pos_bin")) * wide(col("n_tot")), lit(1000000L),
            wide(col("n_bin")) * wide(col("pos_tot"))).as("lift_ppm"))
        .orderBy(col("bin"))
    }),

    // Brier score + Murphy decomposition (reliability − resolution +
    // uncertainty) of the decile-binned rank forecaster: forecast =
    // the bin's mean score percentile (p_ppm = (n−rk)·1e6 DIV (n−1)),
    // outcome = the returned-order label. Everything in exact ppm²
    // integers — see [[brierDecomposition]], which runs the MERGEABLE
    // path: per-slice integer bin tables (n/pos/S — pure sums) merged by
    // addition before any division, the shape a 100 TB evaluation runs
    // (each slice stays inside the DECIMAL(38) envelope; the merge is
    // exact). Gated here; envelope-spec'd at ~3e6 synthetic rows against
    // a BigInt driver reference in BrierMergeSpec.
    "q_eng_brier" -> ((s, d) => brierDecomposition(scored(s, d))),

    // leave-one-out target encoding of customer nation against the returned
    // label: enc(nation, label) = (pos(nation) - label) / (n(nation) - 1) in
    // exact ppm. LOO is constant given (nation, label), so the output is the
    // bounded (nation × label) table — the full per-row encode at 100 TB is
    // the same broadcast of per-nation stats this plan builds. Orders join
    // customers on the one custkey shuffle; nation names broadcast.
    "q_eng_target_encode" -> ((s, d) => {
      val oc = scored(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      val byLabel = oc.groupBy(col("c_nationkey"), col("label"))
        .agg(count(lit(1)).as("n_rows"))
      val stats = oc.groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
      byLabel
        .join(broadcast(stats), col("c_nationkey") === col("nk"))
        .where(col("n") > 1L)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("label"), col("n_rows"),
          ppmWide(col("pos") - col("label"), col("n") - 1L).as("enc_ppm"))
        .orderBy(col("n_name"), col("label"))
    }),

    // Cohen's kappa between two heuristic raters — rater A: order priority
    // urgent/high; rater B: returned label. One pass builds the 2x2
    // contingency; kappa = (n·(n00+n11) - pe) / (n² - pe) with
    // pe = a1·b1 + a0·b0, all in DECIMAL(38) (n² overflows int64 past ~3e9
    // rows), signed-truncating division — kappa is legitimately negative
    // for anti-correlated raters.
    "q_eng_kappa" -> ((s, d) => {
      scored(s, d)
        .withColumn("a",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L))
        .agg(count(lit(1)).as("n"), sum(col("a")).as("a1"),
          sum(col("label")).as("b1"),
          sum(col("a") * col("label")).as("n11"))
        .select(
          mulDivWideSigned(
            wide(col("n")) * wide(col("n") - col("a1") - col("b1") +
              col("n11") * 2L) -
              (wide(col("a1")) * wide(col("b1")) +
                wide(col("n") - col("a1")) * wide(col("n") - col("b1"))),
            lit(1000000L),
            wide(col("n")) * wide(col("n")) -
              (wide(col("a1")) * wide(col("b1")) +
                wide(col("n") - col("a1")) * wide(col("n") - col("b1"))))
            .as("kappa_ppm"),
          col("n"), col("a1"), col("b1"), col("n11"))
    }),

    // Benjamini–Hochberg FDR over per-nation return-rate tests, all-integer:
    // under H0 a nation's positive count is Binomial(n, p0) with p0 the
    // global rate, and Chebyshev bounds p ≤ Var/dev² = n·p0(1−p0)/(pos−n·p0)².
    // Clearing denominators by n_tot²: varnum = n·pos_tot·(n_tot−pos_tot),
    // dev = |pos·n_tot − n·pos_tot|. The ppm bound divides by dev TWICE
    // (q1 = ⌊varnum/dev⌋, then ⌊q1·1e6/dev⌋, with an early q1 ≥ dev → 1e6
    // cap) so no intermediate ever squares dev — dev² alone reaches 1e48
    // at the 100 TB design point and would overflow DECIMAL(38)/HUGEINT
    // in BOTH engines. The two-step truncation IS the cross-engine
    // contract, mirrored verbatim in the oracle. The BH step-up then runs
    // on the BOUNDED nation domain (≤25 rows — the Window is over a
    // dimension table, same discipline as q_sample_pps): rank by (p asc,
    // name), reject ranks ≤ max{i : p_(i)·m ≤ i·α·1e6}, α = 0.05.
    "q_eng_fdr_bh" -> ((s, d) =>
      bhStepUp(nationReturnPv(s, d), alphaPpm = 50000L)),

    // Benjamini–Yekutieli over the SAME per-nation Chebyshev p-value
    // bounds: the dependence-robust step-up (per-nation tests share the
    // global rate estimate, so independence is genuinely questionable
    // here). Same bounded-domain machinery; only the rejection threshold
    // tightens by the exact integer harmonic factor.
    "q_eng_fdr_by" -> ((s, d) =>
      byStepUp(nationReturnPv(s, d), alphaPpm = 50000L)),

    // McNemar's paired test on the 2×2 disagreement between the two
    // heuristic raters q_eng_kappa compares (rater A: priority ∈
    // {urgent, high}; rater B: order contains a return): χ² = (b−c)²/(b+c)
    // over the discordant counts only — the paired-rater upgrade question
    // ("does B systematically flag what A misses?") that kappa's symmetric
    // agreement number can't answer. One corpus aggregate; (b−c)² runs in
    // DECIMAL(38) (b,c are row counts — squares pass int64 at ~3e9 rows).
    "q_eng_mcnemar" -> ((s, d) => {
      scored(s, d)
        .withColumn("a",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L))
        .agg(sum(when(col("a") === 1L && col("label") === 0L, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("a") === 0L && col("label") === 1L, 1L)
            .otherwise(0L)).as("c"))
        .select(col("b"), col("c"),
          when(col("b") + col("c") === 0L, lit(0L))
            .otherwise(mulDivWide(
              wide(col("b") - col("c")) * wide(col("b") - col("c")),
              lit(1000000L), col("b") + col("c"))).as("chi2_ppm"))
    }),

    // Spearman rank correlation between order value and basket size
    // (line count), tie-corrected via Pearson-on-midranks in EXACT integer
    // arithmetic: doubled midranks (2·cum − cnt + 1, always integral) have
    // mean exactly n+1, so centering is integer subtraction and the
    // centered values are |c| ≤ n — the moment sums stay ≤ n³ ≤ 1e36 in
    // DECIMAL(38) at the 100 TB design point (never the n⁴ of the
    // uncentered form). ρ² would need num²/(dx·dy) ~ n¹² — instead the
    // SYMMETRIC two-step t1 = ⌊|num|·1e6/dx⌋, t2 = ⌊|num|·1e6/dy⌋,
    // ρ²_ppm = sign·⌊t1·t2/1e6⌋ keeps every intermediate ≤ 1e24 and the
    // product ≤ 1e12 by Cauchy–Schwarz (num² ≤ dx·dy). The two-step
    // truncation IS the cross-engine contract, mirrored in the oracle.
    // Midrank lookup: x-ranks come from one rankAndCumSums over the
    // distinct-cents domain joined back on cents; y (basket size) is a
    // ≤10-value domain — broadcast.
    "q_eng_spearman" -> ((s, d) => {
      // memoized: the (cents, nlines) pair table feeds FOUR consumers
      // (x-domain, y-domain, total, centered moments) — without the cache
      // each re-runs the orders⋈lineitem join; with it the join runs once
      // (the production-scale persist, lifecycle-managed by QueryCaches)
      val rows = QueryCaches.memo(s, d, "spearman_rows") {
        scored(s, d)
          .join(Tables.lineitem(s, d)
            .groupBy(col("l_orderkey")).agg(count(lit(1)).as("nlines")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("cents"), col("nlines"))
      }
      val xd = rows.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      val xr = StableIds.rankAndCumSums(xd, Seq(col("cents")),
          Seq("cnt" -> "cum"))
        .select(col("cents").as("xv"),
          (col("cum") * 2L - col("cnt") + 1L).as("mx2"))
      val yd = rows.groupBy(col("nlines")).agg(count(lit(1)).as("cnt"))
      val yr = StableIds.rankAndCumSums(yd, Seq(col("nlines")),
          Seq("cnt" -> "cum"))
        .select(col("nlines").as("yv"),
          (col("cum") * 2L - col("cnt") + 1L).as("my2"))
      val tot = rows.agg(count(lit(1)).as("n"))
      val cent = rows
        .join(xr, col("cents") === col("xv"))
        .join(broadcast(yr), col("nlines") === col("yv"))
        .crossJoin(broadcast(tot))
        .select(col("n"), (col("mx2") - col("n") - 1L).as("cx"),
          (col("my2") - col("n") - 1L).as("cy"))
      cent.groupBy(col("n"))
        .agg(sum(wide(col("cx")) * wide(col("cy"))).as("num"),
          sum(wide(col("cx")) * wide(col("cx"))).as("dx"),
          sum(wide(col("cy")) * wide(col("cy"))).as("dy"))
        .select(col("n"),
          when(col("dx") <= 0 || col("dy") <= 0, lit(0L))
            .otherwise(
              when(col("num") < 0, lit(-1L)).otherwise(lit(1L)) *
                mulDivWide(
                  mulDivWideDec(abs(col("num")), lit(1000000L), col("dx")),
                  mulDivWideDec(abs(col("num")), lit(1000000L), col("dy")),
                  lit(1000000L))).as("rho2_sign_ppm"))
    }),

    // Split-conformal prediction thresholds with test-side coverage:
    // calibration = odd order keys, test = even; per priority group the
    // threshold is the k-th smallest calibration score with
    // k = min(n, ⌈0.9·(n+1)⌉) (the n-cap keeps the group well-defined when
    // ⌈0.9(n+1)⌉ > n — documented divergence from the +∞ threshold).
    // Selection is NOT a per-group sort: the distinct (group, score)
    // domain goes through ONE global rankAndCumSums two-phase scan ordered
    // by (group, score); per-group running counts are the global running
    // sum minus the earlier-groups offset (a ≤5-row broadcast — the
    // Window below is over the bounded priority domain). Coverage then
    // broadcasts the 5-row threshold table against the test split.
    "q_eng_conformal" -> ((s, d) => {
      val sc = scored(s, d)
      val cal = sc.where(col("o_orderkey") % 2 === 1)
      val tst = sc.where(col("o_orderkey") % 2 === 0)
      val dist = cal.groupBy(col("o_orderpriority").as("g"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val cum = StableIds.rankAndCumSums(dist,
        Seq(col("g"), col("cents")), Seq("cnt" -> "cum"))
      val gk = dist.groupBy(col("g")).agg(sum(col("cnt")).as("n_cal"))
        .withColumn("off", coalesce(sum(col("n_cal")).over(
          Window.orderBy(col("g"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("k",
          least(col("n_cal"), expr("(n_cal * 9 + 18) DIV 10")))
      val thr = cum.join(broadcast(gk), Seq("g"))
        .where(col("cum") - col("off") >= col("k"))
        .groupBy(col("g"))
        .agg(min(col("cents")).as("threshold_cents"))
      val cov = tst
        .join(broadcast(thr), col("o_orderpriority") === thr("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("cents") <= col("threshold_cents"), 1L).otherwise(0L))
            .as("covered"))
      gk.join(broadcast(thr), Seq("g")).join(broadcast(cov), Seq("g"))
        .select(col("g").as("priority"), col("n_cal"), col("k"),
          col("threshold_cents"), col("n_test"), col("covered"),
          ppmWide(col("covered"), col("n_test")).as("coverage_ppm"))
        .orderBy(col("priority"))
    }),

    // Isotonic (monotone non-decreasing) calibration of the score→label
    // relation via the PAVA minimax identity: over 20 equidepth score bins,
    // fit_i = max_{j≤i} min_{k≥i} rate(j..k) with rate(j..k) the pooled
    // positive rate of bins j..k. The minimax runs over ppm-TRUNCATED pooled
    // rates — that truncation is the cross-engine contract (comparing exact
    // rationals would need fraction ordering both engines can't hash-match).
    // Scale shape: ONE corpus-sized aggregate lands the 20-row bin table
    // (ranked scalably via StableIds — no global row window); every join
    // after it is over the bounded bin/interval domain (≤ 210 interval
    // rows, ≤ 1.5k interval×bin rows), so the O(B³) closed form replaces
    // the inherently sequential PAVA sweep with bounded declarative joins.
    // The Window below is over the 20-row bin domain.
    "q_eng_isotonic" -> ((s, d) => {
      val sc = scored(s, d)
      val tot = sc.agg(count(lit(1)).as("n_tot"))
      // localCheckpoint: the 20-row bin table is consumed by four
      // downstream subtrees (lo/hi/minimax/final) — without it each one
      // re-runs the corpus aggregate (8 parquet scans in the probed plan;
      // 1 after). Same tiny-frame precedent as Similarity.kmeansCentroids.
      val bins = StableIds.withRank(sc, Seq(col("cents"), col("o_orderkey")), "rk")
        .crossJoin(broadcast(tot))
        .withColumn("bin", expr("(rk - 1) * 20 DIV n_tot"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_bin"), sum(col("label")).as("pos_bin"))
        .localCheckpoint()
      bins.join(broadcast(isotonicFit(bins)), Seq("bin"))
        .select(col("bin"), col("n_bin"), col("pos_bin"),
          ppmWide(col("pos_bin"), col("n_bin")).as("raw_ppm"), col("iso_ppm"))
        .orderBy(col("bin"))
    }),

    // Wald's sequential probability ratio test over the arrival-ordered
    // returned-label stream: H0 p = 0.6 vs H1 p = 0.7, α = β = 0.05. Each
    // order contributes a FIXED integer micro-nat log-likelihood step
    // (⌊ln(0.7/0.6)·1e6⌋ = +154150 on a return, trunc(ln(0.3/0.4)·1e6) =
    // −287682 otherwise — the constants are shared literals, no runtime
    // logs, so the walk is exact integer arithmetic in both engines); the
    // test stops at the first |LLR| ≥ ⌊ln((1−β)/α)·1e6⌋ = ln(19) µnats.
    // The corpus-sized running sum is ONE StableIds.rankAndCumSums
    // two-phase scan (never a single-partition ORDER BY window); crossing
    // detection is an aggregate over the crossing rows plus one broadcast
    // row-lookup join. The early-stopping readout an A/B pipeline runs
    // instead of fixing n up front.
    "q_eng_sprt" -> ((s, d) =>
      sprtDetect(
        scored(s, d).select(col("o_orderkey").as("key"),
          when(col("label") === 1L, lit(154150L)).otherwise(lit(-287682L))
            .as("llr")),
        bound = 2944438L))
  )

  val oracleSql: Map[String, String] = Map(
    "q_eng_auc" ->
      s"""WITH $scoredSql,
         sc AS (SELECT cents, CAST(sum(label) AS BIGINT) AS np,
                       CAST(count(*) - sum(label) AS BIGINT) AS nn
                FROM scored GROUP BY 1),
         cumt AS (SELECT np, nn,
                    CAST(sum(nn) OVER (ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cumnn
                  FROM sc),
         u AS (SELECT CAST(sum(CAST(np AS HUGEINT) *
                        (2 * (cumnn - nn) + nn)) AS HUGEINT) AS u2,
                      CAST(sum(np) AS BIGINT) AS npos,
                      CAST(sum(nn) AS BIGINT) AS nneg
               FROM cumt)
         SELECT ${sqlMulDiv("u2", "1000000",
        "2 * CAST(npos AS HUGEINT) * CAST(nneg AS HUGEINT)")} AS auc_ppm,
                npos, nneg
         FROM u""",

    "q_eng_ks_test" ->
      s"""WITH $scoredSql,
         sc AS (SELECT cents,
                       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(count(*) - sum(CASE WHEN o_orderpriority =
                         '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n2
                FROM scored GROUP BY 1),
         cumt AS (SELECT
                    CAST(sum(n1) OVER w AS BIGINT) AS cum1,
                    CAST(sum(n2) OVER w AS BIGINT) AS cum2
                  FROM sc
                  WINDOW w AS (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (SELECT CAST(sum(n1) AS BIGINT) AS t1,
                      CAST(sum(n2) AS BIGINT) AS t2 FROM sc),
         m AS (SELECT CAST(max(abs(CAST(cum1 AS HUGEINT) * t.t2 -
                        CAST(cum2 AS HUGEINT) * t.t1)) AS HUGEINT) AS maxdiff,
                      CAST(max(t.t1) AS BIGINT) AS t1,
                      CAST(max(t.t2) AS BIGINT) AS t2
               FROM cumt, t)
         SELECT ${sqlMulDiv("maxdiff", "1000000",
        "CAST(t1 AS HUGEINT) * CAST(t2 AS HUGEINT)")} AS ks_ppm,
                t1 AS n_urgent, t2 AS n_other
         FROM m""",

    "q_eng_mann_whitney" ->
      s"""WITH $scoredSql,
         sc AS (SELECT cents,
                       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(count(*) - sum(CASE WHEN o_orderpriority =
                         '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n2
                FROM scored GROUP BY 1),
         cumt AS (SELECT n1, n2,
                    CAST(sum(n1) OVER w AS BIGINT) AS cum1,
                    CAST(sum(n2) OVER w AS BIGINT) AS cum2
                  FROM sc
                  WINDOW w AS (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         a AS (SELECT
                 CAST(sum(CAST(n1 AS HUGEINT) *
                   (2 * (cum1 - n1 + cum2 - n2) + n1 + n2 + 1))
                   AS HUGEINT) AS r1x2,
                 CAST(sum(n1) AS BIGINT) AS t1,
                 CAST(sum(n2) AS BIGINT) AS t2,
                 CAST(sum(CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2)
                   - (n1 + n2)) AS HUGEINT) AS ties
               FROM cumt),
         b AS (SELECT t1, t2, ties, t1 + t2 AS n,
                 CAST(r1x2 - CAST(t1 AS HUGEINT) * (t1 + 1) AS BIGINT)
                   AS u1x2
               FROM a),
         c AS (SELECT t1, t2, u1x2,
                 CAST(u1x2 - t1 * t2 AS BIGINT) AS adiff,
                 CAST(CAST(t1 AS HUGEINT) * t2 *
                   (CAST(n AS HUGEINT) * (n - 1) * (n + 1) - ties)
                   // (12 * CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
                   AS vfloor
               FROM b)
         SELECT t1 AS n_urgent, t2 AS n_other, u1x2,
                CAST(adiff AS DOUBLE) / (2.0 * sqrt(CAST(vfloor AS DOUBLE)))
                  AS z
         FROM c""",

    "q_eng_cohens_d" ->
      s"""WITH $scoredSql,
         a AS (SELECT
                 CAST(count(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1 END) AS BIGINT) AS n1,
                 CAST(count(CASE WHEN o_orderpriority <> '1-URGENT'
                   THEN 1 END) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN CAST(cents AS HUGEINT) END) AS HUGEINT) AS s1,
                 CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                   THEN CAST(cents AS HUGEINT) END) AS HUGEINT) AS s2,
                 CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN CAST(cents AS HUGEINT) * cents END) AS HUGEINT) AS q1,
                 CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                   THEN CAST(cents AS HUGEINT) * cents END) AS HUGEINT) AS q2
               FROM scored)
         SELECT n1 AS n_urgent, n2 AS n_other,
                (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                          * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                       + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
                          * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                       / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))
                  AS cohens_d
         FROM a""",

    "q_eng_cochran_armitage" ->
      s"""WITH $scoredSql,
         g AS (SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc,
                      CAST(count(*) AS BIGINT) AS n_i,
                      CAST(sum(label) AS BIGINT) AS r_i
               FROM scored GROUP BY 1),
         a AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
                      CAST(sum(r_i) AS BIGINT) AS r,
                      CAST(sum(sc * n_i) AS BIGINT) AS sn,
                      CAST(sum(sc * r_i) AS BIGINT) AS sr,
                      CAST(sum(sc * sc * n_i) AS BIGINT) AS s2n
               FROM g),
         t AS (SELECT n, r,
                      CAST(n AS HUGEINT) * sr - CAST(r AS HUGEINT) * sn AS tt,
                      sn, s2n
               FROM a)
         SELECT n, r,
                CAST(CASE WHEN tt > 0 THEN 1 WHEN tt < 0 THEN -1 ELSE 0 END
                  AS BIGINT) AS trend_sign,
                CAST(CAST(n AS HUGEINT) * tt * tt * 1000000
                  // (CAST(r AS HUGEINT) * (n - r)
                      * (CAST(n AS HUGEINT) * s2n
                         - CAST(sn AS HUGEINT) * sn)) AS BIGINT) AS z2_ppm
         FROM t""",

    "q_eng_cochran_q" ->
      """WITH x AS (
           SELECT DISTINCT o_custkey AS ck,
                  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1995 AND 1997),
         r AS (SELECT ck, CAST(count(*) AS BIGINT) AS ri FROM x GROUP BY 1),
         ct AS (SELECT yr, CAST(count(*) AS BIGINT) AS cj FROM x GROUP BY 1),
         tot AS (SELECT CAST(sum(ri) AS BIGINT) AS nn,
                        CAST(sum(ri * ri) AS BIGINT) AS r2,
                        CAST(count(*) AS BIGINT) AS b
                 FROM r),
         cs AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS c2 FROM ct)
         SELECT b AS n_blocks, nn AS n_flags,
                CAST(2 * (3 * CAST(c2 AS HUGEINT)
                          - CAST(nn AS HUGEINT) * nn) * 1000000
                  // (3 * CAST(nn AS HUGEINT) - r2) AS BIGINT) AS q_ppm
         FROM tot CROSS JOIN cs""",

    "q_eng_calibration" ->
      s"""WITH $scoredSql,
         rk AS (SELECT label,
                       CAST(row_number() OVER (ORDER BY cents DESC, o_orderkey)
                         AS BIGINT) AS rk
                FROM scored),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
                      CAST(sum(label) AS BIGINT) AS pos_tot FROM scored),
         b AS (SELECT (rk - 1) * 10 // t.n_tot AS bin, label,
                      t.n_tot AS n_tot, t.pos_tot AS pos_tot
               FROM rk, t)
         SELECT CAST(bin AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_bin,
                CAST(sum(label) AS BIGINT) AS pos_bin,
                ${sqlPpm("sum(label)", "count(*)")} AS pos_rate_ppm,
                ${sqlMulDiv("sum(label) * CAST(max(n_tot) AS HUGEINT)",
        "1000000", "count(*) * CAST(max(pos_tot) AS HUGEINT)")} AS lift_ppm
         FROM b GROUP BY bin ORDER BY bin""",

    "q_eng_brier" ->
      s"""WITH $scoredSql,
         t AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                      CAST(sum(label) AS BIGINT) AS pt FROM scored),
         rk AS (SELECT label,
                       CAST(row_number() OVER (ORDER BY cents DESC, o_orderkey)
                         AS BIGINT) AS rk
                FROM scored),
         r2 AS (SELECT label,
                       (t.nt - rk) * 1000000 // greatest(t.nt - 1, 1) AS p_ppm,
                       (rk - 1) * 10 // t.nt AS bin, t.nt, t.pt
                FROM rk, t),
         b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(label) AS BIGINT) AS pos,
                      CAST(sum(p_ppm) AS BIGINT) AS sp,
                      max(nt) AS nt, max(pt) AS pt
               FROM r2 GROUP BY 1),
         terms AS (SELECT n, pos, nt, pt,
           CAST((CAST(sp - pos * 1000000 AS HUGEINT)
                   * CAST(sp - pos * 1000000 AS HUGEINT)
                 + CAST(pos AS HUGEINT) * CAST(n - pos AS HUGEINT)
                   * 1000000000000)
                // CAST(n AS HUGEINT) AS BIGINT) AS sse,
           CAST((CAST(sp - pos * 1000000 AS HUGEINT)
                   * CAST(sp - pos * 1000000 AS HUGEINT))
                // CAST(n AS HUGEINT) AS BIGINT) AS rel,
           CAST((CAST(pos * nt - pt * n AS HUGEINT)
                   * CAST(pos * nt - pt * n AS HUGEINT) * 1000000000000)
                // (CAST(n AS HUGEINT) * CAST(nt AS HUGEINT)
                   * CAST(nt AS HUGEINT)) AS BIGINT) AS res
           FROM b),
         agg AS (SELECT max(nt) AS n_tot, max(pt) AS pos_tot,
                        CAST(sum(sse) AS BIGINT) AS sse,
                        CAST(sum(rel) AS BIGINT) AS relsum,
                        CAST(sum(res) AS BIGINT) AS ressum
                 FROM terms),
         fin AS (SELECT n_tot, pos_tot,
                        CAST(CAST(sse AS HUGEINT) // CAST(n_tot AS HUGEINT)
                          AS BIGINT) AS brier_ppm2,
                        CAST(CAST(relsum AS HUGEINT) // CAST(n_tot AS HUGEINT)
                          AS BIGINT) AS rel_ppm2,
                        CAST(CAST(ressum AS HUGEINT) // CAST(n_tot AS HUGEINT)
                          AS BIGINT) AS res_ppm2,
                        CAST(CAST(pos_tot AS HUGEINT)
                               * CAST(n_tot - pos_tot AS HUGEINT)
                               * 1000000000000
                             // (CAST(n_tot AS HUGEINT)
                                * CAST(n_tot AS HUGEINT)) AS BIGINT)
                          AS unc_ppm2
                 FROM agg)
         SELECT n_tot, pos_tot, brier_ppm2, rel_ppm2, res_ppm2, unc_ppm2,
                brier_ppm2 - (rel_ppm2 - res_ppm2 + unc_ppm2)
                  AS identity_gap_ppm2
         FROM fin""",

    "q_eng_target_encode" ->
      s"""WITH $scoredSql,
         oc AS (SELECT c_nationkey, label FROM scored s
                JOIN customer c ON s.o_custkey = c.c_custkey),
         bl AS (SELECT c_nationkey, label, CAST(count(*) AS BIGINT) AS n_rows
                FROM oc GROUP BY 1, 2),
         st AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(label) AS BIGINT) AS pos
                FROM oc GROUP BY 1)
         SELECT n_name, label, n_rows,
                ${sqlPpm("pos - label", "n - 1")} AS enc_ppm
         FROM bl JOIN st ON bl.c_nationkey = st.nk
         JOIN nation ON bl.c_nationkey = n_nationkey
         WHERE n > 1
         ORDER BY n_name, label""",

    "q_eng_kappa" ->
      s"""WITH $scoredSql,
         c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN o_orderpriority IN
                        ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                        AS BIGINT) AS a1,
                      CAST(sum(label) AS BIGINT) AS b1,
                      CAST(sum(CASE WHEN o_orderpriority IN
                        ('1-URGENT', '2-HIGH') THEN label ELSE 0 END)
                        AS BIGINT) AS n11
               FROM scored)
         SELECT ${sqlMulDivSigned(
        "CAST(n AS HUGEINT) * (n - a1 - b1 + 2 * n11) - " +
          "(CAST(a1 AS HUGEINT) * b1 + CAST(n - a1 AS HUGEINT) * (n - b1))",
        "1000000",
        "CAST(n AS HUGEINT) * n - " +
          "(CAST(a1 AS HUGEINT) * b1 + CAST(n - a1 AS HUGEINT) * (n - b1))")}
           AS kappa_ppm,
                n, a1, b1, n11
         FROM c""",

    // mirrors the two-step truncating division verbatim (HUGEINT `//` is
    // floor division; operands non-negative here)
    "q_eng_fdr_bh" ->
      s"""WITH $scoredSql,
         oc AS (SELECT c_nationkey, label FROM scored s
                JOIN customer c ON s.o_custkey = c.c_custkey),
         bn AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(label) AS BIGINT) AS pos
                FROM oc GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
                      CAST(sum(pos) AS BIGINT) AS pos_tot FROM bn),
         pv AS (SELECT n_name,
                       abs(CAST(pos AS HUGEINT) * t.n_tot
                           - CAST(n AS HUGEINT) * t.pos_tot) AS dev,
                       CAST(n AS HUGEINT) * t.pos_tot * (t.n_tot - t.pos_tot)
                         AS varnum
                FROM bn CROSS JOIN t
                JOIN nation ON bn.c_nationkey = n_nationkey),
         pp AS (SELECT n_name,
                       CASE WHEN dev = 0 THEN 1000000
                            WHEN varnum // dev >= dev THEN 1000000
                            ELSE CAST((varnum // dev) * 1000000 // dev
                                      AS BIGINT) END AS p_ub_ppm
                FROM pv),
         rk AS (SELECT n_name, p_ub_ppm,
                       CAST(row_number() OVER (ORDER BY p_ub_ppm, n_name)
                         AS BIGINT) AS rk,
                       CAST(count(*) OVER () AS BIGINT) AS m
                FROM pp),
         km AS (SELECT max(CASE WHEN p_ub_ppm * m <= rk * 50000
                                THEN rk END) AS kmax FROM rk)
         SELECT n_name, p_ub_ppm, rk,
                CAST(CASE WHEN rk <= coalesce(km.kmax, 0) THEN 1 ELSE 0 END
                  AS BIGINT) AS rejected
         FROM rk, km ORDER BY rk""",

    // BY: same chain as BH with the exact integer harmonic factor in the
    // step-up comparison (list comprehension over the bounded family)
    "q_eng_fdr_by" ->
      s"""WITH $scoredSql,
         oc AS (SELECT c_nationkey, label FROM scored s
                JOIN customer c ON s.o_custkey = c.c_custkey),
         bn AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(label) AS BIGINT) AS pos
                FROM oc GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
                      CAST(sum(pos) AS BIGINT) AS pos_tot FROM bn),
         pv AS (SELECT n_name,
                       abs(CAST(pos AS HUGEINT) * t.n_tot
                           - CAST(n AS HUGEINT) * t.pos_tot) AS dev,
                       CAST(n AS HUGEINT) * t.pos_tot * (t.n_tot - t.pos_tot)
                         AS varnum
                FROM bn CROSS JOIN t
                JOIN nation ON bn.c_nationkey = n_nationkey),
         pp AS (SELECT n_name,
                       CASE WHEN dev = 0 THEN 1000000
                            WHEN varnum // dev >= dev THEN 1000000
                            ELSE CAST((varnum // dev) * 1000000 // dev
                                      AS BIGINT) END AS p_ub_ppm
                FROM pv),
         rk AS (SELECT n_name, p_ub_ppm,
                       CAST(row_number() OVER (ORDER BY p_ub_ppm, n_name)
                         AS BIGINT) AS rk,
                       CAST(count(*) OVER () AS BIGINT) AS m
                FROM pp),
         hm AS (SELECT CAST(list_sum(
                  [1000000 // i for i in range(1, m + 1)]) AS BIGINT) AS h,
                       n_name, p_ub_ppm, rk, m
                FROM rk),
         km AS (SELECT max(CASE WHEN p_ub_ppm * m * h <=
                                     rk * 50000 * 1000000
                                THEN rk END) AS kmax FROM hm)
         SELECT n_name, p_ub_ppm, rk,
                CAST(CASE WHEN rk <= coalesce(km.kmax, 0) THEN 1 ELSE 0 END
                  AS BIGINT) AS rejected
         FROM hm, km ORDER BY rk""",

    "q_eng_mcnemar" ->
      s"""WITH $scoredSql,
         c AS (SELECT
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN o_orderpriority NOT IN
                               ('1-URGENT', '2-HIGH')
                               AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
               FROM scored)
         SELECT b, c,
                CASE WHEN b + c = 0 THEN 0
                     ELSE ${sqlMulDiv(
        "CAST(b - c AS HUGEINT) * (b - c)", "1000000", "b + c")}
                END AS chi2_ppm
         FROM c""",

    // symmetric two-step ρ² division mirrored verbatim (all division
    // operands non-negative → HUGEINT // floor == the Spark floor)
    "q_eng_spearman" ->
      s"""WITH $scoredSql,
         rws AS (SELECT cents, nlines FROM scored s
                 JOIN (SELECT l_orderkey,
                              CAST(count(*) AS BIGINT) AS nlines
                       FROM lineitem GROUP BY 1) l
                   ON s.o_orderkey = l.l_orderkey),
         xd AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt
                FROM rws GROUP BY 1),
         xr AS (SELECT cents AS xv,
                       CAST(sum(cnt) OVER (ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         * 2 - cnt + 1 AS BIGINT) AS mx2
                FROM xd),
         yd AS (SELECT nlines, CAST(count(*) AS BIGINT) AS cnt
                FROM rws GROUP BY 1),
         yr AS (SELECT nlines AS yv,
                       CAST(sum(cnt) OVER (ORDER BY nlines
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         * 2 - cnt + 1 AS BIGINT) AS my2
                FROM yd),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rws),
         cent AS (SELECT t.n, mx2 - t.n - 1 AS cx, my2 - t.n - 1 AS cy
                  FROM rws JOIN xr ON rws.cents = xr.xv
                  JOIN yr ON rws.nlines = yr.yv
                  CROSS JOIN t),
         mom AS (SELECT n,
                        CAST(sum(CAST(cx AS HUGEINT) * cy) AS HUGEINT) AS num,
                        CAST(sum(CAST(cx AS HUGEINT) * cx) AS HUGEINT) AS dx,
                        CAST(sum(CAST(cy AS HUGEINT) * cy) AS HUGEINT) AS dy
                 FROM cent GROUP BY 1)
         SELECT n,
                CASE WHEN dx <= 0 OR dy <= 0 THEN 0
                     ELSE CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
                       ((abs(num) * 1000000 // dx) *
                        (abs(num) * 1000000 // dy) // 1000000) AS BIGINT)
                END AS rho2_sign_ppm
         FROM mom""",

    "q_eng_conformal" ->
      s"""WITH $scoredSql,
         cal AS (SELECT o_orderpriority AS g, cents FROM scored
                 WHERE o_orderkey % 2 = 1),
         tst AS (SELECT o_orderpriority AS g, cents FROM scored
                 WHERE o_orderkey % 2 = 0),
         dist AS (SELECT g, cents, CAST(count(*) AS BIGINT) AS cnt
                  FROM cal GROUP BY 1, 2),
         cum AS (SELECT g, cents,
                        CAST(sum(cnt) OVER (PARTITION BY g ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum
                 FROM dist),
         gk AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_cal,
                       least(CAST(sum(cnt) AS BIGINT),
                             (CAST(sum(cnt) AS BIGINT) * 9 + 18) // 10) AS k
                FROM dist GROUP BY 1),
         thr AS (SELECT cum.g, min(cents) AS threshold_cents
                 FROM cum JOIN gk USING (g)
                 WHERE cum.cum >= gk.k GROUP BY 1),
         cov AS (SELECT t.g, CAST(count(*) AS BIGINT) AS n_test,
                        CAST(sum(CASE WHEN t.cents <= thr.threshold_cents
                          THEN 1 ELSE 0 END) AS BIGINT) AS covered
                 FROM tst t JOIN thr ON t.g = thr.g GROUP BY 1)
         SELECT gk.g AS priority, gk.n_cal, CAST(gk.k AS BIGINT) AS k,
                thr.threshold_cents, cov.n_test, cov.covered,
                ${sqlPpm("cov.covered", "cov.n_test")} AS coverage_ppm
         FROM gk JOIN thr USING (g) JOIN cov ON cov.g = gk.g
         ORDER BY priority""",

    // minimax over the SAME ppm-truncated pooled rates (HUGEINT `//` =
    // floor on the non-negative operands here)
    "q_eng_isotonic" ->
      s"""WITH $scoredSql,
         rk AS (SELECT label,
                       CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                         AS BIGINT) AS rk
                FROM scored),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM scored),
         b AS (SELECT (rk - 1) * 20 // t.n_tot AS bin, label FROM rk, t),
         bins AS (SELECT CAST(bin AS BIGINT) AS bin,
                         CAST(count(*) AS BIGINT) AS n_bin,
                         CAST(sum(label) AS BIGINT) AS pos_bin
                  FROM b GROUP BY 1),
         cum AS (SELECT bin, n_bin, pos_bin,
                        CAST(sum(n_bin) OVER w AS BIGINT) AS cn,
                        CAST(sum(pos_bin) OVER w AS BIGINT) AS cp
                 FROM bins
                 WINDOW w AS (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         ivl AS (SELECT lo.bin AS j, hi.bin AS k2,
                        ${sqlPpm("hi.cp - (lo.cp - lo.pos_bin)",
        "hi.cn - (lo.cn - lo.n_bin)")} AS a_ppm
                 FROM cum lo JOIN cum hi ON lo.bin <= hi.bin),
         mn AS (SELECT bins.bin, ivl.j, min(a_ppm) AS mn
                FROM bins JOIN ivl
                  ON ivl.j <= bins.bin AND bins.bin <= ivl.k2
                GROUP BY 1, 2),
         iso AS (SELECT bin, CAST(max(mn) AS BIGINT) AS iso_ppm
                 FROM mn GROUP BY 1)
         SELECT bins.bin, n_bin, pos_bin,
                ${sqlPpm("pos_bin", "n_bin")} AS raw_ppm, iso_ppm
         FROM bins JOIN iso USING (bin) ORDER BY bin""",

    // same fixed micro-nat step constants; single-partition running sum is
    // the oracle-side form only
    "q_eng_sprt" ->
      s"""WITH $scoredSql,
         st AS (SELECT o_orderkey,
                       CASE WHEN label = 1 THEN 154150 ELSE -287682 END AS llr
                FROM scored),
         cum AS (SELECT o_orderkey,
                        CAST(row_number() OVER (ORDER BY o_orderkey)
                          AS BIGINT) AS rnk,
                        CAST(sum(llr) OVER (ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum_llr
                 FROM st),
         x AS (SELECT CAST(min(rnk) AS BIGINT) AS n_obs FROM cum
               WHERE cum_llr >= 2944438 OR cum_llr <= -2944438)
         SELECT x.n_obs, cum.cum_llr AS llr_micro,
                CASE WHEN cum.cum_llr >= 2944438 THEN 'accept_h1'
                     ELSE 'accept_h0' END AS decision
         FROM cum JOIN x ON cum.rnk = x.n_obs"""
  )
}
