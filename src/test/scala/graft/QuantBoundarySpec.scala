package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Cross-engine quantization-boundary audit (round-3 verdict): for every
  * float→integer `floor(x·10⁶ + 0.5)` site that feeds the driver's
  * DuckDB-compare gate, assert no fixture value lands near a floor
  * boundary, so a driver-side engine build (different libm `ln`, FMA
  * contraction, evaluation-order changes) can never flip a quantized
  * integer.
  *
  * Thresholds by drift class:
  *   - raw-element sites (PQ micro-quantization, k-means centroid sums):
  *     two basic IEEE ops on the raw double — worst realistic divergence
  *     is one FMA-contracted ulp, ~1e-9 at 10⁶ scale → require > 1e-7;
  *   - transcendental sites (BM25 idf, unigram surprisal): a different
  *     libm `ln` drifts a few ulps, ~1e-8 at 10⁶–10⁷ scale → require
  *     > 1e-4 (the distinct df/count input sets are tiny, measured
  *     margins ≥ 4e-3 on every fixture).
  *
  * Audited on sf0.001 and sf0.01 — the driver gate runs sf0.01. */
class QuantBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val gateSfs = Seq(sf, "/root/testdata/sf0.01")

  /** Min distance of (x·10⁶ + 0.5) to the nearest integer. */
  private def minBoundaryDist(df: DataFrame, x: Column): Double = {
    val v = x * lit(1000000.0) + lit(0.5)
    val frac = v - floor(v)
    df.select(least(frac, lit(1.0) - frac).as("d"))
      .agg(min(col("d"))).as[Double].head()
  }

  test("embedding elements clear the micro-quantization boundary (PQ, k-means)") {
    for (dir <- gateSfs) {
      val elems = Tables.embeddings(spark, dir)
        .select(explode(col("embedding").cast("array<double>")).as("x"))
      val d = minBoundaryDist(elems, col("x"))
      assert(d > 1e-7, s"$dir: embedding element within $d of a floor boundary")
    }
  }

  test("LSH pair cosines clear the micro-quantization boundary (SemDeDup keep)") {
    for (dir <- gateSfs) {
      // radius 2: superset of the radius-1 production pair set, so this
      // audits both q_dedup_semdedup_keep's and q_dedup_semdedup_ann's
      // centrality quantization sites in one pass
      val pairs = graft.similarity.Similarity.signLshPairs(
        Tables.embeddings(spark, dir), 42L, 16, 8, 1024, probeRadius = 2)
      val d = minBoundaryDist(pairs, col("cos"))
      assert(d > 1e-7, s"$dir: pair cosine within $d of a floor boundary")
    }
  }

  test("Wilson CI bounds clear the micro-quantization boundary (sampled recall)") {
    // q_dedup_ann_recall_sampled quantizes the 95% Wilson interval ends:
    // raw IEEE ops plus one correctly-rounded sqrt (no libm), so the
    // 1e-7 raw-site threshold applies. Inputs are the per-band integer
    // (n_exact, n_found) pairs — replicate the query's exact tree over
    // its own output and audit both ends.
    for (dir <- gateSfs) {
      val g = SparkEntry.queries("q_dedup_ann_recall_sampled")(spark, dir)
        .select(col("n_exact"), col("n_found"))
      val z = lit(1.96)
      val zz = z * z
      val nD = col("n_exact").cast("double")
      val p = col("n_found").cast("double") / nD
      val den = lit(1.0) + zz / nD
      val ctr = (p + zz / (lit(2.0) * nD)) / den
      val half = (z * sqrt((p * (lit(1.0) - p) / nD) +
        zz / (lit(4.0) * (nD * nD)))) / den
      val dLo = minBoundaryDist(g, ctr - half)
      val dHi = minBoundaryDist(g, ctr + half)
      assert(dLo > 1e-7 && dHi > 1e-7,
        s"$dir: Wilson bound within ($dLo, $dHi) of a floor boundary")
    }
  }

  test("BM25 idf values clear the micro-quantization boundary") {
    for (dir <- gateSfs) {
      val docs = Tables.documents(spark, dir)
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val nDocs = docs.count()
      val dfs = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .select("df").distinct()
      val idf = log((lit(nDocs) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val d = minBoundaryDist(dfs, idf)
      assert(d > 1e-4, s"$dir: idf value within $d of a floor boundary")
    }
  }

  test("TF-IDF idf values clear the micro-quantization boundary") {
    for (dir <- gateSfs) {
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count()
      val dfs = docs
        .select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .select("df").distinct()
      val idf = log((lit(nDocs) + lit(1.0)) / (col("df") + lit(1.0)))
      val d = minBoundaryDist(dfs, idf)
      assert(d > 1e-4, s"$dir: tfidf idf value within $d of a floor boundary")
    }
  }

  test("PMI ratio ln values clear the micro-quantization boundary") {
    for (dir <- gateSfs) {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("cx"))
      val n = toks.count()
      val led = toks.withColumn("w2", lead(col("tok"), 1).over(w))
        .where(col("w2").isNotNull)
      val t = led.count()
      val ratios = led.select(col("tok").as("w1"), col("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
        .where(col("cxy") >= 5)
        .join(uni.select(col("tok").as("w1"), col("cx").as("c1")), "w1")
        .join(uni.select(col("tok").as("w2"), col("cx").as("c2")), "w2")
        .select(((col("cxy").cast("double") * n * n) /
          (lit(t.toDouble) * col("c1") * col("c2"))).as("r"))
        .distinct()
      val d = minBoundaryDist(ratios, log(col("r")))
      assert(d > 1e-5, s"$dir: PMI value within $d of a floor boundary")
    }
  }

  test("entropy ln(dl/c) values clear the micro-quantization boundary") {
    for (dir <- gateSfs) {
      val cnt = Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val dl = cnt.groupBy("doc_id").agg(sum("c").as("dl"))
      val ratios = cnt.join(dl, "doc_id")
        .select(col("dl").cast("double").as("dl"), col("c").cast("double").as("c"))
        .select((col("dl") / col("c")).as("r")).distinct()
      val d = minBoundaryDist(ratios, log(col("r")))
      // larger distinct input set than the df-style sites → 1e-5 floor
      // (still 1000× above worst-case libm ln drift at 10⁶ scale)
      assert(d > 1e-5, s"$dir: entropy term within $d of a floor boundary")
    }
  }

  test("unigram surprisal values clear the micro-quantization boundary") {
    for (dir <- gateSfs) {
      val toks = Tables.documents(spark, dir)
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val total = toks.count()
      val cnts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .select("cnt").distinct()
      val sur = -log(col("cnt").cast("double") / lit(total).cast("double"))
      val d = minBoundaryDist(cnts, sur)
      assert(d > 1e-4, s"$dir: surprisal value within $d of a floor boundary")
    }
  }

  test("DSIR log-ratio values clear the micro boundary") {
    // replicate q_text_dsir_*'s lr site over its own per-bucket inputs
    // (≤ 4096 rows): ln((ct+1)/(tt+B)) − ln((cr+1)/(tr+B)). Domain is
    // bucket-sized, so the 1e-4 transcendental threshold applies.
    for (dir <- gateSfs) {
      val docs = Tables.documents(spark, dir)
      val feat = graft.text.Dsir.features(docs, col("doc_id"), col("text"),
        buckets = 4096)
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").as("is_tgt")), "doc_id")
      val raw = feat.groupBy("bucket").agg(sum("cnt").as("cr"))
      val tgt = feat.where(col("is_tgt"))
        .groupBy("bucket").agg(sum("cnt").as("ct"))
      val tot = feat.agg(sum(col("cnt")).as("tr"),
        sum(when(col("is_tgt"), col("cnt")).otherwise(0L)).as("tt"))
      val x = log((col("ct") + 1L).cast("double") /
                  (col("tt") + 4096L).cast("double")) -
              log((col("cr") + 1L).cast("double") /
                  (col("tr") + 4096L).cast("double"))
      val lrIn = raw.join(tgt, Seq("bucket"), "left").na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(tot))
      val d = minBoundaryDist(lrIn, x)
      assert(d > 1e-4, s"$dir: DSIR log-ratio within $d of a floor boundary")
    }
  }

  test("DSIR Gumbel keys clear the micro boundary") {
    // q_text_dsir_gumbel's −ln(−ln u) site over the fixture doc_ids
    // (u = (md5-13-hex + 1)/(2^52+1)). Unlike the other transcendental
    // sites this domain is DOC-sized, not vocabulary-sized, so the
    // expected min boundary distance scales as 0.5/n (≈1e-3 at the
    // 500-doc gate SFs, measured 2.1e-5 — md5 uniforms, not a grid) and
    // the 1e-4 bar is statistically unreachable at larger n. The drift
    // this audit guards against is two nested libm lns on a |x| ≤ ~36
    // value: ≤ ~4e-8 at 1e6 scale even at the u→1 extreme, so 1e-6
    // keeps a ≥ 25× margin while staying ~10× below the expected min
    // at the 50k-doc scale fixtures (which the sf1/sf1mut gates cover
    // empirically).
    for (dir <- gateSfs) {
      val u = (conv(substring(md5(concat(lit("gumbel:"),
        col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long") + 1L)
        .cast("double") / lit(4503599627370497.0)
      val d = minBoundaryDist(Tables.documents(spark, dir)
        .select(col("doc_id")), -log(-log(u)))
      assert(d > 1e-6, s"$dir: Gumbel key within $d of a floor boundary")
    }
  }

  test("nDCG discount values clear the micro boundary") {
    // q_text_retrieval_eval's ln2/ln(rank+1) site: a FIXED 10-value
    // domain (rank ≤ 10) independent of fixture scale. Ranks 1 and 3
    // are exact halves (x·1e6 + 0.5 lands mid-interval, distance 0.5);
    // the rest must clear the transcendental threshold.
    val rs = spark.range(1, 11).toDF("r")
      .select((log(lit(2.0)) / log((col("r") + 1L).cast("double"))).as("x"))
    val d = minBoundaryDist(rs, col("x"))
    assert(d > 1e-4, s"nDCG discount within $d of a floor boundary")
  }

  test("image-entropy ln(16/c) values clear the micro boundary") {
    // fixed 16-value input set, independent of fixture scale
    val cs = spark.range(1, 17).toDF("c")
      .select((lit(16.0) / col("c").cast("double")).as("r"))
    val d = minBoundaryDist(cs, log(col("r")))
    assert(d > 1e-4, s"ln(16/c) within $d of a floor boundary")
  }

  test("Zipf ln(rank) and ln(freq) values clear the micro boundary") {
    // q_text_zipf_slope quantizes ln at the leaf per distinct rank and
    // per distinct term frequency — both small-integer domains
    for (dir <- gateSfs) {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val freqs = toks.groupBy("source", "tok").agg(count(lit(1)).as("f"))
      val nMax = freqs.groupBy("source").agg(count(lit(1)).as("n"))
        .agg(max("n")).as[Long].head()
      val ranks = spark.range(1, nMax + 1).toDF("v")
        .select(col("v").cast("double").as("x"))
      val fs = freqs.select(col("f").cast("double").as("x")).distinct()
      val d = minBoundaryDist(ranks.union(fs), log(col("x")))
      assert(d > 1e-4, s"$dir: zipf ln value within $d of a floor boundary")
    }
  }

  test("PSI drift ln ratios clear the micro boundary") {
    // q_eng_psi_drift quantizes ln of the smoothed share ratio per price
    // bin — a ≤ #bins input set per fixture
    for (dir <- gateSfs) {
      val o = Tables.orders(spark, dir).select(
        floor(col("o_totalprice") / 50000.0).cast("long").as("bin"),
        (to_date(col("o_orderdate")) < to_date(lit("1998-01-01"))).as("isA"))
      val cells = o.groupBy("bin").agg(
        count(when(col("isA"), 1)).as("na"),
        count(when(!col("isA"), 1)).as("nb"))
      val tots = cells.agg(sum("na").as("ta"), sum("nb").as("tb"),
        count(lit(1)).as("nbins"))
      val ratios = cells.crossJoin(tots).select(
        (((col("na") + 1) * (col("tb") + col("nbins"))).cast("double") /
          ((col("nb") + 1) * (col("ta") + col("nbins"))).cast("double")).as("r"))
      val d = minBoundaryDist(ratios, log(col("r")))
      assert(d > 1e-4, s"$dir: psi ln ratio within $d of a floor boundary")
    }
  }

  test("sub-corpus pair cosines clear the micro boundary (label separation)") {
    // q_sim_label_separation quantizes every all-pairs cosine on the
    // 200-vector sub-corpus — dot/norm/divide are exact-rounded IEEE
    // ops, so the raw-element threshold applies
    for (dir <- gateSfs) {
      val sub = Tables.embeddings(spark, dir).where(col("vec_id") < 200)
      val pairs = graft.similarity.Similarity.bruteForceTopK(sub, sub, 199)
        .where(col("qid") < col("nid"))
      val d = minBoundaryDist(pairs, col("cos"))
      assert(d > 1e-7, s"$dir: pair cosine within $d of a floor boundary")
    }
  }

  test("negative-sampling count^0.75 values clear the micro boundary") {
    // q_text_neg_sampling quantizes pow(c, 0.75) per distinct unigram
    // count — pow is not correctly rounded across libms, so the
    // transcendental threshold applies
    for (dir <- gateSfs) {
      val cnts = Tables.documents(spark, dir)
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .select(col("c").cast("double").as("c")).distinct()
      val d = minBoundaryDist(cnts, pow(col("c"), 0.75))
      assert(d > 1e-4, s"$dir: count^0.75 within $d of a floor boundary")
    }
  }

  test("temperature-mix sqrt(token count) values clear the micro boundary") {
    // sqrt is IEEE correctly rounded (identical across engines), so the
    // only drift surface is the floor(·1e6+0.5) site itself — raw-element
    // threshold applies (one op on an exact integer input)
    for (dir <- gateSfs) {
      val cnts = Tables.documents(spark, dir)
        .groupBy(col("source"))
        .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n"))
        .select(col("n").cast("double").as("n")).distinct()
      val d = minBoundaryDist(cnts, sqrt(col("n")))
      assert(d > 1e-7, s"$dir: sqrt(count) within $d of a floor boundary")
    }
  }

  test("HLL estimator values clear the micro boundary (hll_card, hll_by_type)") {
    // raw_est = alpha·m²·2^49/S is a ~6-op IEEE chain over an exact
    // integer S (no transcendental) → raw-element class, but the value
    // reaches ~1.5e4 at sf1 (1.5e10 in micro), so allow the accumulated
    // few-ulp drift: require > 1e-4 absolute on the micro scale.
    // lc_est multiplies a libm ln → transcendental class, same bound.
    val sScaled: Seq[Long] = for {
      dir <- gateSfs
      row <- (SparkEntry.queries("q_eng_hll_card")(spark, dir).collect() ++
        SparkEntry.queries("q_eng_hll_by_type")(spark, dir).collect())
    } yield row.getLong(row.fieldIndex("s_scaled"))
    for (s <- sScaled) {
      val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
        562949953421312.0 / s.toDouble * 1000000.0 + 0.5
      val fr = raw - math.floor(raw)
      assert(math.min(fr, 1.0 - fr) > 1e-4,
        s"raw_est for s_scaled=$s within ${math.min(fr, 1.0 - fr)} of a boundary")
    }
    // Only q_eng_hll_card emits lc_est_micro — by_type rows never surface
    // a linear-counting estimate, so auditing their v_zero would guard a
    // value that is not part of any output (and could fail spuriously).
    val vZeros: Seq[Long] = for {
      dir <- gateSfs
      row <- SparkEntry.queries("q_eng_hll_card")(spark, dir).collect()
      if !row.isNullAt(row.fieldIndex("v_zero")) &&
        row.getLong(row.fieldIndex("v_zero")) > 0
    } yield row.getLong(row.fieldIndex("v_zero"))
    for (v <- vZeros) {
      val lc = 256.0 * math.log(256.0 / v.toDouble) * 1000000.0 + 0.5
      val fr = lc - math.floor(lc)
      assert(math.min(fr, 1.0 - fr) > 1e-4,
        s"lc_est for v_zero=$v within ${math.min(fr, 1.0 - fr)} of a boundary")
    }
  }
}
