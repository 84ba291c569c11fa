package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 wave 5 statistics (Mann-Whitney U,
  * Brown–Forsythe Levene, Good-Turing, Cramér's V, k-anonymity,
  * l-diversity), independent of the DuckDB gate. Every statistic is
  * recomputed driver-side at sf0.001 with BigInt brute force, including
  * every floor/truncation point the engine formulation commits to, so the
  * gate's shared-formula risk (both engines wrong the same way) is
  * covered by a third, structurally different computation.
  */
class Round8Wave5SemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** BigInt brute-force Mann-Whitney over (value, inArmA) pairs —
    * handles ties via 2× average ranks, mirrors every floor. */
  private def bruteMw(pairs: Seq[(Long, Boolean)])
      : (Long, Long, Long, Double) = {
    val t1 = BigInt(pairs.count(_._2))
    val t2 = BigInt(pairs.size) - t1
    val n = t1 + t2
    var cumBefore = BigInt(0)
    var r1x2 = BigInt(0)
    var ties = BigInt(0)
    for ((_, g) <- pairs.groupBy(_._1).toSeq.sortBy(_._1)) {
      val t = BigInt(g.size)
      val n1 = BigInt(g.count(_._2))
      r1x2 += n1 * (2 * cumBefore + t + 1)
      ties += t * t * t - t
      cumBefore += t
    }
    val u1x2 = r1x2 - t1 * (t1 + 1)
    val adiff = u1x2 - t1 * t2
    val vfloor = t1 * t2 * (n * (n - 1) * (n + 1) - ties) / (12 * n * (n - 1))
    val z = adiff.toDouble / (2.0 * math.sqrt(vfloor.toDouble))
    (t1.toLong, t2.toLong, u1x2.toLong, z)
  }

  /** (cents, urgent) per order — brute-force base for Mann-Whitney. */
  private lazy val arms: Seq[(Long, Boolean)] =
    Tables.orders(spark, sf)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
      .collect().toSeq
      .map(r => (lng(r, 0), r.getBoolean(1)))

  test("q_eng_mann_whitney equals the brute-force tie-corrected rank sum") {
    val want = bruteMw(arms)
    val row = SparkEntry.queries("q_eng_mann_whitney")(spark, sf)
      .collect().head
    val got = (row.getLong(row.fieldIndex("n_urgent")),
      row.getLong(row.fieldIndex("n_other")),
      row.getLong(row.fieldIndex("u1x2")),
      row.getDouble(row.fieldIndex("z")))
    assert(got == want)
    assert(want._1 > 0 && want._2 > 0, "fixture should populate both arms")
  }

  test("mannWhitneyU handles heavy ties (synthetic — fixture cents are " +
    "near-unique, so the tie-correction terms are pinned here)") {
    // arm A: 1, 2, 2, 3, 5  |  arm B: 2, 2, 4, 4, 5, 5 — multi-way ties
    // within and across arms, including a 4-way tie at value 2
    val pairs = Seq((1L, true), (2L, true), (2L, true), (3L, true),
      (5L, true), (2L, false), (2L, false), (4L, false), (4L, false),
      (5L, false), (5L, false))
    val df = pairs.toDF("v", "a")
    val row = EvalQueries.mannWhitneyU(df, col("v"), col("a"))
      .collect().head
    val want = bruteMw(pairs)
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3)) == want)
    // cross-check a hand computation of 2·R_A: sorted pool
    // 1 | 2,2,2,2 | 3 | 4,4 | 5,5,5 → 2×avg ranks 2, 7, 12, 15, 20;
    // A holds 1, two 2s, the 3, one 5 → 2R_A = 2 + 7 + 7 + 12 + 20 = 48;
    // 2U_A = 48 − 5·6 = 18
    assert(row.getLong(2) == 18L)
  }

  test("q_eng_levene_bf equals the brute-force Brown-Forsythe W") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
      .collect().toSeq
      .map(r => (r.getString(0), lng(r, 1), lng(r, 2)))
    val byG = rows.groupBy(_._1)
    val zs = byG.toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      val m = sorted.size
      val med2 = sorted((m + 1) / 2 - 1) + sorted(m / 2 + 1 - 1)
      g.map(t => (t._1, BigInt((2 * t._3 - med2).abs)))
    }
    val gStats = zs.groupBy(_._1).map { case (_, g) =>
      (BigInt(g.size), g.map(_._2).sum, g.map(t => t._2 * t._2).sum)
    }.toSeq
    val n = gStats.map(_._1).sum
    val k = BigInt(gStats.size)
    val s = gStats.map(_._2).sum
    val q = gStats.map(_._3).sum
    val termsum = gStats.map { case (ng, sg, _) => sg * sg * n / ng }.sum
    // truncation toward zero — the mulDivWideSigned contract
    val num = (termsum - s * s) * (n - k) * 1000000
    val den = (q * n - termsum) * (k - 1)
    val wPpm = (num.abs / den) * num.signum
    val row = SparkEntry.queries("q_eng_levene_bf")(spark, sf).collect().head
    assert((row.getLong(row.fieldIndex("n")), row.getLong(row.fieldIndex("k")),
      row.getLong(row.fieldIndex("w_ppm"))) == ((n.toLong, k.toLong, wPpm.toLong)))
    assert(wPpm > 0, "fixture W should be non-degenerate")
  }

  test("q_eng_good_turing equals the brute-force frequency-of-frequencies") {
    val freq = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("r"))
      .collect().map(r => lng(r, 1))
    val fof = freq.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val nObs = fof.map { case (r, nr) => r * nr }.sum
    val want = (fof.filter(_._1 <= 5).toSeq.map { case (r, nr) =>
      val nNext = fof.getOrElse(r + 1, 0L)
      (r, nr, nNext, (BigInt(r + 1) * nNext * 1000000 / nr).toLong)
    } ++ fof.get(1L).map(n1 =>
      (0L, nObs, n1, (BigInt(n1) * 1000000 / nObs).toLong)))
      .sortBy(_._1)
    val got = SparkEntry.queries("q_eng_good_turing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(want.exists(t => t._1 >= 1 && t._1 <= 5),
      "fixture should have a low-frequency customer tail")
  }

  test("q_eng_cramers_v equals the brute-force floored chi-square total") {
    val cells = Tables.events(spark, sf)
      .select(col("event_type"),
        pmod(datediff(to_date(col("ts")), to_date(lit("1995-01-02")))
          .cast("long"), lit(7L)).as("dow"))
      .collect().toSeq
      .map(r => (r.getString(0), lng(r, 1)))
      .groupBy(identity).map { case (kk, g) => kk -> BigInt(g.size) }
    val rT = cells.groupBy(_._1._1).map { case (et, g) => et -> g.values.sum }
    val cT = cells.groupBy(_._1._2).map { case (dw, g) => dw -> g.values.sum }
    val nTot = cells.values.sum
    val chi2Micro = cells.map { case ((et, dw), o) =>
      val dev = o * nTot - rT(et) * cT(dw)
      dev * dev * 1000000 / (rT(et) * cT(dw) * nTot)
    }.sum
    val minDim = BigInt(math.min(rT.size, cT.size) - 1)
    val v = math.sqrt(chi2Micro.toDouble /
      (1000000.0 * nTot.toDouble * minDim.toDouble))
    val row = SparkEntry.queries("q_eng_cramers_v")(spark, sf).collect().head
    assert((row.getLong(row.fieldIndex("chi2_micro")),
      row.getLong(row.fieldIndex("n")),
      row.getLong(row.fieldIndex("min_dim")),
      row.getDouble(row.fieldIndex("cramers_v"))) ==
      ((chi2Micro.toLong, nTot.toLong, minDim.toLong, v)))
    assert(v > 0 && v < 1, "fixture V should be a real effect size in (0,1)")
  }

  test("q_eng_k_anonymity / q_eng_l_diversity equal brute force") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      .collect().toSeq.map(r => (lng(r, 0), (lng(r, 1), r.getString(2))))
    val ks = cust.groupBy(_._2).map { case (_, g) => g.size.toLong }.toSeq
    val wantK = Seq(2L, 5L, 10L, 25L).map { th =>
      (th, ks.count(_ < th).toLong, ks.filter(_ < th).sum,
        ks.size.toLong, ks.min)
    }
    val gotK = SparkEntry.queries("q_eng_k_anonymity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(gotK == wantK)

    val qiOf = cust.toMap
    val lPerGroup = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority"))
      .collect().toSeq
      .map(r => (qiOf(lng(r, 0)), r.getString(1)))
      .distinct
      .groupBy(_._1).map { case (_, g) => g.size.toLong }
    val wantL = lPerGroup.groupBy(identity)
      .map { case (l, g) => (l, g.size.toLong) }.toSeq.sorted
    val gotL = SparkEntry.queries("q_eng_l_diversity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotL == wantL)
  }
}
