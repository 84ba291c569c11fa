package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 closing wave (FDR, conformal,
  * modularity), independent of the DuckDB gate — both engines share the
  * formulas, so a shared mistake would gate green. Each statistic is
  * recomputed driver-side at sf0.001 with naive BigInt brute force,
  * including every truncation point (the cross-engine contract).
  *
  * The BH step-up additionally gets synthetic mixed-outcome frames driven
  * through [[EvalQueries.bhStepUp]] itself: the fixture is deliberately
  * uniform (null data), so the honest fixture result rejects nothing and
  * would leave the rejection branch unexercised.
  */
class Round8Wave2SemanticsSpec extends SparkSpec {

  /** Fixture key columns ship as INT32 at some SFs — widen via Number. */
  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** (orderkey, priority, cents, label, nationkey) brute-force base. */
  private lazy val scored: Seq[(Long, String, Long, Long, Long)] = {
    val ret = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("lab"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    val nat = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        col("o_custkey"))
      .collect().toSeq
      .map(r => (lng(r, 0), r.getString(1), lng(r, 2),
        ret.getOrElse(lng(r, 0), 0L), nat(lng(r, 3))))
  }

  test("q_eng_fdr_bh equals the brute-force Chebyshev + step-up") {
    val names = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lng(r, 0) -> r.getString(1)).toMap
    val byN = scored.groupBy(_._5).map { case (nk, rows) =>
      (names(nk), BigInt(rows.size), BigInt(rows.map(_._4).sum))
    }.toSeq
    val nTot = byN.map(_._2).sum
    val posTot = byN.map(_._3).sum
    val pv = byN.map { case (name, n, pos) =>
      val dev = (pos * nTot - n * posTot).abs
      val varnum = n * posTot * (nTot - posTot)
      val p =
        if (dev == 0) BigInt(1000000)
        else {
          val q1 = varnum / dev
          if (q1 >= dev) BigInt(1000000) else q1 * 1000000 / dev
        }
      (name, p)
    }.sortBy { case (name, p) => (p, name) }
    val m = BigInt(pv.size)
    val kmax = pv.zipWithIndex
      .collect { case ((_, p), i) if p * m <= BigInt(i + 1) * 50000 => i + 1 }
      .lastOption.getOrElse(0)
    val want = pv.zipWithIndex.map { case ((name, p), i) =>
      (name, p.toLong, (i + 1).toLong, if (i + 1 <= kmax) 1L else 0L)
    }
    val got = SparkEntry.queries("q_eng_fdr_bh")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("bhStepUp rejects the correct prefix on synthetic mixed p-values") {
    import spark.implicits._
    // m = 5, α = 0.05: thresholds i·50000·... — reject iff p·5 ≤ i·50000,
    // i.e. p_(i) ≤ i·10000. ps sorted: 4000, 21000, 90000, 600000, 999999
    // → i=1: 4000·5=20000 ≤ 50000 ✓; i=2: 105000 ≤ 100000 ✗;
    //   i=3: 450000 ≤ 150000 ✗ … kmax = 1, reject exactly the smallest.
    val a = Seq(("a", 90000L), ("b", 4000L), ("c", 600000L), ("d", 21000L),
      ("e", 999999L)).toDF("n_name", "p_ub_ppm")
    val gotA = EvalQueries.bhStepUp(a, 50000L).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(gotA == Seq(("b", 1L), ("d", 0L), ("a", 0L), ("c", 0L), ("e", 0L)))

    // step-up (not step-down): p = (30000, 30000, 30000) with m = 3 —
    // every i has p·3 = 90000 ≤ i·50000 only at i ≥ 2, but kmax = 3
    // rejects ALL THREE including rank 1 (the step-up look-ahead).
    val b = Seq(("x", 30000L), ("y", 30000L), ("z", 30000L))
      .toDF("n_name", "p_ub_ppm")
    val gotB = EvalQueries.bhStepUp(b, 50000L).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(gotB == Seq(("x", 1L), ("y", 1L), ("z", 1L)))

    // nothing rejectable → kmax absent → zero rejections
    val c = Seq(("x", 900000L), ("y", 950000L)).toDF("n_name", "p_ub_ppm")
    assert(EvalQueries.bhStepUp(c, 50000L).collect()
      .forall(_.getLong(3) == 0L))
  }

  test("q_eng_conformal equals the brute-force split-quantile + coverage") {
    val byG = scored.groupBy(_._2)
    val want = byG.toSeq.sortBy(_._1).map { case (g, rows) =>
      val cal = rows.filter(_._1 % 2 == 1).map(_._3).sorted
      val tst = rows.filter(_._1 % 2 == 0).map(_._3)
      val n = cal.size.toLong
      val k = math.min(n, (n * 9 + 18) / 10)
      val thr = cal((k - 1).toInt)
      val cov = tst.count(_ <= thr).toLong
      (g, n, k, thr, tst.size.toLong, cov,
        (BigInt(cov) * 1000000 / tst.size).toLong)
    }
    val got = SparkEntry.queries("q_eng_conformal")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
  }

  test("q_eng_modularity equals the brute-force 3-round propagation + Q") {
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val allPairs: Seq[(Long, Long)] = op.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }
    // NB: .toSeq BEFORE collect — Map.collect over a pair-producing
    // function rebuilds a Map and silently collapses pairs by first element
    val und = allPairs.groupBy(identity).toSeq
      .collect { case (e, os) if os.size >= 2 => e }
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = (und ++ und.map(_.swap) ++ nodes.map(n => (n, n)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      lab = nodes.map(n => n -> adj(n).map(lab).min).toMap
    val m = BigInt(und.size)
    val win = BigInt(und.count(e => lab(e._1) == lab(e._2)))
    val deg = (und ++ und.map(_.swap)).groupBy(_._1).map {
      case (n, es) => n -> BigInt(es.size)
    }
    val sumDc2 = deg.toSeq.groupBy { case (n, _) => lab(n) }
      .map { case (_, ds) => val s = ds.map(_._2).sum; s * s }.sum
    val qPpm = {
      val num = (m * win * 4 - sumDc2) * 1000000
      val den = m * m * 4
      // truncation toward zero (mulDivWideSigned contract)
      num / den // BigInt / truncates toward zero
    }
    val row = SparkEntry.queries("q_eng_modularity")(spark, sf).collect().head
    assert(row.getLong(0) == qPpm.toLong, "modularity_ppm")
    assert(row.getLong(1) == lab.values.toSet.size.toLong, "n_communities")
    assert(row.getLong(2) == m.toLong && row.getLong(3) == win.toLong)
  }
}
