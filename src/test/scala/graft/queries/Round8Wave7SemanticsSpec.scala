package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 wave-7 statistics (k-group / paired /
  * rank-correlation tests, ranking metrics, release-gate audits),
  * independent of the DuckDB gate: each statistic is recomputed
  * driver-side at sf0.001 with naive BigInt/sort brute force — including
  * every truncation point and the exact IEEE evaluation-tree order, which
  * ARE the cross-engine contract.
  */
class Round8Wave7SemanticsSpec extends SparkSpec {

  /** (priority digit, cents, label) per order — the brute-force twin of
    * EvalQueries.scored. */
  private lazy val scoredRows: Seq[(Int, Long, Long)] = {
    val ret = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("lb"))
    Tables.orders(spark, sf)
      .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
      .select(substring(col("o_orderpriority"), 1, 1).cast("int"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"),
        coalesce(col("lb"), lit(0L)), col("o_orderkey"))
      .collect().toSeq
      .sortBy(r => (r.getLong(1), r.getLong(3)))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
  }

  /** Doubled midrank of each distinct cents value (2·avgrank is integral). */
  private lazy val ar2: Map[Long, BigInt] = {
    val vals = scoredRows.map(_._2).sorted
    val t = vals.groupBy(identity).view.mapValues(_.size).toMap
    val distinct = t.keys.toSeq.sorted
    var before = BigInt(0)
    distinct.map { v =>
      val r = (v, 2 * before + t(v) + 1)
      before += t(v)
      r
    }.toMap
  }

  test("q_eng_kruskal_wallis equals the brute-force midrank H") {
    val n = BigInt(scoredRows.size)
    val r2 = (1 to 5).map { g =>
      scoredRows.collect { case (`g`, c, _) => ar2(c) }.sum
    }
    val ng = (1 to 5).map(g => BigInt(scoredRows.count(_._1 == g)))
    val ties = scoredRows.groupBy(_._2).values
      .map(v => { val t = BigInt(v.size); t * t * t - t }).sum
    val sumTerm = (0 until 5).map(i =>
      r2(i).toDouble * r2(i).toDouble / ng(i).toDouble).foldLeft(0.0)(_ + _)
    val h = 3.0 * sumTerm / (n.toDouble * (n + 1).toDouble) -
      3.0 * (n + 1).toDouble
    val c = 1.0 - ties.toDouble / (n.toDouble * n.toDouble * n.toDouble -
      n.toDouble)
    val row = SparkEntry.queries("q_eng_kruskal_wallis")(spark, sf)
      .collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == 5L)
    assert(row.getDouble(2) == h, "h")
    assert(row.getDouble(3) == h / c, "h_tie_corrected")
  }

  test("q_eng_jonckheere equals the brute-force doubled pair count") {
    val n = BigInt(scoredRows.size)
    var u2 = BigInt(0)
    for ((gi, ci, _) <- scoredRows; (gj, cj, _) <- scoredRows if gi < gj)
      u2 += (if (ci < cj) 2 else if (ci == cj) 1 else 0)
    val ng = (1 to 5).map(g => BigInt(scoredRows.count(_._1 == g)))
    val e2 = (n * n - ng.map(x => x * x).sum) / 2
    val v18 = n * n * (2 * n + 3) - ng.map(x => x * x * (2 * x + 3)).sum
    val z = (u2.toDouble - e2.toDouble) / math.sqrt(v18.toDouble / 18.0)
    val row = SparkEntry.queries("q_eng_jonckheere")(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == u2.toLong, "u2")
    assert(row.getLong(2) == e2.toLong, "e2")
    assert(row.getDouble(3) == z, "z")
  }

  test("q_eng_wilcoxon_signed equals the brute-force signed-rank walk") {
    val per = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        year(to_date(col("o_orderdate"))).cast("long").as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      .where(col("yr").isin(1995L, 1996L))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values
      .flatMap { rows =>
        val s95 = rows.collect { case (_, 1995L, c) => c }
        val s96 = rows.collect { case (_, 1996L, c) => c }
        if (s95.nonEmpty && s96.nonEmpty) Some(s96.sum - s95.sum) else None
      }
      .filter(_ != 0L).toSeq
    val t = per.map(math.abs).groupBy(identity).view.mapValues(_.size).toMap
    val distinct = t.keys.toSeq.sorted
    var before = BigInt(0)
    var w2p = BigInt(0)
    for (v <- distinct) {
      val npos = BigInt(per.count(d => math.abs(d) == v && d > 0))
      w2p += npos * (2 * before + t(v) + 1)
      before += t(v)
    }
    val n = BigInt(per.size)
    val ties = t.values.map(x => { val b = BigInt(x); b * b * b - b }).sum
    val e2 = n * (n + 1) / 2
    val v2x12 = n * (n + 1) * (2 * n + 1) * 2 - ties
    val z = (w2p.toDouble - e2.toDouble) / math.sqrt(v2x12.toDouble / 12.0)
    val row = SparkEntry.queries("q_eng_wilcoxon_signed")(spark, sf)
      .collect().head
    assert(row.getLong(0) == n.toLong, "n_pairs")
    assert(row.getLong(1) == w2p.toLong, "w_plus_x2")
    assert(row.getDouble(2) == z, "z")
  }

  test("q_eng_kendall_tau equals the brute-force concordance count") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("y"))
      .collect().toSeq
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var nc = 0L; var nd = 0L
    for (Seq((_, x1, y1), (_, x2, y2)) <- daily.combinations(2).map(_.toSeq)) {
      val s = (x2 - x1).sign * (y2 - y1).sign
      if (s > 0) nc += 1 else if (s < 0) nd += 1
    }
    val n = daily.size.toLong
    val n0 = n * (n - 1) / 2
    def tiePairs(xs: Seq[Long]): Long =
      xs.groupBy(identity).values.map(v => v.size.toLong * (v.size - 1) / 2).sum
    val n1x = tiePairs(daily.map(_._2))
    val n1y = tiePairs(daily.map(_._3))
    val tau = (nc.toDouble - nd.toDouble) /
      math.sqrt((n0 - n1x).toDouble * (n0 - n1y).toDouble)
    val row = SparkEntry.queries("q_eng_kendall_tau")(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == nc && row.getLong(2) == nd)
    assert(row.getLong(3) == n1x && row.getLong(4) == n1y)
    assert(row.getDouble(5) == tau, "tau_b")
  }

  test("q_eng_avg_precision equals the brute-force tie-block AP") {
    val byScore = scoredRows.groupBy(_._2).view
      .mapValues(rs => (BigInt(rs.map(_._3).sum), BigInt(rs.size))).toMap
    val descending = byScore.keys.toSeq.sorted.reverse
    var cumNp = BigInt(0); var cumN = BigInt(0); var s = BigInt(0)
    for (v <- descending) {
      val (np, nAll) = byScore(v)
      cumNp += np; cumN += nAll
      s += np * (cumNp * BigInt(1000000000000L) / cumN)
    }
    val p = BigInt(scoredRows.map(_._3).sum)
    val apMicro = s * 1000000 / (p * BigInt(1000000000000L))
    val row = SparkEntry.queries("q_eng_avg_precision")(spark, sf)
      .collect().head
    assert(row.getLong(0) == p.toLong)
    assert(row.getLong(2) == apMicro.toLong, "ap_micro")
  }

  test("q_eng_mcc_sweep equals the brute-force decile confusion sweep") {
    val n = scoredRows.size.toLong
    val p = scoredRows.map(_._3).sum
    // scoredRows is already sorted by (cents, orderkey) — the rank order
    val decOf = scoredRows.zipWithIndex.map { case ((_, _, lb), i) =>
      (i.toLong * 10 / n, lb)
    }
    val got = SparkEntry.queries("q_eng_mcc_sweep")(spark, sf).collect()
    assert(got.length == 9)
    for (b <- 1L to 9L) {
      val sel = decOf.filter(_._1 >= b)
      val tp = sel.map(_._2).sum
      val pp = sel.size.toLong
      val fp = pp - tp; val fn = p - tp; val tn = n - pp - fn
      val f1 = BigInt(tp) * 2 * 1000000 / BigInt(tp * 2 + fp + fn)
      val mcc = (tp.toDouble * tn.toDouble - fp.toDouble * fn.toDouble) /
        math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
          (tn + fp).toDouble * (tn + fn).toDouble)
      val row = got(b.toInt - 1)
      assert(row.getLong(0) == b)
      assert(row.getLong(1) == tp && row.getLong(2) == fp &&
        row.getLong(3) == fn && row.getLong(4) == tn, s"cut $b counts")
      assert(row.getLong(5) == f1.toLong, s"cut $b f1")
      assert(row.getDouble(6) == mcc, s"cut $b mcc")
    }
  }

  test("q_eng_t_closeness equals the brute-force ordered EMD") {
    val oc = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        substring(col("o_orderpriority"), 1, 1).cast("long"))
      .collect().toSeq
      .map(r => ((r.getAs[Number](0).longValue, r.getString(1)), r.getLong(2)))
    val nTot = BigInt(oc.size)
    val globPrefix = (1L to 4L).map(k => BigInt(oc.count(_._2 <= k)))
    val want = oc.groupBy(_._1).map { case (cls, rows) =>
      val nC = BigInt(rows.size)
      val gaps = (1L to 4L).map { k =>
        (BigInt(rows.count(_._2 <= k)) * nTot -
          globPrefix(k.toInt - 1) * nC).abs
      }
      (cls, nC, gaps.sum * 1000000 / (nC * nTot * 4))
    }.toSeq.sortBy { case ((nk, seg), _, emd) => (-emd, nk, seg) }.take(10)
    val got = SparkEntry.queries("q_eng_t_closeness")(spark, sf).collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getString(1)), r.getLong(2),
        r.getLong(3)))
      .toSeq
    assert(got == want.map { case (c, n, e) => (c, n.toLong, e.toLong) })
  }

  test("q_eng_orphan_audit equals the brute-force set arithmetic") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Seq[Long] =
      df.select(col(c)).collect().toSeq.map(_.getLong(0))
    val li = Tables.lineitem(spark, sf)
    val ok = keys(Tables.orders(spark, sf), "o_orderkey")
    val lk = keys(li, "l_orderkey")
    val orphan = lk.count(!ok.toSet.contains(_)).toLong
    val unref = ok.count(!lk.toSet.contains(_)).toLong
    val row = SparkEntry.queries("q_eng_orphan_audit")(spark, sf)
      .collect().find(_.getString(0) == "lineitem.l_orderkey->orders").get
    assert(row.getLong(1) == lk.size.toLong)
    assert(row.getLong(2) == orphan, "orphan_rows")
    assert(row.getLong(4) == ok.size.toLong)
    assert(row.getLong(5) == unref, "unreferenced_parents")
    // the audit is non-vacuous on the coverage side: TPC-H style fixtures
    // carry customers with no orders / parts never sold
    val all = SparkEntry.queries("q_eng_orphan_audit")(spark, sf).collect()
    assert(all.length == 5)
    assert(all.map(_.getLong(5)).sum > 0, "some unreferenced parents exist")
  }
}
