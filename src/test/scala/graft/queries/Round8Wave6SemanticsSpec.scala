package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 wave 7 statistics (Cohen's d,
  * Cochran-Armitage trend, Cochran's Q, winsorized mean, Hodges-Lehmann
  * shift, Friedman), independent of the DuckDB gate: every statistic
  * recomputed driver-side at sf0.001 with BigInt / sequential-IEEE brute
  * force including every floor point, plus a synthetic exact-mean-tie
  * frame through the factored Friedman (cross-multiplied equality never
  * fires on fixture money sums).
  */
class Round8Wave6SemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** (custkey, priority, cents, label, orderdate) brute-force base. */
  private lazy val orders: Seq[(Long, String, Long, Long, String)] = {
    val ret = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("lab"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        to_date(col("o_orderdate")).cast("string"))
      .collect().toSeq
      .map(r => (lng(r, 1), r.getString(2), lng(r, 3),
        ret.getOrElse(lng(r, 0), 0L), r.getString(4)))
  }

  test("q_eng_cohens_d equals the brute-force pooled-sd effect size") {
    val a1 = orders.filter(_._2 == "1-URGENT").map(_._3)
    val a2 = orders.filterNot(_._2 == "1-URGENT").map(_._3)
    val (n1, n2) = (a1.size.toLong, a2.size.toLong)
    val s1 = a1.map(BigInt(_)).sum; val s2 = a2.map(BigInt(_)).sum
    val q1 = a1.map(v => BigInt(v) * v).sum
    val q2 = a2.map(v => BigInt(v) * v).sum
    val ss1 = q1.toDouble - s1.toDouble * s1.toDouble / n1.toDouble
    val ss2 = q2.toDouble - s2.toDouble * s2.toDouble / n2.toDouble
    val want = (s1.toDouble / n1.toDouble - s2.toDouble / n2.toDouble) /
      math.sqrt((ss1 + ss2) / (n1.toDouble + n2.toDouble - 2.0))
    val row = SparkEntry.queries("q_eng_cohens_d")(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2)) ==
      ((n1, n2, want)))
    assert(want.abs > 1e-6, "fixture effect should be non-degenerate")
  }

  test("q_eng_cochran_armitage equals the brute-force trend z^2") {
    val g = orders.groupBy(_._2.substring(0, 1).toLong)
    val cells = g.map { case (sc, rows) =>
      (BigInt(sc), BigInt(rows.size), BigInt(rows.map(_._4).sum))
    }.toSeq
    val n = cells.map(_._2).sum
    val r = cells.map(_._3).sum
    val sn = cells.map(t => t._1 * t._2).sum
    val sr = cells.map(t => t._1 * t._3).sum
    val s2n = cells.map(t => t._1 * t._1 * t._2).sum
    val t = n * sr - r * sn
    val z2 = n * t * t * 1000000 / (r * (n - r) * (n * s2n - sn * sn))
    val row = SparkEntry.queries("q_eng_cochran_armitage")(spark, sf)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n.toLong, r.toLong, t.signum.toLong, z2.toLong)))
  }

  test("q_eng_cochran_q equals the brute-force repeated-measures Q") {
    val flags = orders.map(t => (t._1, t._5.substring(0, 4).toLong))
      .filter(t => t._2 >= 1995L && t._2 <= 1997L).distinct
    val ri = flags.groupBy(_._1).map { case (_, g) => BigInt(g.size) }.toSeq
    val cj = flags.groupBy(_._2).map { case (_, g) => BigInt(g.size) }.toSeq
    val nn = ri.sum
    val r2 = ri.map(x => x * x).sum
    val c2 = cj.map(x => x * x).sum
    val q = 2 * (3 * c2 - nn * nn) * 1000000 / (3 * nn - r2)
    val row = SparkEntry.queries("q_eng_cochran_q")(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((ri.size.toLong, nn.toLong, q.toLong)))
    assert(ri.exists(_ < 3), "fixture should have non-saturated blocks")
  }

  test("q_eng_winsorized equals the brute-force clamped mean") {
    val sorted = orders.map(_._3).sorted
    val n = sorted.size
    val lo = sorted(n / 20 + 1 - 1)
    val hi = sorted(n - n / 20 - 1)
    val sum0 = sorted.map(v => BigInt(math.max(lo, math.min(hi, v)))).sum
    val want = (n.toLong, lo, hi, (sum0 * 1000000 / n).toLong)
    val row = SparkEntry.queries("q_eng_winsorized")(spark, sf)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == want)
    assert(lo < hi, "fixture thresholds should bracket a real interior")
  }

  test("q_eng_hodges_lehmann equals the brute-force pairwise median") {
    val d1 = orders.filter(_._2 == "1-URGENT")
      .groupBy(_._5).map { case (_, g) => g.map(_._3).sum }.toSeq
    val d2 = orders.filterNot(_._2 == "1-URGENT")
      .groupBy(_._5).map { case (_, g) => g.map(_._3).sum }.toSeq
    val dds = (for (a <- d1; b <- d2) yield a - b).sorted
    val m = dds.size
    val hl2 = dds((m + 1) / 2 - 1) + dds(m / 2 + 1 - 1)
    val row = SparkEntry.queries("q_eng_hodges_lehmann")(spark, sf)
      .collect().head
    assert((row.getLong(0), row.getLong(1)) == ((m.toLong, hl2)))
  }

  test("q_eng_friedman equals the brute-force cross-multiplied midranks") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    val cells = orders.groupBy(t => (cust(t._1), t._2)).map { case (k, g) =>
      (k._1, k._2, g.map(x => BigInt(x._3)).sum, BigInt(g.size))
    }.toSeq
    val complete = cells.groupBy(_._1).filter(_._2.size == 5).keySet
    val cc = cells.filter(c => complete(c._1))
    val r2s = cc.map { case (nk, prio, sv, cv) =>
      val peers = cc.filter(_._1 == nk)
      val lt = peers.count(p => p._3 * cv < sv * p._4)
      val eq = peers.count(p => p._3 * cv == sv * p._4)
      (nk, prio, BigInt(2 * lt + eq + 1))
    }
    val b = BigInt(complete.size)
    val b2 = r2s.groupBy(_._2)
      .map { case (_, g) => val rj = g.map(_._3).sum; rj * rj }.sum
    val a2 = r2s.map(t => t._3 * t._3).sum
    val chi2 = 4 * (b2 - b * b * 180) * 1000000 / (a2 - b * 180)
    val row = SparkEntry.queries("q_eng_friedman")(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((b.toLong, chi2.toLong)))
    assert(b > 0, "fixture should have complete blocks")
  }

  test("friedmanFromCells handles exact mean ties (synthetic)") {
    // block 10: treatments a,b tie exactly (2/1 = 4/2), c above, d and e
    // below-distinct; block 20: all five distinct. k = 4? No — k = 5.
    val cells = Seq(
      (10L, "a", BigInt(2), 1L), (10L, "b", BigInt(4), 2L),
      (10L, "c", BigInt(9), 1L), (10L, "d", BigInt(1), 1L),
      (10L, "e", BigInt(3), 2L),
      (20L, "a", BigInt(1), 1L), (20L, "b", BigInt(2), 1L),
      (20L, "c", BigInt(3), 1L), (20L, "d", BigInt(4), 1L),
      (20L, "e", BigInt(5), 1L),
      // incomplete block 30 must be dropped on both paths
      (30L, "a", BigInt(7), 1L), (30L, "b", BigInt(8), 1L))
      .map(t => (t._1, t._2, t._3.toLong, t._4))
      .toDF("nk", "prio", "sv0", "cv")
      .select(col("nk"), col("prio"),
        col("sv0").cast("decimal(38,0)").as("sv"), col("cv"))
    val got = AnalyticsQueries.friedmanFromCells(cells, 5L).collect().head
    // hand midranks (2×): block 10 means a=2, b=2, c=9, d=1, e=1.5 →
    // order d(2) e(4) {a,b tie: ranks 3,4 → 2×mid=7} c(10);
    // block 20: 2,4,6,8,10
    val r2 = Map(("a", 10L) -> 7L, ("b", 10L) -> 7L, ("c", 10L) -> 10L,
      ("d", 10L) -> 2L, ("e", 10L) -> 4L)
    val block20 = Map("a" -> 2L, "b" -> 4L, "c" -> 6L, "d" -> 8L,
      "e" -> 10L)
    val rj = Seq("a", "b", "c", "d", "e")
      .map(p => r2(p -> 10L) + block20(p))
    val b2 = rj.map(x => BigInt(x) * x).sum
    val a2 = (r2.values ++ block20.values).map(x => BigInt(x) * x).sum
    val want = 4 * (b2 - BigInt(2) * 2 * 180) * 1000000 / (a2 - BigInt(2) * 180)
    assert((got.getLong(0), got.getLong(1)) == ((2L, want.toLong)))
  }
}
