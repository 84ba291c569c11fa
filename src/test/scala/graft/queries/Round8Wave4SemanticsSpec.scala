package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 wave 4 statistics (Benjamini–Yekutieli,
  * McNemar, Spearman, Davies–Bouldin), independent of the DuckDB gate.
  * Fixture statistics are recomputed driver-side at sf0.001 with
  * BigInt/sequential-IEEE brute force including every truncation point;
  * byStepUp additionally gets a synthetic frame where the harmonic factor
  * flips a BH rejection (the discriminating case between the two
  * procedures).
  */
class Round8Wave4SemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** (orderkey, priority, cents, label) brute-force base. */
  private lazy val scored: Seq[(Long, String, Long, Long)] = {
    val ret = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("lab"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .collect().toSeq
      .map(r => (lng(r, 0), r.getString(1), lng(r, 2),
        ret.getOrElse(lng(r, 0), 0L)))
  }

  test("q_eng_fdr_by equals BH with the exact integer harmonic factor") {
    val bh = SparkEntry.queries("q_eng_fdr_bh")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val m = BigInt(bh.size)
    val hppm = (1 to bh.size).map(i => BigInt(1000000 / i)).sum
    val kmax = bh.collect { case (_, p, rk)
      if BigInt(p) * m * hppm <= BigInt(rk) * 50000 * 1000000 => rk }
      .maxOption.getOrElse(0L)
    val want = bh.map { case (n, p, rk) =>
      (n, p, rk, if (rk <= kmax) 1L else 0L)
    }
    val got = SparkEntry.queries("q_eng_fdr_by")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("byStepUp is strictly more conservative than bhStepUp") {
    // m = 4 → H_ppm = 1000000 + 500000 + 333333 + 250000 = 2083333.
    // p = 11000: BH at rank 1: 11000·4 = 44000 ≤ 50000 → reject.
    // BY at rank 1: 11000·4·2083333 ≤ 1·50000·1e6 ⟺ 9.17e10 ≤ 5e10 → NO.
    val pv = Seq(("a", 11000L), ("b", 400000L), ("c", 500000L),
      ("d", 600000L)).toDF("n_name", "p_ub_ppm")
    val bh = EvalQueries.bhStepUp(pv, 50000L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val by = EvalQueries.byStepUp(pv, 50000L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(bh("a") == 1L && by("a") == 0L)
    assert(by.values.forall(_ == 0L))

    // and BY still rejects when the evidence clears the harmonic bar:
    // p = 5000 at rank 1: 5000·4·2083333 = 4.17e10 ≤ 5e10 → reject.
    val pv2 = Seq(("a", 5000L), ("b", 400000L), ("c", 500000L),
      ("d", 600000L)).toDF("n_name", "p_ub_ppm")
    val by2 = EvalQueries.byStepUp(pv2, 50000L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(by2("a") == 1L)
  }

  test("q_eng_mcnemar equals the brute-force discordant counts") {
    val b = scored.count(t =>
      Set("1-URGENT", "2-HIGH").contains(t._2) && t._4 == 0L).toLong
    val c = scored.count(t =>
      !Set("1-URGENT", "2-HIGH").contains(t._2) && t._4 == 1L).toLong
    val chi2 =
      if (b + c == 0) BigInt(0)
      else BigInt(b - c) * BigInt(b - c) * 1000000 / BigInt(b + c)
    val row = SparkEntry.queries("q_eng_mcnemar")(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (b, c, chi2.toLong))
    assert(b > 0 && c > 0, "fixture should populate both discordant cells")
  }

  test("q_eng_spearman equals the brute-force midrank Pearson") {
    val nlines = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("nl"))
      .collect().map(r => lng(r, 0) -> lng(r, 1)).toMap
    val rows = scored.collect {
      case (ok, _, cents, _) if nlines.contains(ok) => (cents, nlines(ok))
    }
    val n = BigInt(rows.size)
    def midrank2(vs: Seq[Long]): Map[Long, BigInt] = {
      val byV = vs.groupBy(identity).map { case (v, g) => v -> g.size }
        .toSeq.sortBy(_._1)
      var cum = BigInt(0)
      byV.map { case (v, c) =>
        cum += c
        v -> (cum * 2 - c + 1)
      }.toMap
    }
    val mx = midrank2(rows.map(_._1))
    val my = midrank2(rows.map(_._2))
    val cents = rows.map { case (x, y) => (mx(x) - n - 1, my(y) - n - 1) }
    val num = cents.map { case (cx, cy) => cx * cy }.sum
    val dx = cents.map { case (cx, _) => cx * cx }.sum
    val dy = cents.map { case (_, cy) => cy * cy }.sum
    val want =
      if (dx <= 0 || dy <= 0) BigInt(0)
      else num.signum * ((num.abs * 1000000 / dx) * (num.abs * 1000000 / dy)
        / 1000000)
    val row = SparkEntry.queries("q_eng_spearman")(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == want.toLong)
    assert(want != 0, "fixture correlation should be non-trivial")
  }

  test("waterfill: hand-computed mixed case, uniform, and all-saturated") {
    // caps (10, 100, 1000), B = ⌊0.9·1110⌋ = 999: k=1 sat (20 ≤ 989),
    // k=2 sat (100 ≤ 889), k=3 not (S₃ > B) → t = 2, L = 999−110 = 889,
    // alloc = (10, 100, 889), Σalloc = B exactly here
    val mixed = Seq(("a", 10L), ("b", 100L), ("c", 1000L))
      .toDF("source", "cap")
    val gotM = TextQueries.waterfill(mixed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(gotM == Seq(("a", 10L, 10L, 1L, 889L), ("b", 100L, 100L, 1L, 889L),
      ("c", 1000L, 889L, 0L, 889L)))

    // uniform caps: nothing saturates, everyone gets the floor level
    val uni = Seq(("a", 100L), ("b", 100L), ("c", 100L), ("d", 100L))
      .toDF("source", "cap")
    val gotU = TextQueries.waterfill(uni).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(gotU.forall(_ == ((90L, 0L, 90L))))

    // budget ≥ Σcap (bNum/bDen = 2): all saturated, level = −1 sentinel
    val gotA = TextQueries.waterfill(mixed, bNum = 2L, bDen = 1L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(gotA.forall { case (cap, alloc, sat, lvl) =>
      alloc == cap && sat == 1L && lvl == -1L })
  }

  test("q_text_mix_waterfill conserves the budget within m − t tokens") {
    val rows = SparkEntry.queries("q_text_mix_waterfill")(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val capTot = rows.map(_._1).sum
    val b = capTot * 9 / 10
    val alloc = rows.map(_._2).sum
    val unsat = rows.count(_._3 == 0L)
    assert(alloc <= b && b - alloc < math.max(1, unsat),
      s"alloc=$alloc b=$b unsat=$unsat")
    // every saturated source is taken whole; none exceeds its cap
    assert(rows.forall { case (cap, al, sat) =>
      if (sat == 1L) al == cap else al <= cap })
  }

  test("q_sim_davies_bouldin equals the brute-force scatter/separation") {
    def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.size) { s += a(i) * b(i); i += 1 }
      s
    }
    val cents = Similarity.kmeansCentroids(
      Tables.embeddings(spark, sf), k = 8, iters = 2)
      .collect().map(r => lng(r, 0) -> r.getSeq[Double](1)).toMap
    val asg = SparkEntry.queries("q_sim_ivf_kmeans")(spark, sf)
      .collect().map(r => (lng(r, 0), lng(r, 1), r.getDouble(2)))
    val byCell = asg.groupBy(_._2).map { case (cell, g) =>
      val s2sum = g.map(t => BigInt(math.floor(t._3 * 1e6 + 0.5).toLong)).sum
      cell -> (g.size.toLong, s2sum / g.size)
    }
    val want = byCell.toSeq.sortBy(_._1).map { case (i, (ni, si)) =>
      val rMax = byCell.collect { case (j, (_, sj)) if j != i =>
        val ci = cents(i); val cj = cents(j)
        val d2 = (dotSeq(ci, ci) - 2.0 * dotSeq(ci, cj)) + dotSeq(cj, cj)
        val sepm = BigInt(math.floor(d2 * 1e6 + 0.5).toLong)
        if (sepm > 0) Some((si + sj) * 1000000 / sepm) else None
      }.flatten.max
      (i, ni, si.toLong, rMax.toLong)
    }
    val got = SparkEntry.queries("q_sim_davies_bouldin")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }
}
