package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 model-eval wave, independent of the DuckDB
  * gate: AUC really is the pairwise probability-of-correct-ranking, kappa
  * really is the chance-corrected agreement, calibration bins partition the
  * table exactly. Brute force runs driver-side at sf0.001 (1.5k orders). */
class EvalSemanticsSpec extends SparkSpec {

  private lazy val scored: Seq[(Long, Long, String)] = {
    val ret = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("label"))
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("cents"), coalesce(col("label"), lit(0L)).as("label"),
        col("o_orderpriority"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  test("q_eng_auc equals the brute-force pairwise rank probability") {
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    // 2U = #(pos > neg)*2 + #(pos == neg), exact in BigInt
    var u2 = BigInt(0)
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val want = u2 * 1000000 / (BigInt(2) * pos.size * neg.size)
    val row = graft.SparkEntry.queries("q_eng_auc")(spark, sf).collect().head
    assert(row.getLong(0) == want.toLong)
    assert(row.getLong(1) == pos.size.toLong && row.getLong(2) == neg.size.toLong)
  }

  test("q_eng_kappa equals the chance-corrected agreement from the 2x2 table") {
    val n = BigInt(scored.size)
    val a1 = BigInt(scored.count(r => Set("1-URGENT", "2-HIGH")(r._3)))
    val b1 = BigInt(scored.count(_._2 == 1L))
    val n11 = BigInt(scored.count(r => Set("1-URGENT", "2-HIGH")(r._3) && r._2 == 1L))
    val pe = a1 * b1 + (n - a1) * (n - b1)
    val num = (n * (n - a1 - b1 + 2 * n11) - pe) * 1000000
    val den = n * n - pe
    val want = num / den // BigInt division truncates toward zero, matching
    val row = graft.SparkEntry.queries("q_eng_kappa")(spark, sf).collect().head
    assert(row.getLong(0) == want.toLong)
  }

  test("q_eng_calibration bins partition the table; rates are per-bin exact") {
    val rows = graft.SparkEntry.queries("q_eng_calibration")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    assert(rows.map(_.getLong(1)).sum == scored.size.toLong)
    // equidepth: bin sizes differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    for (r <- rows)
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
  }

  test("q_eng_ks_test is the max ECDF distance (brute force)") {
    val g1 = scored.filter(_._3 == "1-URGENT").map(_._1).sorted
    val g2 = scored.filter(_._3 != "1-URGENT").map(_._1).sorted
    val domain = (g1 ++ g2).distinct.sorted
    val d = domain.map { s =>
      val c1 = BigInt(g1.count(_ <= s)) * g2.size
      val c2 = BigInt(g2.count(_ <= s)) * g1.size
      (c1 - c2).abs
    }.max
    val want = d * 1000000 / (BigInt(g1.size) * g2.size)
    val row = graft.SparkEntry.queries("q_eng_ks_test")(spark, sf).collect().head
    assert(row.getLong(0) == want.toLong)
  }

  test("q_eng_target_encode: LOO encoding excludes the current row exactly") {
    val rows = graft.SparkEntry.queries("q_eng_target_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute from the joined base
    val oc = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(
        Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
          .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("label")),
        col("o_orderkey") === col("l_orderkey"), "left")
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), coalesce(col("label"), lit(0L)).as("label"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byNation = oc.groupBy(_._1)
    for (r <- rows) {
      val (nm, lbl) = (r.getString(0), r.getLong(1))
      val all = byNation(nm)
      val pos = all.count(_._2 == 1L).toLong
      val n = all.length.toLong
      assert(r.getLong(2) == all.count(_._2 == lbl).toLong)
      assert(r.getLong(3) == (pos - lbl) * 1000000L / (n - 1L))
    }
  }
}
