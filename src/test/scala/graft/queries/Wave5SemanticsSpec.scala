package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 wave-5 queries — driver-side BigInt brute
  * force at sf0.001, independent of the DuckDB gate (both engines share a
  * formula; a shared mistake would gate green, so each statistic is
  * re-derived here from first principles).
  */
class Wave5SemanticsSpec extends SparkSpec {

  private lazy val daily: Seq[(String, Long)] =
    Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("x"))
      .orderBy("day")
      .collect().toSeq.map(r => (r.getDate(0).toString, r.getLong(1)))

  test("q_eng_pettitt equals the brute-force max |U_t|") {
    val xs = daily.map(_._2)
    val n = xs.size
    // direct definition: U_t = sum_{i<=t, j>t} sign(x_i - x_j), t = index
    // of each day taken as the last LEFT element
    var bestK = -1L
    var bestDay: String = null
    for (t <- 0 until n) {
      var u = 0L
      for (i <- 0 to t; j <- (t + 1) until n)
        u += (if (xs(i) > xs(j)) 1 else if (xs(i) < xs(j)) -1 else 0)
      if (math.abs(u) > bestK) { bestK = math.abs(u); bestDay = daily(t)._1 }
    }
    val row = SparkEntry.queries("q_eng_pettitt")(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == bestK)
    assert(row.getString(2) == bestDay)
  }

  test("q_eng_kadane equals the brute-force max-subarray of deltas") {
    val xs = daily.map(_._2)
    val deltas = xs.sliding(2).map(p => p(1) - p(0)).toSeq
    var cur = 0L
    var best = Long.MinValue
    var bestEnd: String = null
    for (i <- deltas.indices) {
      cur = math.max(deltas(i), cur + deltas(i))
      if (cur > best) { best = cur; bestEnd = daily(i + 1)._1 }
    }
    val row = SparkEntry.queries("q_eng_kadane")(spark, sf).collect().head
    assert(row.getLong(0) == best)
    assert(row.getString(1) == bestEnd)
  }

  test("q_eng_partial_corr equals the BigInt-moment IEEE recomputation") {
    val rows = Tables.lineitem(spark, sf)
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        col("l_quantity").cast("long"),
        floor(col("l_discount") * 1000 + 0.5).cast("long"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = BigInt(rows.size)
    def s(f: ((Long, Long, Long)) => BigInt): BigInt = rows.map(f).sum
    val (sx, sy, sz) = (s(r => BigInt(r._1)), s(r => BigInt(r._2)),
      s(r => BigInt(r._3)))
    def c(sab: BigInt, sa: BigInt, sb: BigInt): Double =
      (n * sab - sa * sb).doubleValue // correctly rounded, like DECIMAL(38)
    val cxy = c(s(r => BigInt(r._1) * r._2), sx, sy)
    val cxz = c(s(r => BigInt(r._1) * r._3), sx, sz)
    val cyz = c(s(r => BigInt(r._2) * r._3), sy, sz)
    val cxx = c(s(r => BigInt(r._1) * r._1), sx, sx)
    val cyy = c(s(r => BigInt(r._2) * r._2), sy, sy)
    val czz = c(s(r => BigInt(r._3) * r._3), sz, sz)
    val rXy = cxy / math.sqrt(cxx * cyy)
    val rXyz = (cxy * czz - cxz * cyz) /
      math.sqrt((cxx * czz - cxz * cxz) * (cyy * czz - cyz * cyz))
    val row = SparkEntry.queries("q_eng_partial_corr")(spark, sf)
      .collect().head
    assert(row.getLong(0) == rows.size.toLong)
    assert(row.getDouble(1) == rXy)      // bitwise: same ints, same IEEE ops
    assert(row.getDouble(2) == rXyz)
  }

  test("q_text_simpson equals the BigInt token-concentration ratio") {
    val toks = Tables.documents(spark, sf)
      .select(col("source"),
        explode(graft.text.TextFunctions.tokens(lower(col("text"))))
          .as("tok"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    val bySource = toks.groupBy(_._1)
    val want = bySource.toSeq.map { case (src, ts) =>
      val counts = ts.groupBy(_._2).values.map(_.size.toLong)
      val nTok = counts.sum
      val num = counts.map(c => BigInt(c) * (c - 1)).sum
      val d = num * 1000000000L / (BigInt(nTok) * (nTok - 1))
      (src, nTok, counts.size.toLong, d.toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_text_simpson")(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == want)
  }
}
