package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 statistics queries, independent of the
  * DuckDB gate (shared-formula risk: both engines could encode the same
  * mistake). Each statistic is recomputed driver-side at sf0.001 with
  * naive BigInt brute force and compared exactly — including every
  * truncation point, which IS the cross-engine contract.
  */
class Round8SemanticsSpec extends SparkSpec {

  private def md5ArmOf(key: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex.substring(0, 13), 16) % 2 == 0) "A" else "B"
  }

  private lazy val daily: Seq[(java.time.LocalDate, Long)] =
    Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("x"))
      .orderBy("day")
      .collect().toSeq
      .map(r => (java.time.LocalDate.parse(r.getDate(0).toString), r.getLong(1)))

  test("q_eng_welch_ttest equals the brute-force integer-moment recurrence") {
    val vals = Tables.orders(spark, sf)
      .select(col("o_custkey"), floor(col("o_totalprice")).cast("long").as("v"))
      .collect().toSeq.map(r => (md5ArmOf(r.getLong(0)), r.getLong(1)))
    def mom(arm: String): (BigInt, BigInt, BigInt) = {
      val vs = vals.collect { case (a, v) if a == arm => BigInt(v) }
      (BigInt(vs.size), vs.sum, vs.map(v => v * v).sum)
    }
    val (na, sa, ssa) = mom("A")
    val (nb, sb, ssb) = mom("B")
    val dm = sa * 1000000 / na - sb * 1000000 / nb // non-negative floors
    def se2Half(n: BigInt, s: BigInt, ss: BigInt): BigInt =
      (n * ss - s * s) * 1000000 / (n * n * (n - 1))
    val se2 = se2Half(na, sa, ssa) + se2Half(nb, sb, ssb)
    val t2 = dm * dm / se2 // dm² ≥ 0, se2 > 0: floor == trunc
    val row = SparkEntry.queries("q_eng_welch_ttest")(spark, sf).collect().head
    assert(row.getLong(0) == na.toLong && row.getLong(1) == nb.toLong)
    assert(row.getLong(2) == dm.toLong, "dm_micro")
    assert(row.getLong(3) == se2.toLong, "se2_micro")
    assert(row.getLong(4) == t2.toLong, "t2_micro")
  }

  test("q_eng_acf equals the brute-force centered-product rationals") {
    val n = BigInt(daily.size)
    val s = daily.map(x => BigInt(x._2)).sum
    val c = daily.map { case (d, x) => (d, n * x - s) }.toMap
    val c0 = c.values.map(v => v * v).sum
    val got = SparkEntry.queries("q_eng_acf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (1 to 7).flatMap { lag =>
      val pairs = daily.flatMap { case (d, _) =>
        c.get(d.plusDays(lag)).map(cb => (c(d), cb))
      }
      if (pairs.isEmpty) None
      else {
        val num = pairs.map { case (a, b) => a * b }.sum
        val q = num.abs * 1000000 / c0 // trunc-toward-zero contract
        Some((lag.toLong, pairs.size.toLong,
          (if (num < 0) -q else q).toLong))
      }
    }
    assert(got == want)
  }

  test("q_eng_runs_test equals the brute-force runs statistic") {
    val signs = daily.map(_._2).sliding(2).collect {
      case Seq(a, b) if a != b => if (b > a) 1 else -1
    }.toSeq
    val p = BigInt(signs.count(_ == 1))
    val m = BigInt(signs.count(_ == -1))
    val runs = BigInt(if (signs.isEmpty) 0
      else 1 + signs.sliding(2).count { case Seq(a, b) => a != b; case _ => false })
    val nn = p + m
    val d = runs * nn - 2 * p * m - nn
    val den = 2 * p * m * (2 * p * m - nn)
    val z2 = d * d * (nn - 1) * 1000000 / den
    val row = SparkEntry.queries("q_eng_runs_test")(spark, sf).collect().head
    assert(row.getLong(0) == nn.toLong && row.getLong(1) == p.toLong &&
      row.getLong(2) == m.toLong)
    assert(row.getLong(3) == runs.toLong, "n_runs")
    assert(row.getLong(4) == z2.toLong, "z2_micro")
  }

  test("q_text_heaps equals the brute-force first-occurrence curve") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))
    val mx = docs.map(_._1).max
    def toks(t: String): Seq[String] = {
      val tr = t.trim.toLowerCase
      if (tr.isEmpty) Seq.empty else tr.split("\\s+").toSeq
    }
    val bucketed = docs.map { case (id, t) => (id * 10 / (mx + 1), toks(t)) }
    val tokCnt = bucketed.groupBy(_._1).view
      .mapValues(_.map(_._2.size.toLong).sum).toMap
    val firstBucket = scala.collection.mutable.Map.empty[String, Long]
    bucketed.sortBy(_._1).foreach { case (b, ts) =>
      ts.foreach(t => if (!firstBucket.contains(t)) firstBucket(t) = b)
    }
    val newTypes = firstBucket.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val buckets = tokCnt.keys.toSeq.sorted
    var (cumT, cumY) = (0L, 0L)
    val want = buckets.map { b =>
      cumT += tokCnt(b); cumY += newTypes.getOrElse(b, 0L)
      (b, cumT, cumY)
    }
    val got = SparkEntry.queries("q_text_heaps")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
