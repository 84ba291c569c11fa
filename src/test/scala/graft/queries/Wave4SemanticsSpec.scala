package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 wave-4 queries, independent of the DuckDB
  * gate (shared-formula risk: both engines could encode the same mistake).
  * Each statistic is recomputed driver-side at sf0.001 with naive BigInt
  * brute force and compared exactly.
  */
class Wave4SemanticsSpec extends SparkSpec {

  private lazy val daily: Seq[(String, Long)] =
    Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("x"))
      .orderBy("day")
      .collect().toSeq.map(r => (r.getDate(0).toString, r.getLong(1)))

  test("q_eng_mann_kendall equals the brute-force pair statistic") {
    val xs = daily.map(_._2)
    val n = xs.size
    var s = BigInt(0)
    for (i <- 0 until n; j <- i + 1 until n)
      s += (if (xs(j) > xs(i)) 1 else if (xs(j) < xs(i)) -1 else 0)
    val tieTerm = xs.groupBy(identity).values
      .map(g => BigInt(g.size) * (g.size - 1) * (2 * g.size + 5)).sum
    val var18 = BigInt(n) * (n - 1) * (2 * n + 5) - tieTerm
    val z2 = if (var18 == 0) BigInt(0) else s * s * 18000000 / var18
    val row = SparkEntry.queries("q_eng_mann_kendall")(spark, sf)
      .collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == s.toLong)
    assert(row.getLong(2) == var18.toLong)
    assert(row.getLong(3) == z2.toLong)
  }

  test("q_eng_theil_sen equals the brute-force lower-median slope") {
    val days = daily.map { case (d, x) => (java.time.LocalDate.parse(d), x) }
    val slopes = (for {
      i <- days.indices; j <- (i + 1) until days.size
    } yield {
      val dd = java.time.temporal.ChronoUnit.DAYS
        .between(days(i)._1, days(j)._1)
      val num = BigInt(days(j)._2 - days(i)._2) * 1000000
      // trunc-toward-zero, the mulDivWideSigned contract
      val q = num.abs / dd
      (if (num < 0) -q else q).toLong
    }).sorted
    val m = slopes.size
    val want = slopes((m + 1) / 2 - 1) // lower median, 1-based (m+1) DIV 2
    val row = SparkEntry.queries("q_eng_theil_sen")(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(row.getLong(1) == want)
  }

  test("q_eng_did equals the brute-force cell-mean arithmetic") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = ev.map(_._2).min + (ev.map(_._2).max - ev.map(_._2).min) / 2
    def armOf(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = h.map("%02x".format(_)).mkString.take(13)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    def cellMean(arm: String, pre: Boolean): Long = {
      val cell = ev.filter(e => armOf(e._1) == arm && (e._2 < mid) == pre)
      val sv = BigInt(cell.map(e => BigInt(e._3)).sum.toString) * 1000000
      val q = sv.abs / cell.size
      (if (sv < 0) -q else q).toLong
    }
    val (aPre, aPost) = (cellMean("A", pre = true), cellMean("A", pre = false))
    val (bPre, bPost) = (cellMean("B", pre = true), cellMean("B", pre = false))
    val row = SparkEntry.queries("q_eng_did")(spark, sf).collect().head
    assert(row.getLong(0) == aPre && row.getLong(1) == aPost)
    assert(row.getLong(2) == bPre && row.getLong(3) == bPost)
    assert(row.getLong(4) == (aPost - aPre) - (bPost - bPre))
  }

  test("prefix filter is lossless: equals the naive all-pairs Jaccard join") {
    import graft.dedup.Dedup
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        Dedup.shingleHashes(Dedup.shingles(col("text"), 3)).as("hs"))
    val sets = sh.collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
    val naive = (for {
      (ida, a) <- sets; (idb, b) <- sets if ida < idb
      shared = (a & b).size
      if 9L * shared >= 4L * (a.size + b.size)
    } yield (ida, idb, shared.toLong, a.size.toLong, b.size.toLong)).sorted
    val got = Dedup.prefixFilterPairs(sh, col("doc_id"), col("hs"), 0.8)
      .orderBy("ida", "idb").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == naive)
  }

  test("q_sim_dbscan_grid equals a naive grid-components recomputation") {
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 40)
          .cast("long"),
        floor(element_at(col("embedding"), 2).cast("double") * 40)
          .cast("long"))
      .collect().toSeq.map(r => (r.getLong(1), r.getLong(2)))
    val cellCounts = pts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val core = cellCounts.filter(_._2 >= 4).keys.toSeq
    def code(c: (Long, Long)): Long =
      (c._1 + 1048576L) * 2097152L + c._2 + 1048576L
    // naive union-find over 8-adjacency
    val parent = scala.collection.mutable.Map(core.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for (a <- core; b <- core
         if code(a) < code(b) &&
           math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (code(ra) < code(rb)) rb else ra) =
        if (code(ra) < code(rb)) ra else rb
    }
    val naive = core.groupBy(c => code(find(c)))
      .map { case (cl, cells) =>
        (cl, cells.size.toLong, cells.map(cellCounts).sum)
      }.toSeq.sorted
    val got = SparkEntry.queries("q_sim_dbscan_grid")(spark, sf)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == naive)
  }
}
