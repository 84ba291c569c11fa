package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact order statistics over a Long column by ITERATIVE RANGE REFINEMENT
  * — the classic distributed exact-median loop (extracted from
  * q_eng_theil_sen so the overflow-hardened arithmetic is spec-testable at
  * domain extremes; ADVICE r7).
  *
  * Each round is one full-parallel `buckets`-wide histogram over the
  * current value range; the driver walks the ≤ buckets+1-row result
  * (metadata-scale, the Packing discipline) to the bucket holding the
  * target rank, and the range narrows `buckets`× per round — ≤7 rounds
  * for the full int64 domain. A single fixed bucketing is NOT enough for
  * fat-tailed data (probed at sf0.1: 81% of 2.9M Theil–Sen slopes land in
  * one of 1024 range buckets), so one-shot pruning still funnels millions
  * of rows through one task; refinement keeps every pass parallel.
  *
  * Overflow contract (why the odd arithmetic): values may span the whole
  * Long domain, so `hi − lo` can exceed Long.MaxValue. The range width and
  * bucket boundaries are computed in BigInt, and the bucket expression
  * subtracts in DECIMAL(38,0) — `DIV` on the non-negative decimal
  * difference truncates == floors, matching the driver's boundary math.
  */
object RankSelect {

  /** Value at 1-based rank `rankOf(n)` of the ascending-sorted column,
    * paired with the total count n — None on an empty input. `rankOf`
    * sees the count from the single counting pass (e.g. lower median =
    * `n => (n + 1) / 2`) and must return a rank in [1, n]. */
  def exactAtRank(df: DataFrame, valueCol: Column,
                  rankOf: Long => Long,
                  driverLimit: Int = 65536,
                  buckets: Int = 1024): Option[(Long, Long)] = {
    require(driverLimit >= 1 && buckets >= 2)
    val vc = "__rs_v"
    val vals = df.select(valueCol.cast("long").as(vc))
    val ext = vals.agg(min(col(vc)), max(col(vc)), count(lit(1))).head()
    if (ext.isNullAt(0)) return None
    val (lo, hi, n) = (ext.getLong(0), ext.getLong(1), ext.getLong(2))
    val target = rankOf(n)
    require(target >= 1 && target <= n,
      s"rankOf($n) = $target outside [1, $n]")
    var curLo = lo
    var curHi = hi
    var before = 0L // values known < curLo
    var cnt = n     // values inside [curLo, curHi]
    var exact: Option[Long] = None
    var rounds = 0
    while (exact.isEmpty && cnt > driverLimit && rounds < 10) {
      // BigInt span: a full-domain hi − lo wraps negative in Long and
      // would silently corrupt the histogram
      val w = ((BigInt(curHi) - BigInt(curLo)) / buckets + 1).toLong
      val hist = vals
        .where(col(vc) >= curLo && col(vc) <= curHi)
        .groupBy(expr(
          s"CAST((CAST($vc AS DECIMAL(38,0)) - ${curLo}) DIV ${w}" +
            " AS BIGINT)").as("bkt"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var k = 0L
      var ck = 0L
      var found = false
      val it = hist.iterator
      while (it.hasNext && !found) {
        val (bk, c) = it.next()
        if (before + c >= target) { k = bk; ck = c; found = true }
        else before += c
      }
      // boundary math in BigInt too: k·w alone can exceed Long.Max even
      // though the clamped bounds always land back inside [curLo, curHi]
      val newLo = BigInt(curLo) + BigInt(k) * BigInt(w)
      val newHi = (newLo + BigInt(w) - 1).min(BigInt(curHi))
      curLo = newLo.toLong
      curHi = newHi.toLong
      cnt = ck
      if (w == 1L) exact = Some(curLo) // single-value bucket: done
      rounds += 1
    }
    val value = exact.getOrElse {
      // ≤ driverLimit surviving candidates: sort driver-side — half a MB
      // of longs at the default limit, metadata-scale like the histograms
      val cand = vals
        .where(col(vc) >= curLo && col(vc) <= curHi)
        .collect().map(_.getLong(0)).sorted
      cand((target - before - 1L).toInt)
    }
    Some((n, value))
  }

  /** (n, lower median) of the column — None on empty input. */
  def exactLowerMedian(df: DataFrame, valueCol: Column,
                       driverLimit: Int = 65536,
                       buckets: Int = 1024): Option[(Long, Long)] =
    exactAtRank(df, valueCol, m => (m + 1) / 2, driverLimit, buckets)
}
