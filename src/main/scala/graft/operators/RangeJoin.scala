package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the scale path for inequality joins.
  *
  * A naive `points JOIN intervals ON p BETWEEN s AND e` has no equi-key, so
  * Spark plans a BroadcastNestedLoopJoin (O(|P|·|I|) comparisons) or, when
  * neither side fits in memory, fails outright. The standard fix is bucket
  * expansion: quantize the domain into fixed-width buckets, explode each
  * interval into the buckets it covers, and equi-join on the bucket id with
  * the exact `BETWEEN` as a residual condition. Shuffle volume becomes
  * O(|P| + |I|·⌈len/width⌉) and the join is an ordinary hash join that
  * AQE can re-plan (skewed buckets split, small sides broadcast).
  *
  * Width is the knob: ≈ the typical interval length, so each interval
  * explodes into ≤ 2 buckets while a bucket pairs each point only with
  * intervals that could plausibly contain it.
  *
  * Domain columns are caller-provided integers (epoch micros, epoch days,
  * numeric ids…) — the operator is unit-agnostic and all arithmetic is
  * integral, so no floating-point edge behavior at bucket boundaries.
  * Non-negative domains only (integral `div` truncates toward zero).
  */
object RangeJoin {

  /** Inner-joins `points` to every interval containing them.
    *
    * @param points    side with a single long point column `pointCol`
    * @param intervals side with long `[startCol, endCol]` (inclusive ends)
    * @param bucketWidth domain units per bucket (> 0)
    * @param broadcastIntervals hint that the exploded interval side is small
    *        enough to broadcast — then the point side never shuffles at all
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long,
                      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = "__bucket"
    require(!points.columns.contains(reserved) && !intervals.columns.contains(reserved),
      s"input columns clash with reserved name $reserved")
    // the residual predicate resolves pointCol/startCol/endCol by bare
    // name across the join — any shared column name would be ambiguous
    val shared = points.columns.intersect(intervals.columns)
    require(shared.isEmpty,
      s"points and intervals must have disjoint column names; shared: ${shared.mkString(",")}")

    val p = points.withColumn(reserved, expr(s"`$pointCol` div $bucketWidth"))
    val iExpanded = intervals.withColumn(reserved,
      explode(sequence(expr(s"`$startCol` div $bucketWidth"),
                       expr(s"`$endCol` div $bucketWidth"))))
    val iSide = if (broadcastIntervals) broadcast(iExpanded) else iExpanded
    p.join(iSide,
        p(reserved) === iSide(reserved) &&
          col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(reserved)
  }
}
