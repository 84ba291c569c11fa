package graft.sample

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Single-pass mergeable per-group reservoir sampler (SURVEY.md §7.3's
  * "custom `Aggregator` reservoir" option, reference: Vitter Algorithm R at
  * sampling/samplers.py:352-466).
  *
  * Implemented as **bottom-k by priority** rather than a literal Algorithm-R
  * port: each row carries a priority (a seeded content hash), and the
  * aggregator keeps the k smallest (priority, id) pairs. Unlike Algorithm R
  * — whose state can't be merged across partitions without replacement
  * counts — bottom-k is associative/commutative, so Spark runs it as a
  * partial aggregation with map-side combine: one pass, O(k) state per
  * group per task, one shuffle of k-sized buffers. With
  * priority = xxhash64(seed, id) it selects EXACTLY the same rows as the
  * window-rank path (`Samplers.perGroup` + `SampleOrder.HashOf`) while
  * never sorting whole groups — the preferred shape when strata are huge
  * (the window path per-group sort is the bottleneck at 100 TB).
  *
  * Buffer trimming is amortized: buffers grow to 2k before an O(k log k)
  * sort-and-trim, so per-row cost is O(1) amortized.
  */
case class BottomKByPriority(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[(Long, Long)] = Vector.empty

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    if (s.length <= k) s else s.sortBy(identity).take(k)

  override def reduce(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] = {
    val appended = buf :+ row
    if (appended.length >= 2 * k) trim(appended) else appended
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)

  /** Selected ids, ordered by (priority, id). */
  override def finish(r: Seq[(Long, Long)]): Seq[Long] =
    r.sortBy(identity).take(k).map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
