package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution pattern (impression →
  * click within a lag window), completing the streaming operator family
  * (builder-prompt extension; the reference has no streaming at all,
  * SURVEY.md §2.10).
  *
  * Scale shape: both inputs MUST carry event-time watermarks; combined
  * with the time-range join condition they bound the join state Spark
  * buffers per side — left rows expire once the right watermark passes
  * `leftTs + maxLagMs`, right rows once the left watermark passes their
  * own timestamp. Without the range condition the state store grows
  * without bound; this operator makes the condition impossible to forget.
  */
object StreamJoin {

  /** Inner-join right rows onto left rows with the same `key` whose
    * `rightTs` falls within [leftTs, leftTs + maxLagMs].
    * Timestamp columns must be named differently on the two sides. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, maxLagMs: Long): DataFrame = {
    require(maxLagMs > 0, s"maxLagMs must be positive, got $maxLagMs")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"both sides need key column '$key'")
    require(leftTs != rightTs,
      "left and right timestamp columns must be named differently")
    val rk = "__sj_rk"
    require(!left.columns.contains(rk) && !right.columns.contains(rk),
      s"column '$rk' is reserved")
    left.join(right.withColumnRenamed(key, rk),
        col(key) === col(rk) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxLagMs MILLISECONDS"))
      .drop(rk)
  }

  /** Left-outer variant of [[intervalJoin]]: unmatched left rows ARE
    * emitted (right columns null) — but only once the right-side
    * watermark has passed `leftTs + maxLagMs`, because until then a
    * matching right row could still arrive. That deferred emission is
    * the semantic difference from a batch left join, and the reason the
    * time-range condition is mandatory here too: it is what lets Spark
    * prove a left row can no longer match and release both the state
    * entry and the null-joined result. */
  def leftOuterIntervalJoin(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            maxLagMs: Long): DataFrame = {
    require(maxLagMs > 0, s"maxLagMs must be positive, got $maxLagMs")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"both sides need key column '$key'")
    require(leftTs != rightTs,
      "left and right timestamp columns must be named differently")
    val rk = "__sj_rk"
    require(!left.columns.contains(rk) && !right.columns.contains(rk),
      s"column '$rk' is reserved")
    left.join(right.withColumnRenamed(key, rk),
        col(key) === col(rk) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxLagMs MILLISECONDS"),
        "leftOuter")
      .drop(rk)
  }

  /** Stream-static enrichment: left-join a static dimension onto a
    * stream — the lookup pattern (event → user segment / product
    * attributes) that needs NO state store: the dimension broadcasts to
    * every task and Spark re-resolves the static side each micro-batch,
    * so a slowly-changing dimension file is picked up on its next write.
    * Contrast with [[intervalJoin]], whose per-side watermark state this
    * join never allocates. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String,
             dimCols: Seq[String]): DataFrame = {
    require(dim.columns.contains(key), s"dimension needs key column '$key'")
    val clashes = dimCols.filter(stream.columns.contains)
    require(clashes.isEmpty,
      s"dimension columns ${clashes.mkString(",")} collide with stream columns")
    stream.join(broadcast(dim.select((key +: dimCols).map(col): _*)),
      Seq(key), "left")
  }
}
