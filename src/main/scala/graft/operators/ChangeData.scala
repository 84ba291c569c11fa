package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}

/** Snapshot differencing (CDC extraction): given two keyed snapshots of a
  * table, emit the minimal changeset that turns the previous snapshot
  * into the next one — the inverse of [[graft.streaming.Upsert]]'s merge,
  * and the standard way to derive an incremental feed from full dumps.
  *
  * Plan shape at scale: one full-outer shuffle join on the key — with
  * both snapshots bucketed/partitioned by the key the join co-locates and
  * nothing else moves. Compared columns travel as ONE struct per side, so
  * the inequality test is a single struct compare (codegen'd), not N
  * per-column ORs, and adding a column to the contract never changes the
  * plan shape.
  */
object ChangeData {

  /** Changeset rows: (key, op, compareCols… from the NEXT snapshot —
    * null for deletes). op ∈ 'I' (key only in next), 'D' (key only in
    * prev), 'U' (present in both, compared columns differ — null-safe).
    * Unchanged rows are absent. Keys must be unique per snapshot. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    require(prev.columns.contains(key) && next.columns.contains(key),
      s"both snapshots need key column '$key'")
    val p = prev.select(col(key), struct(compareCols.map(col): _*).as("__p"))
    val n = next.select(col(key), struct(compareCols.map(col): _*).as("__n"))
    p.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("__p").isNull, lit("I"))
          .when(col("__n").isNull, lit("D"))
          .when(!(col("__p") <=> col("__n")), lit("U")))
      .where(col("op").isNotNull)
      .select(col(key) +: col("op") +:
        compareCols.map(c => col(s"__n.$c").as(c)): _*)
  }
}
