package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Batch MERGE INTO — the lakehouse upsert statement (WHEN MATCHED UPDATE /
  * WHEN MATCHED [cond] DELETE / WHEN NOT MATCHED INSERT) as ONE full-outer
  * equi-join on the merge key.
  *
  * Plan shape at 100 TB: a single hash shuffle of each side on the key
  * (zero exchanges when both sides are bucketed on it); no per-row lookups,
  * no driver loop. The changeset is usually much smaller than the target —
  * AQE turns the join into a broadcast automatically when it fits, which
  * is the "merge-on-read with small deltas" fast path.
  *
  * Semantics (standard SQL MERGE):
  *   - matched & `deleteWhen` (evaluated on the SOURCE row) → row dropped;
  *   - matched otherwise → source row wins (the update);
  *   - source-only → inserted (delete clauses never apply to inserts);
  *   - target-only → kept unchanged.
  *
  * Like SQL MERGE (and Delta/Iceberg), a source with DUPLICATE merge keys
  * is an error — the full-outer join would silently fan matched target
  * rows out into several updated copies. The guard is a window count over
  * the source's keys (same partitioning the join shuffle needs anyway)
  * raised through `assert_true`, so it fails at execution time inside the
  * plan with no extra driver-side action.
  */
object Merge {

  /** Both inputs must carry the same columns. `deleteWhen` may reference
    * source fields via `col("_src.<field>")`. */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                deleteWhen: Column = lit(false)): DataFrame = {
    val cols = target.columns.toSeq
    require(source.columns.toSeq == cols,
      s"source columns ${source.columns.mkString(",")} must match target ${cols.mkString(",")}")
    def pack(df: DataFrame, as: String) =
      df.select(struct(cols.map(col): _*).as(as))
        .select(keys.map(k => col(s"$as.$k").as(k)) :+ col(as): _*)
    val wKeys = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val guardedSource = pack(source, "_src")
      .withColumn("_key_multiplicity", count(lit(1)).over(wKeys))
      .where(assert_true(col("_key_multiplicity") === 1,
        lit(s"mergeInto: source has multiple rows for a merge key " +
          s"(${keys.mkString(",")}); MERGE requires at most one source " +
          "match per target row — dedupe the changeset first")).isNull)
      .drop("_key_multiplicity")
    val matched = col("_tgt").isNotNull && col("_src").isNotNull
    pack(target, "_tgt")
      .join(guardedSource, keys, "full_outer")
      .where(!(matched && deleteWhen))
      .select(cols.map(c =>
        when(col("_src").isNotNull, col(s"_src.$c"))
          .otherwise(col(s"_tgt.$c")).as(c)): _*)
  }
}
