package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (last-value-before) join — the canonical time-series operator
  * Spark lacks as a built-in (builder-prompt engine breadth; DuckDB ships
  * it as `ASOF JOIN`, which is the oracle).
  *
  * Semantics: for every left row, attach the payload of the latest right
  * row with the same key and `rightTs <= leftTs`; left rows with no prior
  * right row keep null payloads (LEFT ASOF semantics). Ties on timestamp
  * match (<=); multiple right rows on the identical (key, ts) are broken
  * arbitrarily — callers wanting determinism must dedupe.
  *
  * Spark-first implementation per SURVEY.md §7.3 preference (a) — composed
  * from existing operators, no custom plan node: union the two sides
  * tagged, sort within each key by (ts, tag) so a right row at time t
  * precedes left rows at the same t, and carry the right payload forward
  * with `last(_, ignoreNulls)` over an unbounded-preceding running window.
  * One shuffle on the key; within-partition sort; no join blow-up at all —
  * at 100 TB this beats a range-join (which explodes candidate pairs) and
  * needs no AQE skew handling beyond the usual key-salting options.
  */
object AsOfJoin {

  /** Builds the tagged union both variants run on. The payload travels as
    * ONE struct (non-null exactly on right rows), so last(ignoreNulls)
    * picks the latest right ROW atomically — a per-column fill would skip
    * a genuinely-null payload field and stitch together values from
    * different right rows.
    * tag 0 = right (sorts first at equal ts → <= semantics), tag 1 = left. */
  private def taggedUnion(left: DataFrame, right: DataFrame, key: String,
                          leftTs: String, rightTs: String,
                          payloadCols: Seq[String],
                          extraReserved: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    val reserved = Seq("__ts", "__tag", "__payload") ++ extraReserved
    val clashes = (leftCols ++ right.columns).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"input columns ${clashes.mkString(",")} collide with reserved working names " +
        s"${reserved.mkString(",")}")
    val taggedRight = right.select(
      col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        struct(payloadCols.map(col): _*).as("__payload") +:
        leftCols.filterNot(c => c == key).map(c => lit(null).as(c)): _*)
    val payloadType = taggedRight.schema("__payload").dataType
    val taggedLeft = left.select(
      col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        lit(null).cast(payloadType).as("__payload") +:
        leftCols.filterNot(c => c == key).map(col): _*)
    taggedRight.unionByName(taggedLeft)
  }

  /** @param left        left (probe) rows
    * @param right       right (reference) rows
    * @param key         equi-join key column name present on both sides
    * @param leftTs      left timestamp column name
    * @param rightTs     right timestamp column name
    * @param payloadCols right columns to attach (renamed as given) */
  def lastValueBefore(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedUnion(left, right, key, leftTs, rightTs, payloadCols, Nil)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
  }

  /** Salted variant of [[lastValueBefore]] for LOW-CARDINALITY keys, where
    * the plain version's parallelism (= #distinct keys, one window
    * partition per key) leaves most of the cluster idle and the hottest
    * key becomes a straggler.
    *
    * Each row is additionally bucketed by `floor(ts / bucketMs)` and the
    * heavy running window partitions on (key, bucket) — bounded work per
    * partition, parallelism = #keys × #buckets. Cross-bucket history is
    * stitched with a carry: per (key, bucket) the latest right payload of
    * that bucket, then a running last-non-null across the bucket SPINE
    * (one row per (key, bucket) — thousands of rows, not billions) gives
    * each bucket the latest payload of all earlier buckets; a left row
    * falls back to that carry when its own bucket has no prior right row.
    * Row-for-row identical to [[lastValueBefore]] for any bucketMs.
    *
    * @param bucketMs bucket width — in milliseconds for timestamp ts
    *                 columns, in the column's own unit otherwise */
  def lastValueBeforeSalted(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            payloadCols: Seq[String],
                            bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val leftCols = left.columns.toSeq
    val unioned = taggedUnion(left, right, key, leftTs, rightTs, payloadCols,
      Seq("__bkt", "__in", "__carry", "__prev"))
    val bucketExpr = unioned.schema("__ts").dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        floor(unix_micros(col("__ts")) / lit(bucketMs * 1000.0))
      case _ => floor(col("__ts").cast("double") / lit(bucketMs.toDouble))
    }
    val withB = unioned.withColumn("__bkt", bucketExpr)
    // running last within (key, bucket): the same sort order as the plain
    // variant, restricted to the bucket — bounded partitions
    val wIn = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // latest right payload of the WHOLE bucket (constant per bucket)
    val wBkt = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val inb = withB
      .withColumn("__in", last(col("__payload"), ignoreNulls = true).over(wIn))
      .withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(wBkt))
    // bucket spine: one row per (key, bucket) — __carry is constant within
    // the bucket, so dropDuplicates picks a deterministic value
    val spine = inb.select(col(key), col("__bkt"), col("__carry"))
      .dropDuplicates(Seq(key, "__bkt"))
    val wPrev = Window.partitionBy(col(key)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = spine
      .withColumn("__prev", last(col("__carry"), ignoreNulls = true).over(wPrev))
      .select(col(key), col("__bkt"), col("__prev"))
    inb.where(col("__tag") === 1)
      .join(prev, Seq(key, "__bkt"), "left")
      .withColumn("__payload", coalesce(col("__in"), col("__prev")))
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
  }
}
