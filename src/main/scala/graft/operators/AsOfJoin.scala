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
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    val reserved = Seq("__ts", "__tag", "__payload")
    val clashes = (leftCols ++ right.columns).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"input columns ${clashes.mkString(",")} collide with reserved working names " +
        s"${reserved.mkString(",")}")

    // The payload travels as ONE struct (non-null exactly on right rows),
    // so last(ignoreNulls) picks the latest right ROW atomically — a
    // per-column fill would skip a genuinely-null payload field and stitch
    // together values from different right rows.
    // tag 0 = right (sorts first at equal ts → <= semantics), tag 1 = left
    val taggedRight = right.select(
      col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        struct(payloadCols.map(col): _*).as("__payload") +:
        leftCols.filterNot(c => c == key).map(c => lit(null).as(c)): _*)
    val payloadType = taggedRight.schema("__payload").dataType
    val taggedLeft = left.select(
      col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        lit(null).cast(payloadType).as("__payload") +:
        leftCols.filterNot(c => c == key).map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
  }
}
