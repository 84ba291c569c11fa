package graft.operators

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame}

/** Contiguous sequence packing — assign documents to fixed token-budget
  * bins (pretraining batch assembly; builder-prompt extension surface).
  *
  * Semantics: documents are laid out in `orderCol` order and cut into bins
  * of `budget` tokens: a document's bin is `floor(exclusive_prefix_sum /
  * budget)`. Contiguous packing trades perfect bin fill for a single
  * deterministic pass (the greedy bin-covering alternative is inherently
  * sequential and order-sensitive); oversized documents simply span their
  * arithmetic share of the budget space.
  *
  * Scale shape mirrors [[StableIds]]: the naive
  * `sum() OVER (ORDER BY …)` running total forces every row through ONE
  * window partition — a non-starter at 100 TB. Instead: range-partition by
  * the ordering key, per-partition token totals (one tiny job — #partitions
  * longs to the driver), offsets broadcast back, then a map-side
  * in-partition scan. Identical output to the window formulation for a
  * unique ordering key, independent of partition boundaries (offsets
  * compensate wherever the range cut lands).
  */
object Packing {

  /** Append `binCol` = floor(exclusive running token total / budget) in
    * `orderCol` order. `tokensCol` must be non-negative; `orderCol` unique
    * for a deterministic layout. */
  def packByBudget(df: DataFrame, orderCol: Column, tokensCol: Column,
                   budget: Long, binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains(binCol), s"column '$binCol' already exists")
    val tok = "__pack_toks"
    require(!df.columns.contains(tok), s"column '$tok' is reserved")
    val spark = df.sparkSession
    val sorted = df.withColumn(tok, tokensCol.cast("long"))
      .repartitionByRange(orderCol)
      .sortWithinPartitions(orderCol)
    val tokIdx = sorted.schema.fieldIndex(tok)
    // Both passes MUST observe one materialized partitioning. Planning the
    // per-partition totals from a separate narrow projection
    // (`sorted.select(tok).rdd`) lets AQE coalesce the two range shuffles to
    // DIFFERENT partition counts (the tok-only plan is smaller), so the
    // offsets array goes out of sync with the data pass — observed as an
    // ArrayIndexOutOfBounds at sf1. Converting to an RDD once pins the
    // partition count and range cuts; pass 2 then reuses pass 1's shuffle
    // files rather than re-shuffling.
    //
    // InternalRow level (opt r14, guide §4 / VERDICT r13 #4): `.rdd`
    // deserialized every row to an external Row in both passes; `toRdd`
    // reads the unsafe rows in place, and the value pass appends the bin
    // via a JoinedRow the downstream scan node projects to unsafe format.
    val rdd = sorted.queryExecution.toRdd
    // pass 1: per-partition token totals → exclusive partition offsets
    val totals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(tokIdx))
        Iterator((pid, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    // pass 2: in-partition scan with the broadcast offset
    val outSchema = StructType(sorted.schema.fields :+
      StructField(binCol, LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { r =>
        extra.update(0, run / budget)
        run += r.getLong(tokIdx)
        // safe to reuse r/extra: the scan node's per-row unsafe projection
        // copies before this iterator advances (row-at-a-time pipeline)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.GraftColumnBridge
      .internalCreateDataFrame(spark, rows, outSchema)
      .drop(tok)
  }
}
