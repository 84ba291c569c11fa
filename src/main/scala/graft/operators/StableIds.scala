package graft.operators

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Stable global row-id assignment — a training-data-pipeline staple
  * (shard-stable example ids), built the scalable way.
  *
  * The naive `row_number() OVER (ORDER BY …)` forces ALL rows through a
  * single partition — a non-starter at 100 TB. This operator instead
  * range-partitions by the ordering key, sorts within partitions, and uses
  * RDD `zipWithIndex` (one extra job to count per-partition sizes, then
  * offsets are added map-side) — two passes, fully parallel, identical
  * ids to the window formulation when the ordering key is unique.
  */
object StableIds {

  /** Append a dense 0-based `id` column following `orderCols` order.
    * Requires a unique ordering key for a deterministic assignment. */
  def assignIds(df: DataFrame, orderCols: Seq[Column],
                idCol: String = "id"): DataFrame = {
    require(!df.columns.contains(idCol), s"column '$idCol' already exists")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}
