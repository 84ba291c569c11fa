package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the storage-side shuffle eliminator.
  *
  * `repartition()` co-locates a join for ONE job; bucketing bakes the
  * hash-partitioning into the TABLE so every subsequent job gets the
  * co-location for free: a join or aggregation keyed on the bucket
  * column of two same-bucketed, same-count tables plans with ZERO
  * ShuffleExchangeExec (Catalyst recognizes the child distribution as
  * HashClusteredDistribution-satisfying), and `sortBy` additionally
  * removes the SortMergeJoin's per-task sort. At 100 TB this is the
  * difference between re-shuffling a fact table on every one of N
  * downstream joins and shuffling it once at write time — the pattern
  * the fact/dimension pipelines (orders ⋈ lineitem on orderkey,
  * postings ⋈ postings on term — see InvertedIndex's Scaladoc) are
  * written for.
  *
  * Knobs, and how to set them at corpus size:
  *   - `buckets`: files-per-table = buckets × written-partitions, and a
  *     downstream task reads one bucket — size buckets so a bucket is
  *     ~128–512 MB (e.g. 4096 buckets for a 1 TB table). BOTH join
  *     sides must use the same count (or a multiple, with
  *     spark.sql.bucketing.coalesceBucketsInJoin.enabled).
  *   - `sortBy` the join key: the bucketed SMJ then streams pre-sorted
  *     runs (no per-task sort, no spill) — the right default.
  *
  * Bucketed tables are catalog objects (`saveAsTable` — bucket metadata
  * lives in the metastore, not in parquet), so readers go through
  * `spark.table(name)`; a plain path read would scan the same files but
  * lose the distribution contract. BucketingSpec pins the zero-exchange
  * plan, the negative control (the identical unbucketed join plans 2
  * exchanges), and value-equality between the two paths. */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) managed parquet table.
    * True overwrite: drops any existing table AND clears an orphaned
    * default-location directory — a fresh metastore (e.g. a new local
    * session against a reused warehouse dir) otherwise refuses the name
    * with LOCATION_ALREADY_EXISTS even under SaveMode.Overwrite. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sorted: Boolean = true): Unit = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Read a bucketed table back with its distribution contract intact. */
  def readBucketed(s: SparkSession, table: String): DataFrame = s.table(table)
}
