package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 (plus
  * the training-data extension operators); `oracleSql` carries the DuckDB
  * twin for every SQL-expressible entry. Column aliases match pairwise, and
  * both sides order by a unique key so the hash compare is order-safe.
  */
object SparkEntry {

  /** Flagship query (the reference's richest path: DSL filter → projection →
    * stratified exact-k sample) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("q_sample_filtered_strat")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      EngineQueries.queries ++ AnalyticsQueries.queries ++ EvalQueries.queries ++
      DataQualityQueries.queries ++ StatsQueries.queries ++
      MonitorQueries.queries ++ StreamTwinQueries.queries ++
      PipelineQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      EngineQueries.oracleSql ++ AnalyticsQueries.oracleSql ++ EvalQueries.oracleSql ++
      DataQualityQueries.oracleSql ++ StatsQueries.oracleSql ++
      MonitorQueries.oracleSql ++ StreamTwinQueries.oracleSql ++
      PipelineQueries.oracleSql
}
