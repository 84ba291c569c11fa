package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Explicit lifecycle for the cached projections shared across query
  * families (minhash signatures, simhash signatures, sign-LSH pair tables).
  *
  * Two problems this solves (both flagged in round-2 review):
  *
  *   1. Calling `.cache()` on a freshly-built identical plan per invocation
  *      makes CacheManager warn ("already cached") and leaves N cached
  *      copies' bookkeeping behind over a long session. Memoizing on
  *      (session, sfDir, key) returns the SAME DataFrame instance, so a
  *      suite run materializes each shared projection exactly once.
  *   2. Nothing ever unpersisted. [[clear]] releases every registered cache
  *      and is called by Bench/Verify after their suite runs — the cluster
  *      analogue of scoping persisted tables to the job that owns them.
  */
object QueryCaches {

  private val reg = TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Memoized cached DataFrame: builds + caches on first use per
    * (session, sfDir, key), returns the identical instance afterwards. */
  def memo(s: SparkSession, sfDir: String, key: String)
          (build: => DataFrame): DataFrame =
    reg.getOrElseUpdate((s, sfDir, key), build.cache())

  /** Unpersist and forget every registered cache (non-blocking). */
  def clear(): Unit = {
    reg.values.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    reg.clear()
  }
}
