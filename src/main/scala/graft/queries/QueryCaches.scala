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
  // ledger key = (sfDir, key) to match reg's scope (ADVICE r9: keying by
  // memo key alone merged build times across SF dirs when one session
  // iterates gateSfs, as the multi-SF specs do)
  private val buildSecs = TrieMap.empty[(String, String), Double]

  // —— bounded-lifetime discipline (r11 verdict #2) ————————————————
  // Caching every memo for the whole suite put the sf1mut working set
  // (signature + postings + n-gram tables TOGETHER) past an 8 GB heap —
  // on a cluster that's executor storage, but the discipline is wrong at
  // any scale: a memo's useful life is the contiguous run of queries in
  // its family. Suite drivers (Bench/Verify) call [[tick]] after each
  // query and [[evictStale]] to release memos no query touched for the
  // last `maxAge` queries. A released memo that a later query needs is
  // simply rebuilt — during that query's UNTIMED warmup, so per-query
  // bench rows stay post-memo — and its rebuild seconds accumulate in
  // the shared-build ledger like the first build.
  private val clock = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lastTouch =
    TrieMap.empty[(SparkSession, String, String), Long]

  /** Advance the suite clock — call once per completed query. */
  def tick(): Unit = clock.incrementAndGet()

  /** Unpersist and forget every memo whose last touch is more than
    * `maxAge` ticks old. Returns the released keys (for ledgers). */
  def evictStale(maxAge: Int): Seq[String] = {
    val now = clock.get()
    val stale = lastTouch.toSeq.collect {
      case (k, t) if now - t > maxAge => k
    }
    stale.foreach { k =>
      reg.remove(k).foreach(df =>
        try df.unpersist(false) catch { case _: Throwable => () })
      lastTouch.remove(k)
    }
    stale.map(_._3).sorted
  }

  // —— pressure valve (r12 verdict #4) ————————————————————————————
  // A fixed age bound is the fallback discipline; the signal a shared
  // cluster actually cares about is STORAGE-MEMORY pressure: when cached
  // blocks approach the storage pool's capacity, evicting our oldest
  // memos beats letting the block manager drop arbitrary blocks (it
  // evicts LRU *blocks*, stranding half-cached memos that then recompute
  // per partition instead of once).

  /** Fraction of executor storage memory in use, summed across the
    * cluster (local mode: the one block manager). 0.0 when the metric is
    * unavailable — the valve then simply never opens and the age bound
    * rules alone. */
  def storageUsedFraction(s: SparkSession): Double = {
    val st = s.sparkContext.getExecutorMemoryStatus.values
    val max = st.iterator.map(_._1).sum.toDouble
    val rem = st.iterator.map(_._2).sum.toDouble
    if (max <= 0) 0.0 else math.max(0.0, 1.0 - rem / max)
  }

  /** Live-heap fraction AFTER the last old-generation collection —
    * used/max of the tenured pool's collectionUsage, the JVM's own
    * "what actually survives GC" number. The storage metric alone
    * missed the r13 sf1mut crash mode: cached memos sat safely below
    * the storage high-water while EXECUTION buffers (window/join arrays
    * are heap, not storage-pool, in local mode) pushed the old gen over
    * the top — heap OOM with the valve closed. 0.0 when the pool or its
    * collection usage isn't exposed (then storage + age rules alone). */
  def heapAfterGcFraction(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getType == java.lang.management.MemoryType.HEAP &&
        p.getName.toLowerCase.contains("old"))
      .flatMap(p => Option(p.getCollectionUsage))
      .map(u => if (u.getMax > 0) u.getUsed.toDouble / u.getMax else 0.0)
      .foldLeft(0.0)(math.max)
  }

  /** Evict aggressively when memory pressure crosses `highWater`: every
    * memo older than `keepYoung` ticks goes (the current family's newest
    * memos survive, so the running query keeps its working set). The
    * production signal is the WORSE of storage-pool use and live-heap
    * after GC — either one near the top means the next fat window/join
    * task allocates into a full heap. Returns the released keys; Nil
    * when the valve stays closed. `usedFraction` is injectable so specs
    * can drive the pressure path without actually filling memory. */
  def evictOnPressure(s: SparkSession, highWater: Double = 0.70,
      keepYoung: Int = 3,
      usedFraction: SparkSession => Double =
        sess => math.max(storageUsedFraction(sess), heapAfterGcFraction()))
      : Seq[String] =
    if (usedFraction(s) > highWater) evictStale(keepYoung) else Nil

  /** Memoized cached DataFrame: builds + caches on first use per
    * (session, sfDir, key), returns the identical instance afterwards.
    *
    * Materialization is forced (and timed) HERE, not left to the first
    * caller's action: per-query bench rows otherwise charge whichever
    * query first touches a shared table with its build cost (r8 verdict:
    * q_eng_bfs_hops 7.9 s standalone vs 2.9 s in-suite — pure attribution
    * artifact). The cost lands in [[sharedBuilds]], which Bench emits as
    * its own `shared_builds` ledger; per-query rows then measure post-memo
    * work only.
    *
    * Concurrency: build-then-putIfAbsent instead of TrieMap
    * .getOrElseUpdate — two racing threads may both build, but the loser's
    * cached DataFrame is unpersisted immediately (ADVICE r9: the orphaned
    * loser was cached+counted and never released by [[clear]]) and only
    * the winner's build time lands in the ledger. */
  def memo(s: SparkSession, sfDir: String, key: String)
          (build: => DataFrame): DataFrame = {
    lastTouch.put((s, sfDir, key), clock.get())
    reg.get((s, sfDir, key)).getOrElse {
      val df = build.cache()
      val t0 = System.nanoTime()
      df.count() // populates the InMemoryRelation (all columns)
      val dt = (System.nanoTime() - t0) / 1e9
      reg.putIfAbsent((s, sfDir, key), df) match {
        case Some(winner) =>
          try df.unpersist(false) catch { case _: Throwable => () }
          winner
        case None =>
          buildSecs += ((sfDir, key) ->
            (buildSecs.getOrElse((sfDir, key), 0.0) + dt))
          df
      }
    }
  }

  /** Seconds spent materializing each memo key since the last [[clear]]
    * — the shared-build ledger Bench commits alongside per-query rows.
    * Keys rendered as "key" when one SF dir is in play (the Bench case)
    * would collide across SFs, so the label is "key@sfLeaf". */
  def sharedBuilds: Map[String, Double] =
    buildSecs.toMap.map { case ((sfDir, key), v) =>
      val leaf = sfDir.reverse.takeWhile(_ != '/').reverse
      s"$key@$leaf" -> v
    }

  /** Unpersist and forget every registered cache (non-blocking). */
  def clear(): Unit = {
    reg.values.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    reg.clear()
    buildSecs.clear()
    lastTouch.clear()
  }
}
