package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Pin the parallelism of an expansion-heavy pipeline at
  * `spark.sql.shuffle.partitions`.
  *
  * Two planner blind spots serialize pipelines whose ROW COUNT grows far
  * beyond their input bytes (deletion-variant / band / n-gram explodes
  * feeding candidate self-joins):
  *
  *   1. AQE partition coalescing sizes a stage by its post-shuffle BYTES
  *      and is blind to downstream fan-out. A vocabulary-sized exchange
  *      (~300 KB for 39k words) falls below
  *      `spark.sql.adaptive.coalescePartitions.minPartitionSize` (1 MB),
  *      so AQE coalesces it to ONE partition — and the variant explode,
  *      the 20M-row candidate join, the verify predicate, and the pair
  *      distinct that all live BELOW that exchange inherit the single
  *      task. Measured on the sf1m fixture: the fuzzy vocabulary join ran
  *      128 s serialized vs 12 s with its parallelism pinned — the system
  *      load trace (Bench's per-query `load` field) is the tell, ~1.5 on
  *      a 32-core box while the query ran.
  *   2. A single-row-group parquet file gives the scan stage exactly one
  *      split regardless of `spark.sql.files.maxPartitionBytes`, so
  *      per-row-HEAVY derivations projected straight over the scan
  *      (minhash banks: k·|shingles| md5 calls per doc; signature
  *      explodes) run serial before the first exchange ever happens.
  *
  * `repartition(n, ...)` emits a REPARTITION_BY_NUM shuffle, which AQE
  * never coalesces (only ENSURE_REQUIREMENTS and REPARTITION_BY_COL
  * origins are eligible), so everything below keeps n-way parallelism.
  *
  * Keyed vs round-robin:
  *   - pass `keys` when a downstream aggregate/join needs clustering on
  *     them — the pinned hashpartitioning satisfies that distribution, so
  *     Catalyst inserts no follow-up (coalescible) exchange. Note a keyed
  *     pin takes the stage out of AQE's skew-join splitting; use it when
  *     the key domain is balanced (band ids, hashed words), not for keys
  *     with genuine heavy hitters.
  *   - no keys = round-robin: skew-proof row spreading for
  *     broadcast-probe pipelines and for parallelizing per-row-heavy
  *     projections above a mono-split scan.
  *
  * Cost: one shuffle of the PRE-expansion rows — metadata-scale relative
  * to the fan-out it parallelizes. On a 1000-executor cluster the same
  * call is what you would write by hand before any candidate-generation
  * join; locally it is what makes the single-file fixture behave like the
  * many-split layout a real corpus has.
  */
object Fanout {

  def pin(df: DataFrame, keys: Column*): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (keys.isEmpty) df.repartition(n) else df.repartition(n, keys: _*)
  }
}
