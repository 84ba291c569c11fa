package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast for data-scaled small sides (opt r14, VERDICT r13
  * "What's wrong" #2).
  *
  * An explicit `broadcast()` hint OVERRIDES Catalyst's size estimation and
  * is honored all the way to the 8 GB / 512M-row broadcast hard limit — a
  * vertex/label/marginal table that outgrows the driver does not "degrade
  * to a shuffle join", it kills the query. The pattern that actually
  * degrades is [[graft.text.Dsir.weights]]' broadcast ceiling: measure the
  * small side once and PICK the strategy. Rows, not bytes, because every
  * gated table in this engine is a narrow fixed-width frame (a node id
  * plus one or two longs ≈ 16–24 B hydrated per row): 2^24 rows ≈ 400 MB —
  * the same "edge of a sane executor broadcast" calculus as
  * `Dsir.BroadcastCeiling`, far below the 512M-row hard cap.
  *
  * Past the ceiling the small side is hinted `shuffle_hash` instead: the
  * big side then shuffles (that IS the degradation — unavoidable once the
  * build side is too big for every executor), but neither side pays a
  * sort, and the explicit hint pins the strategy so Catalyst's estimate
  * cannot re-broadcast a table the gate has ruled too big (the Dsir
  * rationale).
  *
  * The count is one job; call sites either reuse a count they already
  * need, or count a frame that is localCheckpoint'ed anyway (a lazy
  * checkpoint materializes inside the counting job, so the gate adds one
  * small job dispatch, never a recomputation).
  */
object BroadcastGate {

  /** Largest row count the gate will broadcast — Dsir.BroadcastCeiling's
    * calculus (~400 MB hydrated at ≤ 24 B/row). */
  val CeilingRows: Long = 1L << 24

  /** Gate on a pre-computed row count — one count per query, its decision
    * reused across every join that attaches the same-sized frame. */
  def apply(df: DataFrame, rows: Long,
            ceilingRows: Long = CeilingRows): DataFrame =
    if (rows <= ceilingRows) broadcast(df) else df.hint("shuffle_hash")

  /** Count-and-gate. The frame must be materialized (localCheckpoint'ed /
    * cached) or cheap, or the count re-executes its lineage. */
  def counted(df: DataFrame, ceilingRows: Long = CeilingRows): DataFrame =
    apply(df, df.count(), ceilingRows)
}
