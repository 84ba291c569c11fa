package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** One input event for sessionization (event-time in `ts`). */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Open-session accumulator kept in the state store (epoch millis). */
final case class SessionAcc(start_ms: Long, end_ms: Long, n: Long)

/** One closed session. */
final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                             session_end: java.sql.Timestamp, n_events: Long)

/** Gap-based sessionization via `flatMapGroupsWithState` — the custom
  * stateful-streaming surface (builder-prompt extension; the reference has
  * no streaming at all, SURVEY.md §2.10).
  *
  * Scale shape: state is one small record per active user key, partitioned
  * by the grouping key across executors; event-time timeouts tied to the
  * watermark close idle sessions and *remove* their state, so state size
  * tracks concurrently-active users, not history.
  */
object Sessionize {

  /** Sessions closed either by a later event arriving after more than
    * `gapMs`, or by the event-time watermark passing the open session's
    * timeout. Input stream must have a watermark on `ts`. */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(user, s))
          } else {
            val out = ArrayBuffer[UserSession]()
            var acc = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              acc match {
                case Some(a) if t - a.end_ms <= gapMs =>
                  acc = Some(SessionAcc(a.start_ms, math.max(a.end_ms, t), a.n + 1))
                case Some(a) =>
                  out += close(user, a)
                  acc = Some(SessionAcc(t, t, 1))
                case None =>
                  acc = Some(SessionAcc(t, t, 1))
              }
            }
            acc.foreach { a =>
              state.update(a)
              // setTimeoutTimestamp rejects (killing the query) any timeout
              // not strictly later than the current watermark. Spark 4's
              // FlatMapGroupsWithStateExec drops input rows older than the
              // watermark before they reach this function (verified
              // empirically), so end_ms + gapMs <= watermark needs the
              // boundary case (event AT the watermark with a zero-ish gap)
              // — clamp to watermark+1 so that case, and any future change
              // to the late-row admission policy, degrades to "close on
              // next trigger" instead of a query crash
              val floor = state.getCurrentWatermarkMs() + 1
              state.setTimeoutTimestamp(math.max(a.end_ms + gapMs, floor))
            }
            out.iterator
          }
      }
  }

  private def close(user: Long, a: SessionAcc): UserSession =
    UserSession(user, new java.sql.Timestamp(a.start_ms),
      new java.sql.Timestamp(a.end_ms), a.n)
}
