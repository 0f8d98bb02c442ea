package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.KinesisRecord

/** Custom arbitrary-state sessionization via `flatMapGroupsWithState` —
  * the engine's demonstration of the custom-state streaming API (the tier
  * beyond built-in `session_window`, for session logic the built-in can't
  * express: per-session record caps, custom close conditions, carried
  * aggregates).
  *
  * State per partition key: (session start, last event time, record
  * count). A record later than `gapMillis` after the last one closes the
  * session and emits it; processing-time timeout flushes idle sessions.
  * State size is O(active keys) — bounded by timeout eviction, the same
  * contract the reference's in-memory shard trackers rely on
  * (`KinesisThreadJobs.cs:381-382` activity flags).
  */
object StatefulSessions {
  case class SessionState(start: Long, lastTs: Long, n: Long)
  case class ClosedSession(partitionKey: String, sessionStart: Timestamp,
      sessionEnd: Timestamp, n: Long)

  /** The core session fold, shared by the v1 (`flatMapGroupsWithState`)
    * and v2 (`transformWithState`) operators so their gap semantics can
    * never silently diverge: records in arrival order extend the current
    * session within `gapMillis`, close it otherwise.
    *
    * Sorting bounds out-of-order WITHIN a batch; a late record from a
    * PREVIOUS batch folds with min/max — `lastTs` must never rewind, or
    * the late record shrinks the gap window and splits a live session
    * (and can emit sessionEnd earlier than already-folded activity).
    *
    * @return (open session after the batch, sessions closed by it)
    */
  def foldRecords(key: String, prior: Option[SessionState],
      rows: Iterator[KinesisRecord], gapMillis: Long)
      : (Option[SessionState], Seq[ClosedSession]) = {
    val sorted = rows.toSeq.sortBy(_.approximateArrivalTimestamp.getTime)
    var cur = prior
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { r =>
      val t = r.approximateArrivalTimestamp.getTime
      cur match {
        case Some(s) if t - s.lastTs <= gapMillis =>
          cur = Some(s.copy(start = math.min(s.start, t),
            lastTs = math.max(s.lastTs, t), n = s.n + 1))
        case Some(s) => // gap exceeded: close, start fresh
          closed += ClosedSession(key, new Timestamp(s.start),
            new Timestamp(s.lastTs), s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    (cur, closed.result())
  }

  /** @param idleTimeout when true, idle keys flush via processing-time
    *                     timeout — the production setting. Note the
    *                     timeout itself schedules new micro-batches, so
    *                     `processAllAvailable()` never quiesces with it
    *                     on; deterministic tests set false (sessions then
    *                     close only when a gap-exceeding record arrives).
    */
  def sessionize(records: Dataset[KinesisRecord], gapMillis: Long,
      spark: SparkSession, idleTimeout: Boolean = true)
      : Dataset[ClosedSession] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    records
      .groupByKey(_.partitionKey)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              ClosedSession(key, new Timestamp(s.start),
                new Timestamp(s.lastTs), s.n)).iterator
            state.remove()
            out
          } else {
            val (cur, closed) =
              foldRecords(key, state.getOption, rows, gapMillis)
            cur.foreach(state.update)
            if (idleTimeout) state.setTimeoutDuration(gapMillis)
            closed.iterator
          }
      }
  }
}
