package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ExpiredTimerInfo}

import graft.model.KinesisRecord
import graft.streaming.StatefulSessions.{ClosedSession, SessionState}

/** Sessionization on Spark 4's `transformWithState` — the successor of
  * `flatMapGroupsWithState` ([[StatefulSessions]] keeps the v1 form for
  * comparison): typed `ValueState` handles, per-key timers, optional
  * state TTL, and the RocksDB state-store backend. Same session semantics
  * (gap close + timer flush), same output type, so StatefulSessionSpec
  * asserts the two implementations agree record-for-record.
  *
  * Scale note: transformWithState REQUIRES the RocksDB state store
  * provider (`spark.sql.streaming.stateStore.providerClass` =
  * ...RocksDBStateStoreProvider), which is also what unbounded key
  * cardinality needs at 100 TB — state spills off-heap/to disk instead
  * of living in executor heap like the default HDFS-backed store.
  */
object StatefulSessionsV2 {

  /** @param timers when true, per-key processing-time timers flush idle
    *               sessions (production). Timer firings schedule new
    *               micro-batches, so deterministic tests pass false —
    *               sessions then close only on a gap-exceeding record,
    *               exactly like the v1 `idleTimeout=false` mode.
    */
  /** v2 state: the session itself plus the PROCESSING-time of the last
    * activity — timers live in the processing-time domain, session bounds
    * in event time; conflating them would misjudge idleness.
    */
  case class SessionStateV2(start: Long, lastTs: Long, n: Long,
      lastActiveProcMs: Long)

  class SessionProcessor(gapMillis: Long, timers: Boolean)
    extends StatefulProcessor[String, KinesisRecord, ClosedSession] {

    @transient private var state: org.apache.spark.sql.streaming
      .ValueState[SessionStateV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionStateV2]("session",
        Encoders.product[SessionStateV2], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[KinesisRecord],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val now = timerValues.getCurrentProcessingTimeInMs()
      val prior =
        if (state.exists()) {
          val v = state.get()
          Some(SessionState(v.start, v.lastTs, v.n))
        } else None
      val (cur, closed) =
        StatefulSessions.foldRecords(key, prior, rows, gapMillis)
      cur.foreach(s =>
        state.update(SessionStateV2(s.start, s.lastTs, s.n, now)))
      if (timers) {
        // timers are ADDITIVE (unlike v1's single resettable timeout):
        // drop the stale ones before registering the fresh deadline, or
        // an earlier timer fires mid-session
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(now + gapMillis)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (state.exists()) {
        val s = state.get()
        val now = timerValues.getCurrentProcessingTimeInMs()
        if (now - s.lastActiveProcMs >= gapMillis) {
          // genuinely idle in the processing-time domain: flush
          state.clear()
          Iterator(ClosedSession(key, new Timestamp(s.start),
            new Timestamp(s.lastTs), s.n))
        } else {
          // a stale timer outlived newer activity (e.g. restored from an
          // old checkpoint): re-arm for the remaining idle window
          getHandle.registerTimer(s.lastActiveProcMs + gapMillis)
          Iterator.empty
        }
      } else Iterator.empty
  }

  def sessionize(records: Dataset[KinesisRecord], gapMillis: Long,
      spark: SparkSession, timers: Boolean = true)
      : Dataset[ClosedSession] = {
    import spark.implicits._
    val timeMode =
      if (timers) TimeMode.ProcessingTime() else TimeMode.None()
    records
      .groupByKey(_.partitionKey)
      .transformWithState(new SessionProcessor(gapMillis, timers),
        timeMode, OutputMode.Append())
  }
}
