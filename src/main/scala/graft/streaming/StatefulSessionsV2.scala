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
  class SessionProcessor(gapMillis: Long, timers: Boolean)
    extends StatefulProcessor[String, KinesisRecord, ClosedSession] {

    @transient private var state: org.apache.spark.sql.streaming
      .ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[KinesisRecord],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(_.approximateArrivalTimestamp.getTime)
      var cur = if (state.exists()) Some(state.get()) else None
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { r =>
        val t = r.approximateArrivalTimestamp.getTime
        cur match {
          case Some(s) if t - s.lastTs <= gapMillis =>
            cur = Some(s.copy(lastTs = t, n = s.n + 1))
          case Some(s) => // gap exceeded: close, start fresh
            closed += ClosedSession(key, new Timestamp(s.start),
              new Timestamp(s.lastTs), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach(state.update)
      if (timers)
        getHandle.registerTimer(
          timerValues.getCurrentProcessingTimeInMs() + gapMillis)
      closed.result().iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator(ClosedSession(key, new Timestamp(s.start),
          new Timestamp(s.lastTs), s.n))
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
