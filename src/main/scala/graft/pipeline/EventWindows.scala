package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time windowing (SURVEY §2.6 ST14 — [ABSENT] in the reference,
  * whose only time field is pass-through metadata; engine extension).
  *
  * Batch-checkable twins of the streaming operators: the same
  * `window`/`session_window` expressions run identically under
  * `readStream` + `withWatermark` (StreamingRuntime wires that path);
  * running them in batch lets the DuckDB oracle pin the bucketing and
  * session-merge semantics.
  */
object EventWindows {
  type Q = (SparkSession, String) => DataFrame

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  val queries: Map[String, Q] = Map(
    // tumbling 1-hour windows per event type
    "w_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.pipeline.TextAnalysis.roundHalfUp(sum(col("value")), 2)
            .as("total"))
        .select(fmt(col("w.start")).as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("window_start", "event_type")
    },
    // sliding 1-hour windows every 30 minutes (each event in 2 windows)
    "w_sliding" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(fmt(col("w.start")).as("window_start"), col("n"))
        .orderBy("window_start")
    },
    // session windows per user: 12-hour inactivity gap
    "w_session" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "12 hours").as("w"))
        .agg(count(lit(1)).as("n"),
          graft.pipeline.TextAnalysis.roundHalfUp(sum(col("value")), 2)
            .as("total"))
        .select(col("user_id"), fmt(col("w.start")).as("session_start"),
          col("n"), col("total"))
        .orderBy("user_id", "session_start")
    })

  val oracles: Map[String, String] = Map(
    "w_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |         AS window_start,
        |       event_type, count(*) AS n, floor(sum(value) * 100 + 0.5) / 100.0 AS total
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "w_sliding" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       count(*) AS n
        |FROM (
        |  SELECT unnest([
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |      - INTERVAL '30 minutes']) AS ws
        |  FROM events)
        |GROUP BY ws ORDER BY window_start""".stripMargin,
    "w_session" ->
      """WITH ordered AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN epoch(CAST(ts AS TIMESTAMP)
        |           - lag(CAST(ts AS TIMESTAMP)) OVER w) >= 43200
        |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |, sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM ordered)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n, floor(sum(value) * 100 + 0.5) / 100.0 AS total
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
