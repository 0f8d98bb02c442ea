package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Backoff

/** Oracle-checkable batch analogs of the reference's stateful/streaming
  * operators (SURVEY §2.6-2.7): checkpointing, after-sequence restart,
  * lease arbitration, batch caps, duplicate handling, backoff scheduling.
  *
  * `events` plays the Kinesis stream: `user_id` = shard/partition key,
  * `event_id` = sequence number, `ts` = approximate arrival timestamp.
  *
  * Scale note: every query here aggregates or windows BY THE PARTITION KEY —
  * on a real cluster these shuffle once on the natural key of the stream
  * (which a Kinesis source already delivers partitioned), and the
  * checkpoint side of joins is tiny (one row per shard) so it broadcasts.
  */
object StreamAnalogs {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ST1/ST2: checkpoint write — last committed sequence per shard
    // (`KinesisThreadJobs.cs:404-408` takes records.Last() per batch; over a
    // whole stream that is max(sequence) per shard).
    "ckpt_max_seq" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(col("event_id")).as("sequence_number"),
          date_format(date_trunc("second", max(col("ts"))),
            "yyyy-MM-dd HH:mm:ss").as("last_processed"))
        .orderBy("user_id")
    },
    // S4: AFTER_SEQUENCE_NUMBER restart — deliver strictly AFTER the
    // checkpoint (exclusive, `KinesisThreadJobs.cs:643`). Checkpoint per
    // shard = max sequence among even event_ids; broadcast the tiny
    // checkpoint side of the join.
    "ckpt_after_seq_restart" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val ckpt = ev.filter(col("event_id") % 2 === 0)
        .groupBy(col("user_id").as("ck_user"))
        .agg(max(col("event_id")).as("ckpt_seq"))
      ev.join(broadcast(ckpt), col("user_id") === col("ck_user"))
        .filter(col("event_id") > col("ckpt_seq"))
        .select(col("user_id"), col("event_id"))
        .orderBy("user_id", "event_id")
    },
    // ST4: lease winner — exactly one owner per shard; latest activity wins
    // (`KinesisCheckPointer.cs:18-95` arbitration, batch analog SURVEY §2.6).
    "lease_winner" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("lease_event"))
        .orderBy("user_id")
    },
    // ST10: batch size cap — first MaxRecordsPerRequest records per shard
    // (`KinesisThreadJobs.cs:351-355`, default `KinesisMessageQueue
    // .cs:153`). Runs on the engine's custom bounded-heap TopKPerKey
    // operator (graft.plans) — no per-partition sort, O(keys·k) memory —
    // while the DuckDB oracle pins it to the window formulation.
    "batch_cap_50" -> { (s, d) =>
      graft.plans.TopKPerKey.topKPerKey(
        Tables.events(s, d).select(col("user_id"), col("event_id")),
        keys = Seq("user_id"), order = Seq(("event_id", false)), k = 50)
        .orderBy("user_id", "event_id")
    },
    // ST8: at-least-once duplicate handling — redelivered records (here:
    // event_id < 100 delivered twice) collapse on the sequence key
    // (`dropDuplicates` analog of SURVEY §2.6 ST8).
    "dedup_redelivery" -> { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "event_id")
      val redelivered = ev.filter(col("event_id") < 100)
      ev.union(redelivered)
        .dropDuplicates("user_id", "event_id")
        .orderBy("user_id", "event_id")
    },
    // E1: deterministic backoff schedule — delay = min(5·2^attempt, 32) s
    // (`KinesisThreadJobs.cs:107-117,226`; jitter excluded, SURVEY §7.6).
    "backoff_schedule" -> { (s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey").as("attempt"),
          Backoff.delayCol(lit(5.0), col("n_nationkey")).as("delay_seconds"))
        .orderBy("attempt")
    },
    // Checkpoint composite id — `{stream}_{queue}_{shard}`
    // (`KinesisCheckPoint.cs:78`); scalar concat over the shard keys.
    "ckpt_composite_id" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("user_id")).distinct()
        .select(concat_ws("_", lit("events"), lit("q1"), col("user_id"))
          .as("checkpoint_id"))
        .orderBy("checkpoint_id")
    })

  val oracles: Map[String, String] = Map(
    "ckpt_max_seq" ->
      """SELECT user_id, max(event_id) AS sequence_number,
        |       strftime(date_trunc('second', max(ts)),
        |                '%Y-%m-%d %H:%M:%S') AS last_processed
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ckpt_after_seq_restart" ->
      """WITH ckpt AS (
        |  SELECT user_id AS ck_user, max(event_id) AS ckpt_seq
        |  FROM events WHERE event_id % 2 = 0 GROUP BY user_id)
        |SELECT e.user_id, e.event_id
        |FROM events e JOIN ckpt c ON e.user_id = c.ck_user
        |WHERE e.event_id > c.ckpt_seq
        |ORDER BY e.user_id, e.event_id""".stripMargin,
    "lease_winner" ->
      """SELECT user_id, event_id AS lease_event FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "batch_cap_50" ->
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY event_id) AS rn
        |  FROM events)
        |WHERE rn <= 50 ORDER BY user_id, event_id""".stripMargin,
    "dedup_redelivery" ->
      """SELECT DISTINCT user_id, event_id FROM (
        |  SELECT user_id, event_id FROM events
        |  UNION ALL
        |  SELECT user_id, event_id FROM events WHERE event_id < 100)
        |ORDER BY user_id, event_id""".stripMargin,
    "backoff_schedule" ->
      """SELECT n_nationkey AS attempt,
        |       least(5.0 * power(2.0, n_nationkey), 32.0) AS delay_seconds
        |FROM nation ORDER BY attempt""".stripMargin,
    "ckpt_composite_id" ->
      """SELECT concat_ws('_', 'events', 'q1', user_id) AS checkpoint_id
        |FROM (SELECT DISTINCT user_id FROM events)
        |ORDER BY checkpoint_id""".stripMargin)
}
