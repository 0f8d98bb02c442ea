package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Pairwise-preference aggregation — the curation step between raw
  * comparison data and a preference-trained model (RLHF reward modeling,
  * DPO pair selection, eval A/B judging). Raw preference data arrives as
  * MATCHES ("in this context, judge preferred A over B"); a pipeline
  * must aggregate millions of such matches into (a) a per-pair win-rate
  * matrix — the training signal for pairwise losses and the input to
  * Bradley–Terry fitting — and (b) a per-item ranking with win rates —
  * the leaderboard/filter signal. Both are exact integer arithmetic
  * (counts and one integer division onto the micro grid), so a SQL twin
  * hash-checks them.
  *
  * Matches here are derived deterministically from the events table:
  * within each (user, day) group, every pair of co-occurring events of
  * DIFFERENT types is a match, won by the higher `value` (ties go to the
  * lexicographically smaller type — a total, engine-portable rule). The
  * derivation stands in for a real judgment log; the aggregation below
  * it is the production operator.
  *
  * Shape at 100 TB: one (user, day)-keyed window caps each group to its
  * first `cap` events (skew guard — the [[Fingerprints]] cappedPairs
  * discipline: pair mass is cap²-bounded per group, never |group|²), the
  * self-join runs inside the capped groups, and everything downstream is
  * |types|²- then |types|-sized. The rank window at the end orders a
  * |types|-row frame — driver-scale by construction.
  */
object Preference {
  type Q = (SparkSession, String) => DataFrame

  /** (ta, tb, a_wins) match stream, ta < tb, capped per (user, day). */
  def matches(events: DataFrame, cap: Int = 16): DataFrame = {
    require(cap >= 2 && cap <= 1024,
      s"cap=$cap: per-group pair mass is cap² — keep it bounded")
    val day = expr("CAST(ts AS LONG) DIV 86400")
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val capped = events
      .select(col("user_id"), day.as("day"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("user_id"), col("day"), col("event_type"), col("value"))
    val a = capped.select(col("user_id"), col("day"),
      col("event_type").as("ta"), col("value").as("va"))
    val b = capped.select(col("user_id"), col("day"),
      col("event_type").as("tb"), col("value").as("vb"))
    a.join(b, Seq("user_id", "day"))
      .filter(col("ta") < col("tb"))
      .select(col("ta"), col("tb"), (col("va") >= col("vb")).as("a_wins"))
  }

  /** Win-rate matrix: one row per unordered type pair (ta < tb) with
    * match count, a's wins, and a's win rate on the exact micro grid
    * (integer division — no float touches the result).
    */
  def pairMatrix(events: DataFrame, cap: Int = 16): DataFrame =
    matches(events, cap).groupBy("ta", "tb")
      .agg(count(lit(1)).as("n"),
        sum(when(col("a_wins"), 1L).otherwise(0L)).as("wa"))
      .select(col("ta"), col("tb"), col("n"), col("wa"),
        expr("wa * 1000000 DIV n").as("pa_micro"))

  /** Per-type leaderboard: total matches, total wins, win rate (micro
    * grid), and dense leaderboard position (win rate desc, type asc —
    * total order). Win rate IS the one-MM-step Bradley–Terry estimate
    * from a uniform start (wᵢ′ = Wᵢ / Σⱼ nᵢⱼ/2 ∝ Wᵢ/Nᵢ), so the ranking
    * agrees with the first BT iteration without iterative float state.
    */
  def typeRank(events: DataFrame, cap: Int = 16): DataFrame = {
    val m = pairMatrix(events, cap)
    m.select(col("ta").as("event_type"), col("n"), col("wa").as("w"))
      .union(m.select(col("tb").as("event_type"), col("n"),
        (col("n") - col("wa")).as("w")))
      .groupBy("event_type")
      .agg(sum(col("n")).as("matches"), sum(col("w")).as("wins"))
      .select(col("event_type"), col("matches"), col("wins"),
        expr("wins * 1000000 DIV matches").as("winrate_micro"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("winrate_micro"), col("event_type")))
        .cast("long"))
  }

  val queries: Map[String, Q] = Map(
    "p_preference_pairs" -> { (s, d) =>
      pairMatrix(Tables.events(s, d)).orderBy("ta", "tb")
    },
    "p_preference_rank" -> { (s, d) =>
      typeRank(Tables.events(s, d)).orderBy("rnk")
    })

  // Shared match-derivation CTEs, mirrored from matches(): day bucket =
  // floored epoch seconds DIV 86400 (the w_retention idiom), cap = first
  // 16 events per (user, day) by (ts, event_id), ties to the smaller
  // type via >=. Every count/sum output is CAST to BIGINT (DuckDB
  // sum(BIGINT) is HUGEINT — the fenced red-row class).
  private val matchCtes =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      // 86400 AS day,
      |    ts, event_id, event_type, value
      |  FROM events),
      |capped AS (
      |  SELECT user_id, day, event_type, value FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY user_id, day ORDER BY ts, event_id) rn
      |    FROM ev) WHERE rn <= 16),
      |m AS (
      |  SELECT a.event_type ta, b.event_type tb,
      |    a.value >= b.value AS a_wins
      |  FROM capped a JOIN capped b
      |    ON a.user_id = b.user_id AND a.day = b.day
      |   AND a.event_type < b.event_type),
      |pm AS (
      |  SELECT ta, tb, CAST(count(*) AS BIGINT) n,
      |    CAST(sum(CASE WHEN a_wins THEN 1 ELSE 0 END) AS BIGINT) wa
      |  FROM m GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "p_preference_pairs" -> (matchCtes +
      """
        |SELECT ta, tb, n, wa, wa * 1000000 // n AS pa_micro
        |FROM pm ORDER BY ta, tb""".stripMargin),
    "p_preference_rank" -> (matchCtes +
      """,
        |per AS (
        |  SELECT event_type,
        |    CAST(sum(n) AS BIGINT) matches, CAST(sum(w) AS BIGINT) wins
        |  FROM (
        |    SELECT ta AS event_type, n, wa AS w FROM pm
        |    UNION ALL
        |    SELECT tb AS event_type, n, n - wa AS w FROM pm)
        |  GROUP BY 1)
        |SELECT event_type, matches, wins,
        |  wins * 1000000 // matches AS winrate_micro,
        |  CAST(row_number() OVER (
        |    ORDER BY wins * 1000000 // matches DESC, event_type)
        |    AS BIGINT) AS rnk
        |FROM per ORDER BY rnk""".stripMargin))
}
