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

  /** (ta, tb, a_wins, ea, eb) match stream, ta < tb, capped per
    * (user, day). (ea, eb) are the two participating event ids — a
    * globally-unique match identity the bootstrap tier keys its
    * deterministic resample weights on.
    */
  /** The shared capped-group derivation: first `cap` events per
    * (user, day) by (ts, event_id) — the skew guard every match-derived
    * tier rides.
    */
  private def cappedEvents(events: DataFrame, cap: Int): DataFrame = {
    require(cap >= 2 && cap <= 1024,
      s"cap=$cap: per-group pair mass is cap² — keep it bounded")
    // FLOOR division onto days (the packSequences pmod idiom): Spark's
    // DIV truncates toward zero while the DuckDB twin's `//` floors
    // (and CAST(ts AS LONG) truncates pre-epoch fractional seconds
    // where the twin's floor(epoch(ts)) floors them), so the bucket is
    // computed straight on microseconds — subtracting the always-non-
    // negative pmod makes the quotient exact and floor-consistent on
    // both engines for ALL timestamps, pre-epoch included.
    val day = graft.TimeBuckets.epochDay()
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), day.as("day"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("user_id"), col("day"), col("event_id"),
        col("event_type"), col("value"))
  }

  /** The in-group pair product over [[cappedEvents]], values retained:
    * (ta, tb, va, vb, ea, eb) with ta < tb.
    */
  private def pairProduct(events: DataFrame, cap: Int): DataFrame = {
    val capped = cappedEvents(events, cap)
    val a = capped.select(col("user_id"), col("day"),
      col("event_type").as("ta"), col("value").as("va"),
      col("event_id").as("ea"))
    val b = capped.select(col("user_id"), col("day"),
      col("event_type").as("tb"), col("value").as("vb"),
      col("event_id").as("eb"))
    a.join(b, Seq("user_id", "day"))
      .filter(col("ta") < col("tb"))
      .select(col("ta"), col("tb"), col("va"), col("vb"), col("ea"),
        col("eb"))
  }

  def matches(events: DataFrame, cap: Int = 16): DataFrame =
    pairProduct(events, cap)
      .select(col("ta"), col("tb"), (col("va") >= col("vb")).as("a_wins"),
        col("ea"), col("eb"))

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

  /** Uncertainty-aware leaderboard: a Poisson-bootstrap CI around each
    * type's win rate — the Chatbot-Arena-style question "is A's lead
    * over B statistical or noise?" answered the way a distributed scan
    * can (see [[Agreement.bootstrapCi]] for the Poissonization
    * argument). Each MATCH draws a deterministic Poisson(1) weight per
    * replicate (5 md5 nibbles of its (ea, eb, replicate) identity
    * through the ⌊F(k)·16⁵⌋ thresholds — one draw per match, applied
    * to BOTH its participants, as resampling a match means resampling
    * the whole comparison); per (type, replicate) the win rate is an
    * integer-sum ratio on the micro grid, and the CI is the
    * rank-selected discrete 5th/95th replicate value per type.
    *
    * Shape at scale: the match×64 explode collapses map-side into the
    * (|types|·64)-row replicate frame; the rank windows partition by
    * type over 64 rows each; the true-rate table joins back on the
    * |types|-sized key (broadcast). Empty replicates (a type whose
    * matches all draw weight 0) surface as rate 0 — deterministic and
    * mirrored in the twin; real corpora never produce one (P ≈
    * 0.368^matches).
    */
  def rankCi(events: DataFrame, cap: Int = 16, reps: Int = 64): DataFrame = {
    require(reps >= 20 && reps <= 4096,
      s"reps=$reps: the replicate frame is window-ranked, keep it small")
    val thresholds = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L,
      1047952L)
    val m = matches(events, cap)
    val ex = m.select(col("ta"), col("tb"), col("a_wins"), col("ea"),
        col("eb"), explode(sequence(lit(0), lit(reps - 1))).as("b0"))
      .select(col("ta"), col("tb"), col("a_wins"), col("ea"), col("eb"),
        col("b0").cast("long").as("b"))
    val h = conv(substring(md5(concat(col("ea").cast("string"), lit(":"),
      col("eb").cast("string"), lit(":"), col("b").cast("string"),
      lit(":psci"))), 1, 5), 16, 10).cast("long")
    val weighted = ex.select(col("ta"), col("tb"), col("a_wins"),
      col("b"), thresholds.map(t => when(h >= t, 1L).otherwise(0L))
        .reduce(_ + _).as("w"))
    // each side row carries the weighted AND unweighted win indicator,
    // so the TRUE totals fall out of the same single aggregation (every
    // replicate group sees the full unweighted match set — max over b
    // recovers it; a second matches() lineage would scan events twice)
    val sides = weighted.select(col("ta").as("event_type"), col("b"),
        col("w"), (col("w") * when(col("a_wins"), 1L).otherwise(0L))
          .as("ww"), when(col("a_wins"), 1L).otherwise(0L).as("uw"))
      .union(weighted.select(col("tb").as("event_type"), col("b"),
        col("w"), (col("w") * when(col("a_wins"), 0L).otherwise(1L))
          .as("ww"), when(col("a_wins"), 0L).otherwise(1L).as("uw")))
    val rep = sides.groupBy("event_type", "b")
      .agg(sum(col("w")).as("n"), sum(col("ww")).as("wins"),
        count(lit(1)).as("mt"), sum(col("uw")).as("wt"))
      .select(col("event_type"), col("b"), col("mt"), col("wt"),
        when(col("n") === 0L, 0L)
          .otherwise(expr("wins * 1000000 DIV n")).as("rate"))
    val lo = math.ceil(0.05 * reps).toInt
    val hi = math.ceil(0.95 * reps).toInt
    rep.withColumn("r", row_number().over(
        Window.partitionBy("event_type").orderBy(col("rate"), col("b"))))
      .groupBy("event_type")
      .agg(max(col("mt")).as("matches"),
        expr("max(wt) * 1000000 DIV max(mt)").as("winrate_micro"),
        max(when(col("r") === lo, col("rate"))).as("lo_micro"),
        max(when(col("r") === hi, col("rate"))).as("hi_micro"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("winrate_micro"), col("event_type")))
        .cast("long"))
  }

  /** Full Bradley–Terry strength fitting by minorization–maximization
    * (Hunter 2004) — the iterative model behind Chatbot-Arena-style
    * leaderboards, completing the preference family: [[typeRank]] is
    * the one-MM-step estimate; this runs `rounds` full updates
    *
    *   wᵢ′ ∝ Wᵢ / Σ_{j≠i} nᵢⱼ/(wᵢ+wⱼ)
    *
    * on the 1e-6 integer grid (the round-10 trainer discipline): every
    * term floors to an integer before summing, the renormalization is
    * one integer division, so the DuckDB twin replays the loop
    * unrolled and hash-matches — no float enters the fit at all (BT
    * needs no exp/log: the MM update is a pure rational function).
    *
    * Shape at 100 TB: the aggregation to the win-rate matrix is
    * [[pairMatrix]] (capped match derivation, |types|²-bounded
    * output); the MM loop itself runs on the driver over that bounded
    * matrix — the doremiWeights discipline (require-guarded ≤1000
    * types; integer products require-guarded under 2⁶³).
    */
  def bradleyTerry(events: DataFrame, cap: Int = 16,
      rounds: Int = 5): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val pm = pairMatrix(events, cap)
      .select(col("ta"), col("tb"), col("n"), col("wa"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val types = pm.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    require(types.length <= 1000,
      s"${types.length} types: the MM state is driver-held and only " +
        "safe for a coarse type column")
    // a match-free input fits nothing: empty result, like the sibling
    // tiers (and the oracle SQL), never a require crash
    if (types.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("bt_micro",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rnk",
            org.apache.spark.sql.types.LongType))))
    val total = pm.map(_._3).sum
    require(total <= 8000000000000L,
      s"$total matches: Wᵢ·10⁶ must stay under 2⁶³ — shrink cap or " +
        "pre-aggregate")
    val n = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val wins = scala.collection.mutable.Map(types.map(_ -> 0L).toSeq: _*)
    pm.foreach { case (a, b, nn, wa) =>
      n((a, b)) += nn; n((b, a)) += nn
      wins(a) += wa; wins(b) += nn - wa
    }
    var w = types.map(_ -> 1000000L / types.length).toMap
    for (_ <- 1 to rounds) {
      val d = types.map { i =>
        i -> types.collect { case j if j != i && n((i, j)) > 0 =>
          (n((i, j)) * 1000000L) / (w(i) + w(j))
        }.sum
      }.toMap
      val raw = types.map { i =>
        i -> (if (d(i) == 0L) 0L else (wins(i) * 1000000L) / d(i))
      }.toMap
      val z = math.max(1L, raw.values.sum)
      // 1-micro floor: integer renormalization can round a chronic
      // loser's weight to 0, and a later round would divide by
      // w(i)+w(j)=0 for a zero-zero head-to-head — the floor keeps
      // every denominator positive at a ≤1e-6 distortion of the fit
      // (mirrored in the oracle's btRound)
      w = types.map(i =>
        i -> math.max(1L, (raw(i) * 1000000L) / z)).toMap
    }
    types.toSeq.map(t => (t, w(t))).toDF("event_type", "bt_micro")
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("bt_micro"), col("event_type"))).cast("long"))
  }

  /** DPO training-pair construction — the per-example materialization
    * the aggregate tiers above feed on: one (chosen, rejected) row per
    * match, oriented by the winner rule (higher value wins, ties to the
    * lexicographically smaller type — [[matches]]' exact convention),
    * with the preference margin on the 1e-6 integer grid (floored —
    * abs/sub/mul/floor are order-pinned IEEE ops, the round4HalfUp
    * float contract, so the twin reproduces the integer exactly).
    *
    * The curation knob is PER-CELL BALANCING: a real judgment log is
    * dominated by a few hot comparison types, and a DPO set sampled
    * uniformly would teach mostly those; capping each
    * (chosen_type, rejected_type) cell at `perCell` examples in
    * deterministic md5 order balances the grid. The cap runs through
    * the engine's bounded-heap [[graft.plans.TopKPerKey]] — a hot cell
    * is never fully sorted, the heap sees cap² match rows per (user,
    * day) group and keeps `perCell` per cell.
    *
    * Shape at 100 TB: match derivation is the capped pair product
    * (cap²-bounded per group); the balance cap is one TopKPerKey over
    * the |types|²-keyed stream; output is |types|²·perCell rows —
    * driver-scale by construction.
    */
  def dpoDataset(events: DataFrame, cap: Int = 16,
      perCell: Int = 8): DataFrame = {
    require(perCell >= 1 && perCell <= 10000,
      s"perCell=$perCell: the output is |types|²·perCell — keep it bounded")
    import graft.syntax._
    val m = pairProduct(events, cap)
    val aWins = col("va") >= col("vb")
    val oriented = m.select(
      when(aWins, col("ta")).otherwise(col("tb")).as("chosen_type"),
      when(aWins, col("tb")).otherwise(col("ta")).as("rejected_type"),
      when(aWins, col("ea")).otherwise(col("eb")).as("chosen_event"),
      when(aWins, col("eb")).otherwise(col("ea")).as("rejected_event"),
      floor(abs(col("va") - col("vb")) * lit(1000000))
        .cast("long").as("margin_micro"),
      md5(concat(col("ea").cast("string"), lit(":"),
        col("eb").cast("string"), lit(":dpo"))).as("hkey"),
      col("ea"), col("eb"))
    oriented
      .graftTopKPerKey(Seq("chosen_type", "rejected_type"),
        Seq(("hkey", false), ("ea", false), ("eb", false)), perCell)
      .select(col("chosen_type"), col("rejected_type"),
        col("chosen_event"), col("rejected_event"), col("margin_micro"))
  }

  val queries: Map[String, Q] = Map(
    "p_preference_pairs" -> { (s, d) =>
      pairMatrix(Tables.events(s, d)).orderBy("ta", "tb")
    },
    // per-cell-balanced DPO example table (8 per comparison cell)
    "p_dpo_dataset" -> { (s, d) =>
      dpoDataset(Tables.events(s, d))
        .orderBy("chosen_type", "rejected_type", "chosen_event",
          "rejected_event")
    },
    // full Bradley–Terry MM fit (5 rounds) on the integer micro grid —
    // oracle-backed from birth (unrolled-round twin); typeRank remains
    // the cheap one-step estimate
    "p_bradley_terry" -> { (s, d) =>
      bradleyTerry(Tables.events(s, d)).orderBy("rnk")
    },
    "p_preference_rank" -> { (s, d) =>
      typeRank(Tables.events(s, d)).orderBy("rnk")
    },
    // uncertainty-aware leaderboard: Poisson-bootstrap CI per win rate
    "a_preference_ci" -> { (s, d) =>
      rankCi(Tables.events(s, d)).orderBy("rnk")
    })

  // Shared match-derivation CTEs, mirrored from matches(): day bucket =
  // floored epoch seconds DIV 86400 (the w_retention idiom), cap = first
  // 16 events per (user, day) by (ts, event_id), ties to the smaller
  // type via >=. Every count/sum output is CAST to BIGINT (DuckDB
  // sum(BIGINT) is HUGEINT — the fenced red-row class).
  private def matchCtesWith(extraMatchCols: String): String =
    s"""WITH ev AS (
       |  SELECT user_id,
       |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
       |      // 86400 AS day,
       |    ts, event_id, event_type, value
       |  FROM events),
       |capped AS (
       |  SELECT user_id, day, event_id, event_type, value FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY user_id, day ORDER BY ts, event_id) rn
       |    FROM ev) WHERE rn <= 16),
       |m AS (
       |  SELECT a.event_type ta, b.event_type tb,
       |    a.value >= b.value AS a_wins,$extraMatchCols
       |    a.event_id ea, b.event_id eb
       |  FROM capped a JOIN capped b
       |    ON a.user_id = b.user_id AND a.day = b.day
       |   AND a.event_type < b.event_type),
       |pm AS (
       |  SELECT ta, tb, CAST(count(*) AS BIGINT) n,
       |    CAST(sum(CASE WHEN a_wins THEN 1 ELSE 0 END) AS BIGINT) wa
       |  FROM m GROUP BY 1, 2)""".stripMargin

  private val matchCtes = matchCtesWith("")

  /** One unrolled Bradley–Terry MM round for the DuckDB twin: each
    * term (nᵢⱼ·10⁶) // (wᵢ+wⱼ) floors BEFORE the sum, exactly as the
    * engine's per-j loop does.
    */
  private def btRound(r: Int): String =
    s"""d$r AS MATERIALIZED (
       |  SELECT np.a AS t,
       |    CAST(sum((np.n * 1000000) // (wa.w + wb.w)) AS BIGINT) AS d
       |  FROM np
       |  JOIN bt${r - 1} wa ON wa.t = np.a
       |  JOIN bt${r - 1} wb ON wb.t = np.b
       |  GROUP BY 1),
       |raw$r AS MATERIALIZED (
       |  SELECT ty.t,
       |    CASE WHEN coalesce(d.d, 0) = 0 THEN 0
       |         ELSE (wi.wi * 1000000) // d.d END AS raw
       |  FROM ty LEFT JOIN d$r d ON d.t = ty.t
       |  JOIN wins wi ON wi.t = ty.t),
       |z$r AS (
       |  SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS z FROM raw$r),
       |bt$r AS MATERIALIZED (
       |  SELECT t, greatest(1, (raw * 1000000) // (SELECT z FROM z$r))
       |    AS w
       |  FROM raw$r)""".stripMargin

  val oracles: Map[String, String] = Map(
    // winner orientation, floored micro margin, md5-ordered per-cell
    // rank — the TopKPerKey cap replayed as a row_number window
    "p_dpo_dataset" -> (matchCtesWith("\n    a.value va, b.value vb,") +
      """,
        |orient AS (
        |  SELECT
        |    CASE WHEN a_wins THEN ta ELSE tb END chosen_type,
        |    CASE WHEN a_wins THEN tb ELSE ta END rejected_type,
        |    CASE WHEN a_wins THEN ea ELSE eb END chosen_event,
        |    CASE WHEN a_wins THEN eb ELSE ea END rejected_event,
        |    CAST(floor(abs(va - vb) * 1000000) AS BIGINT) margin_micro,
        |    md5(CAST(ea AS VARCHAR) || ':' || CAST(eb AS VARCHAR) ||
        |      ':dpo') hkey, ea, eb
        |  FROM m),
        |rk AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY chosen_type, rejected_type
        |    ORDER BY hkey, ea, eb) r
        |  FROM orient)
        |SELECT chosen_type, rejected_type, chosen_event, rejected_event,
        |  margin_micro
        |FROM rk WHERE r <= 8
        |ORDER BY chosen_type, rejected_type, chosen_event,
        |  rejected_event""".stripMargin),
    // the 5-round MM fit replayed: symmetric pair counts, per-type win
    // totals, then btRound ×5 — all integer floor arithmetic
    "p_bradley_terry" -> (matchCtes +
      s""",
         |ty AS MATERIALIZED (
         |  SELECT DISTINCT t FROM (
         |    SELECT ta AS t FROM pm UNION ALL SELECT tb FROM pm) u),
         |ntys AS (SELECT CAST(count(*) AS BIGINT) AS c FROM ty),
         |wins AS MATERIALIZED (
         |  SELECT t, CAST(sum(w) AS BIGINT) AS wi FROM (
         |    SELECT ta AS t, wa AS w FROM pm
         |    UNION ALL SELECT tb, n - wa FROM pm) u
         |  GROUP BY t),
         |np AS MATERIALIZED (
         |  SELECT ta AS a, tb AS b, n FROM pm
         |  UNION ALL SELECT tb, ta, n FROM pm),
         |bt0 AS MATERIALIZED (
         |  SELECT t, 1000000 // (SELECT c FROM ntys) AS w FROM ty),
         |${btRound(1)},
         |${btRound(2)},
         |${btRound(3)},
         |${btRound(4)},
         |${btRound(5)}
         |SELECT t AS event_type, CAST(w AS BIGINT) AS bt_micro,
         |  CAST(row_number() OVER (ORDER BY w DESC, t) AS BIGINT) AS rnk
         |FROM bt5 ORDER BY rnk""".stripMargin),
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
        |FROM per ORDER BY rnk""".stripMargin),
    // the per-match Poisson draw mirrors rankCi: 5 md5 nibbles of
    // (ea, eb, replicate, ':psci') through the ⌊F(k)·16⁵⌋ thresholds,
    // one weight per match applied to both participants; every sum
    // CAST to BIGINT (the HUGEINT fence)
    "a_preference_ci" -> (matchCtes +
      """,
        |ex AS (
        |  SELECT ta, tb, a_wins, ea, eb, CAST(i AS BIGINT) b
        |  FROM m, unnest(range(0, 64)) u(i)),
        |wv AS (
        |  SELECT ta, tb, a_wins, b,
        |    CAST(h >= 385749 AS BIGINT) + CAST(h >= 771499 AS BIGINT) +
        |    CAST(h >= 964373 AS BIGINT) + CAST(h >= 1028665 AS BIGINT) +
        |    CAST(h >= 1044738 AS BIGINT) + CAST(h >= 1047952 AS BIGINT)
        |      AS w
        |  FROM (
        |    SELECT ta, tb, a_wins, b,
        |      (strpos('0123456789abcdef', substr(h5, 1, 1)) - 1) * 65536 +
        |      (strpos('0123456789abcdef', substr(h5, 2, 1)) - 1) * 4096 +
        |      (strpos('0123456789abcdef', substr(h5, 3, 1)) - 1) * 256 +
        |      (strpos('0123456789abcdef', substr(h5, 4, 1)) - 1) * 16 +
        |      (strpos('0123456789abcdef', substr(h5, 5, 1)) - 1) AS h
        |    FROM (SELECT ta, tb, a_wins, b,
        |            md5(CAST(ea AS VARCHAR) || ':' ||
        |                CAST(eb AS VARCHAR) || ':' ||
        |                CAST(b AS VARCHAR) || ':psci') h5
        |          FROM ex))),
        |sides AS (
        |  SELECT ta AS event_type, b, w,
        |    w * (CASE WHEN a_wins THEN 1 ELSE 0 END) ww,
        |    CASE WHEN a_wins THEN 1 ELSE 0 END uw
        |  FROM wv
        |  UNION ALL
        |  SELECT tb AS event_type, b, w,
        |    w * (CASE WHEN a_wins THEN 0 ELSE 1 END) ww,
        |    CASE WHEN a_wins THEN 0 ELSE 1 END uw
        |  FROM wv),
        |rep AS (
        |  SELECT event_type, b,
        |    CAST(count(*) AS BIGINT) mt, CAST(sum(uw) AS BIGINT) wt,
        |    CASE WHEN sum(w) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(sum(ww) AS BIGINT) * 1000000
        |              // CAST(sum(w) AS BIGINT) END AS rate
        |  FROM sides GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, mt, wt, rate, row_number() OVER (
        |    PARTITION BY event_type ORDER BY rate, b) AS r
        |  FROM rep),
        |ci AS (
        |  SELECT event_type, max(mt) matches,
        |    max(wt) * 1000000 // max(mt) AS winrate_micro,
        |    max(CASE WHEN r = 4 THEN rate END) lo_micro,
        |    max(CASE WHEN r = 61 THEN rate END) hi_micro
        |  FROM rk GROUP BY 1)
        |SELECT event_type, matches, winrate_micro, lo_micro, hi_micro,
        |  CAST(row_number() OVER (
        |    ORDER BY winrate_micro DESC, event_type) AS BIGINT) AS rnk
        |FROM ci ORDER BY rnk""".stripMargin))
}
