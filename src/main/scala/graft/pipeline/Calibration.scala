package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Scorer-quality evaluation — the reliability/discrimination half of
  * model-based filtering, completing the eval family next to nDCG
  * ([[Retrieval]]), BLEU ([[BleuEval]]) and the preference CIs: before a
  * classifier gates a corpus ([[TrainingSet]] quality gates, the
  * [[Classifier]] trainer), a pipeline wants to know (a) whether its
  * score RANKS positives above negatives (AUC) and (b) how hit rate
  * moves across the score range (the per-decile reliability table the
  * threshold is chosen from).
  *
  * Both are EXACT integer operators here:
  *
  *  - scores ride [[TextAnalysis.hashClassifierWeightSum]]'s integer
  *    milli-unit weight sum, normalized per token by FLOOR division
  *    (the pmod idiom — Spark's DIV truncates toward zero while the
  *    twin's `//` floors, and weight sums go negative);
  *  - ground truth is synthesized deterministically as a noisy copy of
  *    the score (5 md5 nibbles of `doc_id:cal` drive a ±250 milli/token
  *    perturbation — the [[TrainingSet]] planted-signal discipline), so
  *    high-|score| docs agree with the truth more often and the report
  *    exhibits exactly the monotone structure it exists to expose;
  *  - AUC is the Mann–Whitney rank statistic with midrank tie handling
  *    kept integral by working in DOUBLED ranks (each tied group's
  *    2·midrank = min(rn) + max(rn)), so auc_micro is one non-negative
  *    integer division.
  *
  * Scale shape: the scoring pass is one codegen'd per-row expression
  * (no shuffle); deciles and ranks run in per-SOURCE windows — the
  * bounded-stratum rule ([[TrainingSet.packSequences]],
  * `p_curriculum`): no global sort at any corpus size, each window
  * sorts one source's slice. Outputs are 10·|sources| and |sources|
  * rows.
  */
object Calibration {
  type Q = (SparkSession, String) => DataFrame

  /** Per-doc scored frame: (doc_id, source, s_micro, truth).
    * s_micro = floor(1000·ws / n) — per-token score in micro units;
    * truth = ws + noise ≥ 0 with the deterministic ±250·n milli noise.
    */
  def scoredDocs(docs: DataFrame): DataFrame = {
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":cal"))), 1, 5), 16, 10).cast("long")
    // NULL text would yield NULL ws/s_micro, and the engines ORDER nulls
    // differently (Spark NULLS FIRST, DuckDB NULLS LAST) — ntile buckets
    // and row_number ranks would diverge. Filter like BleuEval/WordPiece;
    // the twin's scoredCtes carries the same WHERE.
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        TextAnalysis.hashClassifierWeightSum(col("text")).as("ws"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
        h.as("h"))
      .select(col("doc_id"), col("source"),
        expr("(ws * 1000 - pmod(ws * 1000, n)) DIV n").as("s_micro"),
        (col("ws") + (col("h") % 501L - 250L) * col("n") >= 0L)
          .as("truth"))
  }

  /** Reliability table: per (source, score decile) — docs, positives,
    * positive rate (micro grid), and the bucket's exact score bounds.
    * Decile 1 is the lowest-scored tenth; a well-behaved scorer shows
    * posrate_micro monotone in bucket.
    */
  def reliability(docs: DataFrame): DataFrame = {
    val sc = scoredDocs(docs)
    val w = Window.partitionBy("source").orderBy("s_micro", "doc_id")
    sc.withColumn("bucket", ntile(10).over(w).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("truth"), 1L).otherwise(0L)).as("n_pos"),
        min(col("s_micro")).as("min_s_micro"),
        max(col("s_micro")).as("max_s_micro"))
      .select(col("source"), col("bucket"), col("n_docs"), col("n_pos"),
        expr("n_pos * 1000000 DIV n_docs").as("posrate_micro"),
        col("min_s_micro"), col("max_s_micro"))
  }

  /** Per-source ranking AUC (Mann–Whitney with midrank ties):
    * auc_micro = (Σ 2·midrank(pos) − npos·(npos+1)) · 10⁶
    *             DIV (2·npos·nneg), NULL when a source has no
    * positives or no negatives (mirrored in the twin).
    */
  def rankAuc(docs: DataFrame): DataFrame = {
    val sc = scoredDocs(docs)
    val w = Window.partitionBy("source").orderBy("s_micro", "doc_id")
    val tie = Window.partitionBy("source", "s_micro")
    val ranked = sc.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("r2", min(col("rn")).over(tie) + max(col("rn")).over(tie))
    ranked.groupBy("source")
      .agg(sum(when(col("truth"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("truth"), 0L).otherwise(1L)).as("n_neg"),
        sum(when(col("truth"), col("r2")).otherwise(0L)).as("sp2"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(sp2 - n_pos * (n_pos + 1)) * 1000000 " +
            "DIV (2 * n_pos * n_neg)"))
          .otherwise(lit(null).cast("long")).as("auc_micro"))
  }

  /** Per-(doc, judge) synthesized votes for the agreement audit: the
    * base category is the score tercile (fixed integer thresholds on
    * s_micro), and each judge flips to an md5-drawn category on a 1-in-5
    * draw — so agreement is real but imperfect, the regime kappa is
    * built to measure. (doc_id, judge, vote ∈ {0,1,2}).
    */
  def judgeVotes(docs: DataFrame, judges: Int = 5): DataFrame = {
    require(judges >= 2 && judges <= 64, s"judges=$judges")
    val base = when(col("s_micro") < -100000L, 0L)
      .when(col("s_micro") < 100000L, 1L).otherwise(2L)
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), col("j").cast("string"), lit(":fk"))), 1, 5), 16, 10)
      .cast("long")
    scoredDocs(docs)
      .select(col("doc_id"), base.as("b"),
        explode(sequence(lit(0), lit(judges - 1))).as("j"))
      .select(col("doc_id"), col("j").cast("long").as("judge"),
        when(h % 5L === 0L, h % 3L).otherwise(col("b")).as("vote"))
  }

  /** Fleiss' kappa over the judge panel — the inter-annotator-agreement
    * QA step of judgment/preference data collection (Fleiss 1971),
    * entirely on the micro grid:
    *
    *   P_i  = (Σ_k n_ik² − n) · 10⁶ DIV (n(n−1))   per item
    *   P̄    = Σ_i P_i DIV N
    *   p_k  = (Σ_i n_ik) · 10⁶ DIV (N·n),  P̄e = Σ_k p_k² DIV 10⁶
    *   κ    = (P̄ − P̄e) · 10⁶ DIV (10⁶ − P̄e)
    *
    * Every division is integer; negative κ (worse-than-chance) is safe
    * because Spark's DIV and DuckDB's // both truncate toward zero.
    * Shape at scale: two map-side-combined aggregations ((item, vote)
    * counts, then per-item sums) and a |categories|-row chance table —
    * the result is one row.
    */
  def fleissKappa(docs: DataFrame, judges: Int = 5): DataFrame = {
    val n = judges.toLong
    val counts = judgeVotes(docs, judges)
      .groupBy("doc_id", "vote").agg(count(lit(1)).as("nik"))
    val perItem = counts.groupBy("doc_id")
      .agg(sum(col("nik") * col("nik")).as("sq"))
      .select(col("doc_id"),
        expr(s"(sq - $n) * 1000000 DIV (${n * (n - 1)})").as("pi"))
    val pbar = perItem.agg(count(lit(1)).as("n_items"),
      expr("sum(pi) DIV count(1)").as("pbar_micro"))
    val pe = counts.groupBy("vote").agg(sum(col("nik")).as("tot"))
      .crossJoin(broadcast(perItem.agg(count(lit(1)).as("ni"))))
      .select(expr(s"tot * 1000000 DIV (ni * $n)").as("pk"))
      .agg(expr("sum(pk * pk) DIV 1000000").as("pe_micro"))
    // Unanimous votes make pe_micro exactly 10⁶ and the denominator 0;
    // Spark's non-ANSI DIV would return NULL while DuckDB's // throws —
    // an engine divergence, not a matched result. κ is undefined at
    // P̄e = 1 (no room above chance), so BOTH engines emit NULL
    // explicitly (the rankAuc one-class discipline).
    pbar.crossJoin(broadcast(pe))
      .select(col("n_items"), col("pbar_micro"), col("pe_micro"),
        when(col("pe_micro") < 1000000L,
          expr("(pbar_micro - pe_micro) * 1000000 DIV " +
            "(1000000 - pe_micro)"))
          .otherwise(lit(null).cast("long")).as("kappa_micro"))
  }

  val queries: Map[String, Q] = Map(
    "a_reliability" -> { (s, d) =>
      reliability(Tables.documents(s, d)).orderBy("source", "bucket")
    },
    "a_auc" -> { (s, d) =>
      rankAuc(Tables.documents(s, d)).orderBy("source")
    },
    // inter-annotator agreement over the 5-judge synthetic panel
    "a_fleiss_kappa" -> { (s, d) =>
      fleissKappa(Tables.documents(s, d))
    })

  /** The scored-frame CTEs for the twin: the t_hash_classifier weight
    * sum, floor-div per-token micro score, and the 5-nibble noise draw
    * (the a_preference_ci strpos idiom).
    */
  private val scoredCtes =
    """WITH sc AS (
      |  SELECT doc_id, source,
      |    CAST(list_sum(list_transform(string_split(text, ' '), w ->
      |      ((((length(w) * 31 + ascii(substr(w, 1, 1)) * 7
      |          + ascii(substr(w, -1, 1))) * 2654435761)
      |        % 1048576) * 40503) % 2001 - 1000)) AS BIGINT) AS ws,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    (strpos('0123456789abcdef', substr(h5, 1, 1)) - 1) * 65536 +
      |    (strpos('0123456789abcdef', substr(h5, 2, 1)) - 1) * 4096 +
      |    (strpos('0123456789abcdef', substr(h5, 3, 1)) - 1) * 256 +
      |    (strpos('0123456789abcdef', substr(h5, 4, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(h5, 5, 1)) - 1) AS h
      |  FROM (SELECT *, md5(CAST(doc_id AS VARCHAR) || ':cal') h5
      |        FROM documents WHERE text IS NOT NULL)),
      |base AS (
      |  SELECT doc_id, source,
      |    -- explicit pmod floor: DuckDB's // truncates toward zero on
      |    -- negatives (like Spark's DIV), so both engines floor the
      |    -- same way by subtracting the non-negative remainder first
      |    (ws * 1000 - ((ws * 1000 % n) + n) % n) // n AS s_micro,
      |    ws + (h % 501 - 250) * n >= 0 AS truth
      |  FROM sc)""".stripMargin

  val oracles: Map[String, String] = Map(
    "a_reliability" -> (scoredCtes +
      """,
        |nt AS (
        |  SELECT source, truth, s_micro,
        |    CAST(ntile(10) OVER (
        |      PARTITION BY source ORDER BY s_micro, doc_id) AS BIGINT)
        |      AS bucket
        |  FROM base)
        |SELECT source, bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS posrate_micro,
        |  min(s_micro) AS min_s_micro,
        |  max(s_micro) AS max_s_micro
        |FROM nt GROUP BY 1, 2
        |ORDER BY source, bucket""".stripMargin),
    // the judge panel replayed: tercile base, 1-in-5 md5 flip, then the
    // Fleiss arithmetic with every division integer (both engines'
    // integer division truncates toward zero, so negative kappa is safe)
    "a_fleiss_kappa" -> (scoredCtes +
      """,
        |votes AS (
        |  SELECT doc_id,
        |    CASE WHEN h2 % 5 = 0 THEN h2 % 3
        |         WHEN s_micro < -100000 THEN 0
        |         WHEN s_micro < 100000 THEN 1 ELSE 2 END AS vote
        |  FROM (
        |    SELECT doc_id, s_micro,
        |      (strpos('0123456789abcdef', substr(h5, 1, 1)) - 1) * 65536 +
        |      (strpos('0123456789abcdef', substr(h5, 2, 1)) - 1) * 4096 +
        |      (strpos('0123456789abcdef', substr(h5, 3, 1)) - 1) * 256 +
        |      (strpos('0123456789abcdef', substr(h5, 4, 1)) - 1) * 16 +
        |      (strpos('0123456789abcdef', substr(h5, 5, 1)) - 1) AS h2
        |    FROM (
        |      SELECT doc_id, s_micro, j,
        |        md5(CAST(doc_id AS VARCHAR) || ':' ||
        |            CAST(j AS VARCHAR) || ':fk') h5
        |      FROM base, unnest(range(0, 5)) u(j)))),
        |cnt AS (
        |  SELECT doc_id, vote, CAST(count(*) AS BIGINT) nik
        |  FROM votes GROUP BY 1, 2),
        |pi AS (
        |  SELECT doc_id,
        |    (CAST(sum(nik * nik) AS BIGINT) - 5) * 1000000 // 20 AS pi
        |  FROM cnt GROUP BY 1),
        |pb AS (
        |  SELECT CAST(count(*) AS BIGINT) n_items,
        |    CAST(sum(pi) AS BIGINT) // CAST(count(*) AS BIGINT)
        |      AS pbar_micro
        |  FROM pi),
        |pk AS (
        |  SELECT CAST(sum(nik) AS BIGINT) * 1000000
        |    // ((SELECT n_items FROM pb) * 5) AS pk
        |  FROM cnt GROUP BY vote),
        |pe AS (
        |  SELECT CAST(sum(pk * pk) AS BIGINT) // 1000000 AS pe_micro
        |  FROM pk)
        |SELECT n_items, pbar_micro, pe_micro,
        |  CASE WHEN pe_micro < 1000000
        |       THEN (pbar_micro - pe_micro) * 1000000
        |            // (1000000 - pe_micro)
        |       ELSE NULL END AS kappa_micro
        |FROM pb, pe""".stripMargin),
    "a_auc" -> (scoredCtes +
      """,
        |rk AS (
        |  SELECT source, truth, s_micro, row_number() OVER (
        |    PARTITION BY source ORDER BY s_micro, doc_id) AS rn
        |  FROM base),
        |mid AS (
        |  SELECT source, truth,
        |    min(rn) OVER (PARTITION BY source, s_micro) +
        |    max(rn) OVER (PARTITION BY source, s_micro) AS r2
        |  FROM rk),
        |agg AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) n_pos,
        |    CAST(sum(CASE WHEN truth THEN 0 ELSE 1 END) AS BIGINT) n_neg,
        |    CAST(sum(CASE WHEN truth THEN r2 ELSE 0 END) AS BIGINT) sp2
        |  FROM mid GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |       THEN (sp2 - n_pos * (n_pos + 1)) * 1000000
        |            // (2 * n_pos * n_neg)
        |       ELSE NULL END AS auc_micro
        |FROM agg ORDER BY source""".stripMargin))
}
