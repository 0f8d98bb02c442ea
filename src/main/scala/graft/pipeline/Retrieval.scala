package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.TextAnalysis.round4HalfUp

/** Lexical ranked retrieval (Okapi BM25) over the documents table —
  * the query side of a corpus engine: eval-set mining, dedup triage
  * ("what else scores like this doc"), and the lexical leg of hybrid
  * search. North-star operator (the reference has no query surface).
  *
  * Shape at 100 TB: the query term set broadcasts (it is human-sized);
  * the corpus token stream is FILTERED to query terms map-side before
  * any aggregation, so tf/df tables are |terms|-bounded, not
  * vocabulary-bounded. Corpus-wide scalars (N, avgdl) are one
  * map-side-combined aggregate riding a one-row broadcast cross join.
  * Per-query ranking runs on the engine's bounded-heap
  * [[graft.plans.TopKPerKey]] — no per-query sort of the hit list.
  *
  * Float contract: idf/tf-norm terms use the same literal constants
  * and evaluation shapes as the DuckDB twin (2.2 and 0.25 are spelled
  * as literals — `1.2 + 1` and `1 - 0.75` produce DIFFERENT doubles);
  * per-doc score sums can differ in the last ulp across
  * engines/partitionings (float adds associate in partial-aggregation
  * order), so BOTH the rank-k cut and the output happen on the
  * half-up-rounded 1e-4 grid — grid ties break by doc_id identically
  * on both sides, and a cross-engine cut difference would need the
  * true score within float noise of a grid boundary (~1e-11/value).
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  /** Top-k docs per query by BM25 (k1 = 1.2, b = 0.75). `queries` is
    * (query_id, whitespace-tokenized terms); duplicate terms within a
    * query count ONCE (classic BM25 has no query-term-frequency factor
    * — without the dedup a repeated term would silently double its
    * contribution).
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (id, ws) => ws.distinct.map((id, _)) }
      .toDF("query_id", "w")
    val qWords = qt.select("w").distinct()
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    // map-side term filter: only query-term tokens survive the scan
    val tf = toks.join(broadcast(qWords), "w")
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("double").as("dl"))
    // corpus scalars derive from the dl projection — one tokenize
    // expression, not a third spelled-out copy
    val scal = dl.agg(
      count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    // The rank-k CUT happens on the ROUNDED score: raw per-doc sums can
    // differ in the last ulp across engines/partitionings (float adds
    // associate in partial-aggregation order), and a cut on raw floats
    // would let two docs straddling rank k swap membership between this
    // plan and the twin. On the 1e-4 grid both engines see the same
    // number unless the true score sits within float noise of a grid
    // boundary (~1e-11 per value); grid ties break by doc_id
    // identically on both sides.
    val scores = qt.join(tf, "w")
      .join(broadcast(dft), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scal))
      .groupBy("query_id", "doc_id")
      .agg(round4HalfUp(sum(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          col("tf") * 2.2 /
          (col("tf") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))))
        .as("score"))
    graft.plans.TopKPerKey.topKPerKey(scores,
      Seq("query_id"), Seq(("score", true), ("doc_id", false)), k)
  }

  /** Fixture queries built from the synthetic corpus's vocabulary. */
  val FixtureQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("table", "scan", "merge"),
    2 -> Seq("hash", "join", "spark"),
    3 -> Seq("window", "sort", "batch"))

  /** Top-k docs per query by Dirichlet-smoothed query likelihood
    * (Zhai & Lafferty 2001, μ = 100) — the second classic lexical
    * ranker, and the second leg of [[rrfFuse]]. Scored rank-equivalent
    * to full QL over candidate docs (docs containing ≥ 1 query term,
    * the inverted-index candidate set):
    *
    *   score(q,d) = Σ_present ln(1 + tf / (μ·cf_w/|C|)) − |q|·ln(dl + μ)
    *
    * (the per-query constant Σ_w ln(μ·cf_w/|C|) is dropped — it shifts
    * every candidate equally). Plan shape is [[bm25TopK]]'s: broadcast
    * query terms filter the token stream map-side, so tf and corpus
    * frequency cf stay |terms|-bounded; |C| rides a one-row broadcast
    * cross join; the cut runs on the bounded-heap TopKPerKey. Same
    * float contract: rank cut and output on the half-up 1e-4 grid.
    */
  def qlTopK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (id, ws) => ws.distinct.map((id, _)) }
      .toDF("query_id", "w")
    val nq = queries.map { case (id, ws) =>
      (id, ws.distinct.size.toDouble) }.toDF("query_id", "nq")
    val qWords = qt.select("w").distinct()
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tf = toks.join(broadcast(qWords), "w")
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).cast("double").as("tf"))
    // corpus frequency of the query terms only — folded from the already
    // term-filtered tf table, no second corpus scan
    val cf = tf.groupBy("w").agg(sum("tf").as("cf"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("double").as("dl"))
    val tot = dl.agg(sum("dl").as("ctoks"))
    val present = qt.join(tf, "w")
      .join(broadcast(cf), "w")
      .crossJoin(broadcast(tot))
      .groupBy("query_id", "doc_id")
      .agg(sum(log(lit(1.0) +
        col("tf") / (lit(100.0) * (col("cf") / col("ctoks"))))).as("s"))
    val scores = present.join(dl, "doc_id")
      .join(broadcast(nq), "query_id")
      .select(col("query_id"), col("doc_id"),
        round4HalfUp(col("s") - col("nq") * log(col("dl") + lit(100.0)))
          .as("score"))
    graft.plans.TopKPerKey.topKPerKey(scores,
      Seq("query_id"), Seq(("score", true), ("doc_id", false)), k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    * ranked top-k lists: each leg contributes 1/(60 + rank) per doc,
    * summed across legs. Kept EXACT cross-engine by scaling to integer
    * micro-units — `1e12 DIV (60 + rank)` is pure BIGINT division, so
    * the fused score is an associative integer sum no float
    * re-association can perturb. Leg ranks come off each leg's already
    * grid-rounded scores (ties by doc_id), so every input to the fusion
    * is engine-stable. The per-leg rank window runs over top-k lists
    * (human-sized: k rows per query), not the corpus.
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = legs.map { leg =>
      leg.select(col("query_id"), col("doc_id"),
          row_number().over(Window.partitionBy("query_id")
            .orderBy(col("score").desc, col("doc_id"))).as("rn"))
        .select(col("query_id"), col("doc_id"),
          expr("CAST(1000000000000 AS BIGINT) DIV CAST(60 + rn AS BIGINT)")
            .as("contrib"))
    }
    val fused = ranked.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("rrf"))
    graft.plans.TopKPerKey.topKPerKey(fused,
      Seq("query_id"), Seq(("rrf", true), ("doc_id", false)), k)
  }

  val queries: Map[String, Q] = Map(
    "s_bm25" -> { (s, d) =>
      bm25TopK(Tables.spread(Tables.documents(s, d)), FixtureQueries, 10)
        .orderBy(col("query_id"), col("score").desc, col("doc_id"))
    },
    "s_ql" -> { (s, d) =>
      qlTopK(Tables.spread(Tables.documents(s, d)), FixtureQueries, 10)
        .orderBy(col("query_id"), col("score").desc, col("doc_id"))
    },
    // rank fusion of the two lexical rankers' top-10 lists — the fused
    // score is an exact BIGINT, so the whole query hash-matches even
    // though both legs score with floats
    "s_rrf" -> { (s, d) =>
      val docs = Tables.spread(Tables.documents(s, d))
      rrfFuse(Seq(bm25TopK(docs, FixtureQueries, 10),
        qlTopK(docs, FixtureQueries, 10)), 10)
        .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
    })

  val oracles: Map[String, String] = Map(
    "s_bm25" ->
      """WITH q(query_id, w) AS (VALUES
        |  (1,'table'),(1,'scan'),(1,'merge'),
        |  (2,'hash'),(2,'join'),(2,'spark'),
        |  (3,'window'),(3,'sort'),(3,'batch')),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) w
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) tf
        |  FROM toks JOIN (SELECT DISTINCT w FROM q) USING (w)
        |  GROUP BY 1, 2),
        |dft AS (SELECT w, CAST(count(*) AS DOUBLE) df FROM tf GROUP BY 1),
        |dl AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) dl
        |  FROM documents),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) n_docs,
        |    avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) avgdl
        |  FROM documents),
        |sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |    floor(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |      * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        |      * 10000 + 0.5) / 10000.0 score
        |  FROM q JOIN tf USING (w) JOIN dft USING (w)
        |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN scal
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, doc_id) rn
        |  FROM sc)
        |SELECT query_id, doc_id, score
        |FROM rk WHERE rn <= 10
        |ORDER BY query_id, score DESC, doc_id""".stripMargin,
    "s_ql" ->
      """WITH q(query_id, w) AS (VALUES
        |  (1,'table'),(1,'scan'),(1,'merge'),
        |  (2,'hash'),(2,'join'),(2,'spark'),
        |  (3,'window'),(3,'sort'),(3,'batch')),
        |nq AS (
        |  SELECT query_id, CAST(count(DISTINCT w) AS DOUBLE) nq
        |  FROM q GROUP BY 1),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) w
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) tf
        |  FROM toks JOIN (SELECT DISTINCT w FROM q) USING (w)
        |  GROUP BY 1, 2),
        |cf AS (SELECT w, sum(tf) cf FROM tf GROUP BY 1),
        |dl AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) dl
        |  FROM documents),
        |tot AS (SELECT sum(dl) ctoks FROM dl),
        |ps AS (
        |  SELECT query_id, tf.doc_id,
        |    sum(ln(1.0 + tf / (100.0 * (cf / ctoks)))) s
        |  FROM q JOIN tf USING (w) JOIN cf USING (w) CROSS JOIN tot
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT query_id, ps.doc_id,
        |    floor((s - nq * ln(dl + 100.0)) * 10000 + 0.5) / 10000.0 score
        |  FROM ps JOIN dl ON dl.doc_id = ps.doc_id JOIN nq USING (query_id)),
        |rk AS (
        |  SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, doc_id) rn
        |  FROM sc)
        |SELECT query_id, doc_id, score
        |FROM rk WHERE rn <= 10
        |ORDER BY query_id, score DESC, doc_id""".stripMargin,
    "s_rrf" ->
      """WITH q(query_id, w) AS (VALUES
        |  (1,'table'),(1,'scan'),(1,'merge'),
        |  (2,'hash'),(2,'join'),(2,'spark'),
        |  (3,'window'),(3,'sort'),(3,'batch')),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) w
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) tf
        |  FROM toks JOIN (SELECT DISTINCT w FROM q) USING (w)
        |  GROUP BY 1, 2),
        |dft AS (SELECT w, CAST(count(*) AS DOUBLE) df FROM tf GROUP BY 1),
        |cf AS (SELECT w, sum(tf) cf FROM tf GROUP BY 1),
        |dl AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) dl
        |  FROM documents),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) n_docs,
        |    avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) avgdl
        |  FROM documents),
        |tot AS (SELECT sum(dl) ctoks FROM dl),
        |nq AS (
        |  SELECT query_id, CAST(count(DISTINCT w) AS DOUBLE) nq
        |  FROM q GROUP BY 1),
        |bm_sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |    floor(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |      * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        |      * 10000 + 0.5) / 10000.0 score
        |  FROM q JOIN tf USING (w) JOIN dft USING (w)
        |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN scal
        |  GROUP BY 1, 2),
        |bm_top AS (
        |  SELECT query_id, doc_id, rn FROM (
        |    SELECT query_id, doc_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY score DESC, doc_id) rn
        |    FROM bm_sc) WHERE rn <= 10),
        |ql_ps AS (
        |  SELECT query_id, tf.doc_id,
        |    sum(ln(1.0 + tf / (100.0 * (cf / ctoks)))) s
        |  FROM q JOIN tf USING (w) JOIN cf USING (w) CROSS JOIN tot
        |  GROUP BY 1, 2),
        |ql_sc AS (
        |  SELECT query_id, ql_ps.doc_id,
        |    floor((s - nq * ln(dl + 100.0)) * 10000 + 0.5) / 10000.0 score
        |  FROM ql_ps JOIN dl ON dl.doc_id = ql_ps.doc_id
        |    JOIN nq USING (query_id)),
        |ql_top AS (
        |  SELECT query_id, doc_id, rn FROM (
        |    SELECT query_id, doc_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY score DESC, doc_id) rn
        |    FROM ql_sc) WHERE rn <= 10),
        |contrib AS (
        |  SELECT query_id, doc_id, 1000000000000 // (60 + rn) c
        |  FROM bm_top
        |  UNION ALL
        |  SELECT query_id, doc_id, 1000000000000 // (60 + rn) c
        |  FROM ql_top),
        |fused AS (
        |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) rrf
        |  FROM contrib GROUP BY 1, 2),
        |rk AS (
        |  SELECT query_id, doc_id, rrf,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY rrf DESC, doc_id) rn
        |  FROM fused)
        |SELECT query_id, doc_id, rrf
        |FROM rk WHERE rn <= 10
        |ORDER BY query_id, rrf DESC, doc_id""".stripMargin)
}
