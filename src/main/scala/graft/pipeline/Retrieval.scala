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

  val queries: Map[String, Q] = Map(
    "s_bm25" -> { (s, d) =>
      bm25TopK(Tables.spread(Tables.documents(s, d)), FixtureQueries, 10)
        .orderBy(col("query_id"), col("score").desc, col("doc_id"))
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
        |ORDER BY query_id, score DESC, doc_id""".stripMargin)
}
