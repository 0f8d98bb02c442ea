package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed TRAINING of a hashed-feature linear quality classifier —
  * the fastText-shaped filter models (GPT-3/LLaMA-style quality gates,
  * CCNet's linear classifiers) actually get TRAINED, not just applied
  * (`t_hash_classifier` is the apply side with fixed weights; this is
  * the learn side).
  *
  * Architecture mirrors how these filters deploy at 100 TB: the LABELED
  * set is always corpus-tiny (human labels / a trusted-domain sample),
  * so training runs on a DETERMINISTIC hash-selected sample collected
  * to the driver (the IVF-centroid/BPE driver-artifact discipline —
  * doc membership is CAPPED at [[MaxSample]] by a mixHash-order
  * `limit`, so it is driver-sized by construction at any corpus scale,
  * and the feature-row count is `require`-guarded by a distributed
  * count BEFORE the collect), while the corpus-scale work —
  * feature extraction and model APPLICATION — is fully distributed:
  * one map-side-combined (doc, bucket) count shuffle, a broadcast of
  * the bucket-bounded weight table, and an exact integer dot product
  * per doc.
  *
  * The trainer is the classical ONLINE perceptron in doc_id order
  * (convergent on separable data by the perceptron theorem — the
  * full-batch variant provably oscillates: measured on this corpus,
  * summed updates flip sign every epoch and accuracy pins to the
  * majority class). Everything is INTEGER — counts, weights, scores —
  * so training is deterministic and reproducible bit-for-bit in any
  * engine: the DuckDB oracle replays the sequential pass as a
  * recursive CTE over a LIST-typed weight state (the unrolled-k-means
  * discipline taken one step further) and hash-matches every doc's
  * final score.
  */
object Classifier {
  type Q = (SparkSession, String) => DataFrame

  /** Largest labeled sample (in DOCS) the driver will train on — the
    * documented driver-artifact bound (same size class as a broadcast
    * side). Enforced by construction: membership is capped to the
    * `MaxSample` smallest `(mixHash(doc_id), doc_id)` keys, so a 100×
    * corpus trains on the same-sized (and, for stable ids, the same)
    * sample instead of a 100× one.
    */
  val MaxSample = 100000

  /** Largest (doc, bucket) feature-row set the driver will collect.
    * Docs are capped at [[MaxSample]] by construction, but
    * buckets-per-doc is data-dependent (≤ min(doc tokens, 16^nibbles)),
    * so the row bound is CHECKED with one distributed count before any
    * collect — the fail-loud-first discipline of
    * `WindowedStreams.domainScoreGate`.
    */
  val MaxRows = 4000000L

  /** Per-(doc, bucket) integer feature counts with the doc's ±1 label
    * riding along. Buckets are the engine-portable md5-nibble hash
    * shared with [[TrainingSet.dsirWeights]]/shardAssign.
    */
  def featureCounts(docs: DataFrame, isPositive: Column, text: Column,
      nibbles: Int): DataFrame = {
    def bucketOf(feat: Column): Column =
      conv(substring(md5(feat), 1, nibbles), 16, 10).cast("long")
    Tables.spread(docs).filter(text.isNotNull)
      .select(col("doc_id"),
        when(isPositive, lit(1L)).otherwise(lit(-1L)).as("y"),
        explode(split(text, " ")).as("w"))
      .select(col("doc_id"), col("y"), bucketOf(col("w")).as("b"))
      .groupBy("doc_id", "y", "b").agg(count(lit(1)).as("c"))
  }

  /** Deterministic training-sample PRE-filter (25% by the Knuth
    * multiplicative hash, shared with the contrastive-triplet buckets
    * — engine-portable, partitioning-independent, stable across
    * re-crawls). This only thins the candidate pool; the driver-side
    * bound comes from [[trainOnlinePerceptron]]'s `maxDocs` cap, which
    * is corpus-size-independent where a fraction is not.
    */
  def inSample(docId: Column): Column =
    pmod(pmod(docId * lit(2654435761L), lit(4294967296L)), lit(4)) === 0

  /** Online-perceptron weight learning over the labeled sample's
    * feature rows, visited in doc_id order, `epochs` passes. Returns
    * bucket → weight for every bucket the sample touched (absent
    * buckets provably stay 0). Integer arithmetic only.
    *
    * Driver-safety contract, in order: (1) membership is CAPPED to the
    * `maxDocs` smallest `(mixHash, doc_id)` keys — the IVF-codebook
    * idiom (`Similarity.pqQuery`), so the sample is corpus-size-
    * independent by construction; (2) the capped feature-row count is
    * measured with one distributed aggregate and `require`d under
    * `maxRows` BEFORE anything is collected — an oversized sample
    * fails loud, it never OOMs the driver.
    */
  def trainOnlinePerceptron(sampleFeats: DataFrame, epochs: Int,
      maxDocs: Int = MaxSample, maxRows: Long = MaxRows)
      : Map[Long, Long] = {
    val keep = sampleFeats.select(col("doc_id")).distinct()
      .orderBy(TrainingSet.mixHash(col("doc_id")), col("doc_id"))
      .limit(maxDocs)
    val capped = sampleFeats.join(broadcast(keep), Seq("doc_id"))
    val nRows = capped.count()
    require(nRows <= maxRows,
      s"labeled sample carries $nRows feature rows, exceeding the " +
        s"$maxRows driver-collect bound; lower maxDocs or raise maxRows")
    val rows = capped.select("doc_id", "y", "b", "c").collect()
    val docs = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        (rs.head.getLong(1), rs.map(r => (r.getLong(2), r.getLong(3))))
      }
    val w = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for (_ <- 1 to epochs; (y, feats) <- docs) {
      val s = feats.map { case (b, c) => c * w(b) }.sum
      if (y * s <= 0L)
        feats.foreach { case (b, c) => w(b) += y * c }
    }
    w.toMap
  }

  /** Train-then-score in one declarative result: extracts features
    * distributed, learns weights on the hash-selected sample, then
    * emits every doc's exact integer score under the final weights via
    * a broadcast weight join, plus predicted and true labels.
    */
  def perceptronPredictions(docs: DataFrame, isPositive: Column,
      text: Column = col("text"), epochs: Int = 3,
      nibbles: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = featureCounts(docs, isPositive, text, nibbles).persist()
    val w = trainOnlinePerceptron(
      feats.filter(inSample(col("doc_id"))), epochs)
    val wDf = broadcast(w.toSeq.toDF("b", "wt"))
    val out = feats
      .join(wDf, Seq("b"), "left")
      .groupBy("doc_id", "y")
      .agg(sum(col("c") * coalesce(col("wt"), lit(0L))).as("score"))
      .select(col("doc_id"), col("score"),
        when(col("score") > 0, "pos").otherwise("neg").as("pred"),
        when(col("y") === 1L, "pos").otherwise("neg").as("truth"))
    feats.unpersist()
    out
  }

  /** The planted training signal for the registered query (the
    * t_pii_redact fixture discipline): the corpus's natural labels are
    * measured UNCORRELATED with its 31-word shared vocabulary (no
    * classifier can beat the majority class on lang), so the query
    * derives the label from doc_id and plants marker tokens for 90% of
    * docs — the trainer must RECOVER the markers from the hashed
    * feature space; the unmarked 10% keep the task from being
    * trivially noise-free.
    */
  def plantedLabel(docId: Column): Column = docId % 3 === 0
  def plantedText(docId: Column, text: Column): Column =
    when(docId % 10 === 7, text)
      .when(docId % 3 === 0, concat(text, lit(" helpful insight")))
      .otherwise(concat(text, lit(" clickbait")))

  val queries: Map[String, Q] = Map(
    // quality-filter training end-to-end: distributed hashed features,
    // online perceptron on the deterministic 25% sample, distributed
    // exact integer apply to the full corpus
    "t_classifier_train" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      perceptronPredictions(docs, plantedLabel(col("doc_id")),
        plantedText(col("doc_id"), col("text")))
        .orderBy("doc_id")
    })

  private val nib3 =
    """(strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 256 +
      |    (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1)""".stripMargin

  /** The sequential training pass replayed as a recursive CTE: the
    * weight vector is a LIST over the sample's distinct buckets
    * (absent buckets provably stay 0 under perceptron updates, so the
    * state is sample-vocabulary-sized), each step is one (epoch, doc)
    * visit in the engine's exact order, and the final list scores the
    * whole corpus through a bucket join. Integer throughout — the
    * agreement is exact, not grid-rounded.
    */
  val oracles: Map[String, String] = Map(
    "t_classifier_train" ->
      s"""WITH RECURSIVE planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE -1 END AS y,
         |    CASE WHEN doc_id % 10 = 7 THEN text
         |         WHEN doc_id % 3 = 0 THEN text || ' helpful insight'
         |         ELSE text || ' clickbait' END AS t
         |  FROM documents WHERE text IS NOT NULL),
         |fb AS (
         |  SELECT doc_id, y, $nib3 AS b
         |  FROM (SELECT doc_id, y, unnest(string_split(t, ' ')) AS w
         |        FROM planted)),
         |feats AS (
         |  SELECT doc_id, y, b, CAST(count(*) AS BIGINT) AS c
         |  FROM fb GROUP BY 1, 2, 3),
         |samp AS (
         |  SELECT * FROM feats
         |  WHERE ((doc_id * 2654435761) % 4294967296) % 4 = 0
         |    AND doc_id IN (
         |      SELECT doc_id FROM (
         |        SELECT DISTINCT doc_id FROM feats
         |        WHERE ((doc_id * 2654435761) % 4294967296) % 4 = 0
         |        ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
         |        LIMIT $MaxSample))),
         |bk AS (
         |  SELECT b, CAST(row_number() OVER (ORDER BY b) AS INT) AS i
         |  FROM (SELECT DISTINCT b FROM samp)),
         |nb AS (SELECT CAST(count(*) AS INT) AS n FROM bk),
         |sdocs AS (
         |  SELECT doc_id, y, list(struct_pack(i := i, c := c) ORDER BY i)
         |    AS fs
         |  FROM samp JOIN bk USING (b) GROUP BY doc_id, y),
         |steps AS (
         |  SELECT row_number() OVER (ORDER BY e, doc_id) AS k, y, fs
         |  FROM sdocs CROSS JOIN (SELECT unnest([1, 2, 3]) AS e)),
         |rec(k, w) AS (
         |  SELECT CAST(0 AS BIGINT),
         |    (SELECT list_transform(range(n), x -> CAST(0 AS BIGINT))
         |     FROM nb)
         |  UNION ALL
         |  SELECT s.k,
         |    CASE WHEN s.y * coalesce(list_sum(
         |        list_transform(s.fs, f -> f.c * r.w[f.i])), 0) <= 0
         |    THEN list_transform(range(1, (SELECT n FROM nb) + 1),
         |      i -> r.w[i] + s.y * coalesce(list_sum(list_transform(
         |        list_filter(s.fs, f -> f.i = i), f -> f.c)), 0))
         |    ELSE r.w END
         |  FROM rec r JOIN steps s ON s.k = r.k + 1),
         |wfin AS (SELECT w FROM rec ORDER BY k DESC LIMIT 1),
         |wt AS (SELECT bk.b, (SELECT w FROM wfin)[bk.i] AS wt FROM bk)
         |SELECT feats.doc_id,
         |  CAST(sum(c * coalesce(wt, 0)) AS BIGINT) AS score,
         |  CASE WHEN sum(c * coalesce(wt, 0)) > 0 THEN 'pos'
         |    ELSE 'neg' END AS pred,
         |  CASE WHEN y = 1 THEN 'pos' ELSE 'neg' END AS truth
         |FROM feats LEFT JOIN wt USING (b)
         |GROUP BY doc_id, y ORDER BY doc_id""".stripMargin)
}
