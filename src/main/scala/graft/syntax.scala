package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Fluent syntax for the engine's operator library:
  *
  * {{{
  * import graft.syntax._
  * docs.graftJaccardPairs(0.8, maxDf = 20)
  * docs.graftTrainingSet
  * events.graftTopKPerKey(Seq("user_id"), Seq(("event_id", true)), 50)
  * records.graftFilterPayload(spec, col("data").cast("string"))
  * }}}
  *
  * Thin forwarding only — every method delegates to the module object
  * that owns the operator (and its tests/oracles); nothing is
  * reimplemented here.
  */
object syntax {
  implicit class GraftOps(private val df: DataFrame) extends AnyVal {
    /** Per-key bounded-heap top-k ([[plans.TopKPerKey]]); `(col, true)`
      * orders descending.
      */
    def graftTopKPerKey(keys: Seq[String], order: Seq[(String, Boolean)],
        k: Int): DataFrame =
      plans.TopKPerKey.topKPerKey(df, keys, order, k)

    /** Keep rows whose JSON `body` matches the reference-semantics
      * filter spec ([[filters.FilterCompiler.compile]]).
      */
    def graftFilterPayload(spec: filters.FilterSpec, body: Column): DataFrame =
      df.filter(filters.FilterCompiler.compile(spec, body))

    /** Trigram-Jaccard near-dup pairs over (doc_id, text)
      * ([[pipeline.Dedup.jaccardPairs]]).
      */
    def graftJaccardPairs(threshold: Double, maxDf: Int = 0): DataFrame =
      pipeline.Dedup.jaccardPairs(df, threshold, maxDf)

    /** Exact Jaccard pairs via rarest-first prefix filtering — no df
      * cap, no recall loss ([[pipeline.Dedup.prefixJaccardPairs]]).
      */
    def graftPrefixJaccardPairs(threshold: Double): DataFrame =
      pipeline.Dedup.prefixJaccardPairs(df, threshold)

    /** DSIR importance weights against a target-distribution predicate
      * ([[pipeline.TrainingSet.dsirWeights]]).
      */
    def graftDsirWeights(isTarget: Column, nibbles: Int = 4): DataFrame =
      pipeline.TrainingSet.dsirWeights(df, isTarget, nibbles)

    /** SemDeDup: k-means bucketing + within-cluster cosine pruning
      * ([[pipeline.KMeansOps.semDedup]]).
      */
    def graftSemDedup(k: Int, iters: Int, tau: Double): DataFrame =
      pipeline.KMeansOps.semDedup(df, k, iters, tau)

    /** Connected-components clustering of an (ida, idb) pair frame
      * ([[pipeline.Dedup.dupClusters]]).
      */
    def graftDupClusters(maxIter: Int = 20): DataFrame =
      pipeline.Dedup.dupClusters(df, maxIter)

    /** Composed dedup ∘ language ∘ quality training-set materialization
      * over documents ([[pipeline.TrainingSet.trainingSet]]).
      */
    def graftTrainingSet: DataFrame =
      pipeline.TrainingSet.trainingSet(df)

    /** Keep docs at/above their language's `p` quality percentile
      * ([[pipeline.TrainingSet.qualityPercentileGate]]).
      */
    def graftQualityGate(p: Double): DataFrame =
      pipeline.TrainingSet.qualityPercentileGate(df, p)

    /** Deterministic hash-ranked k-per-stratum sample
      * ([[pipeline.TrainingSet.stratifiedSample]]).
      */
    def graftStratifiedSample(stratum: String, k: Int): DataFrame =
      pipeline.TrainingSet.stratifiedSample(df, stratum, k)

    /** Context-window sequence packing
      * ([[pipeline.TrainingSet.packSequences]]).
      */
    def graftPackSequences(budget: Int): DataFrame =
      pipeline.TrainingSet.packSequences(df, budget)

    /** Add-one-smoothed bigram-LM cross-entropy per doc over
      * (doc_id, text) ([[pipeline.CorpusOps.bigramCrossEntropy]]).
      */
    def graftBigramCrossEntropy: DataFrame =
      pipeline.CorpusOps.bigramCrossEntropy(df)

    /** Seeded deterministic (shard, pos) layout over (doc_id, …)
      * ([[pipeline.CorpusOps.shardAssign]]).
      */
    def graftShardAssign(seed: String): DataFrame =
      pipeline.CorpusOps.shardAssign(df, seed)

    /** Temperature-sampled multilingual mix over (doc_id, lang, …)
      * ([[pipeline.CorpusOps.temperatureSample]]).
      */
    def graftTemperatureSample(alpha: Double, seed: String,
        targetFrac: Double = 0.25): DataFrame =
      pipeline.CorpusOps.temperatureSample(df, alpha, seed, targetFrac)

    /** Lloyd's k-means over (vec_id, embedding)
      * ([[pipeline.KMeansOps.kmeans]]).
      */
    def graftKMeans(k: Int, iters: Int): DataFrame =
      pipeline.KMeansOps.kmeans(df, k, iters)

    /** BM25 top-k docs per query over (doc_id, text)
      * ([[pipeline.Retrieval.bm25TopK]]).
      */
    def graftBm25TopK(queries: Seq[(Int, Seq[String])],
        k: Int): DataFrame =
      pipeline.Retrieval.bm25TopK(df, queries, k)

    /** Dirichlet query-likelihood top-k over (doc_id, text)
      * ([[pipeline.Retrieval.qlTopK]]).
      */
    def graftQlTopK(queries: Seq[(Int, Seq[String])], k: Int): DataFrame =
      pipeline.Retrieval.qlTopK(df, queries, k)

    /** Reciprocal-rank fusion of this ranked list with others — each
      * (query_id, doc_id, score) — ([[pipeline.Retrieval.rrfFuse]]).
      */
    def graftRrfFuse(others: Seq[DataFrame], k: Int): DataFrame =
      pipeline.Retrieval.rrfFuse(df +: others, k)

    /** Ordered conversion funnel over (user_id, event_type, ts)
      * ([[pipeline.EventWindows.funnel]]).
      */
    def graftFunnel(stages: Seq[String]): DataFrame =
      pipeline.EventWindows.funnel(df, stages)

    /** Weekly cohort retention matrix over (user_id, event_type, ts)
      * ([[pipeline.EventWindows.cohortRetention]]).
      */
    def graftCohortRetention(cohortType: String): DataFrame =
      pipeline.EventWindows.cohortRetention(df, cohortType)

    /** First-order event transition counts over
      * (event_id, user_id, event_type, ts)
      * ([[pipeline.EventWindows.transitions]]).
      */
    def graftTransitions: DataFrame =
      pipeline.EventWindows.transitions(df)

    /** Per-source epoch oversampling over (doc_id, source, ...)
      * ([[pipeline.TrainingSet.epochMix]]).
      */
    def graftEpochMix(factors: Seq[(String, Int)]): DataFrame =
      pipeline.TrainingSet.epochMix(df, factors)

    /** Per-source boilerplate (template chrome) removal over
      * (doc_id, source, text) ([[pipeline.Dedup.stripBoilerplate]]).
      */
    def graftStripBoilerplate(n: Int = 4, minFrac: Double = 0.5,
        minDocs: Int = 2): DataFrame =
      pipeline.Dedup.stripBoilerplate(df, n, minFrac, minDocs)

    /** PageRank domain ranking over (doc_id, source, text): edges from
      * cross-source shared spans ([[pipeline.GraphRank]]).
      */
    def graftSourceRank(iters: Int = 10, damping: Double = 0.85)
        : DataFrame = {
      val nodes = df.select(
        org.apache.spark.sql.functions.col("source").as("node")).distinct()
      pipeline.GraphRank.pageRank(nodes,
        pipeline.GraphRank.sourceEdges(df), iters, damping)
    }

    /** Domain-LM cross-entropy of each (doc_id, text) row against count
      * tables trained on `target`
      * ([[pipeline.CorpusOps.bigramCrossEntropyAgainst]]).
      */
    def graftDomainScore(target: DataFrame): DataFrame =
      pipeline.CorpusOps.bigramCrossEntropyAgainst(target, df)

    /** Unigram-LM (SentencePiece hard-EM) piece table learned from the
      * corpus's word vocabulary ([[pipeline.Unigram.train]]).
      */
    def graftUnigramTable(vocabSize: Int = 512,
        rounds: Int = 3): Seq[(String, Long)] =
      pipeline.Unigram.train(pipeline.Bpe.vocabulary(df), vocabSize, rounds)

    /** Pure interval (band) join against `right` — |left(leftUs) −
      * right(rightUs)| ≤ deltaUs, no equi-key
      * ([[operators.BandJoin.bandJoin]]).
      */
    def graftBandJoin(right: DataFrame, leftUs: String, rightUs: String,
        deltaUs: Long, joinType: String = "inner"): DataFrame =
      operators.BandJoin.bandJoin(df, right, leftUs, rightUs, deltaUs,
        joinType)

    /** DoReMi-style learned domain mixture over (doc_id, source, text)
      * ([[pipeline.CorpusOps.doremiWeights]]).
      */
    def graftDoremiWeights(rounds: Int = 3, eta: Double = 0.5): DataFrame =
      pipeline.CorpusOps.doremiWeights(df, rounds, eta)

    /** Source-interleaved deterministic training order
      * ([[pipeline.CorpusOps.interleaveSources]]).
      */
    def graftInterleaveSources(seed: String): DataFrame =
      pipeline.CorpusOps.interleaveSources(df, seed)

    /** Zero-filled hourly resample of (event_type, ts) rows
      * ([[pipeline.EventWindows.gapFillHourly]]).
      */
    def graftGapFillHourly: DataFrame =
      pipeline.EventWindows.gapFillHourly(df)

    /** Top-k Mahalanobis embedding outliers of (vec_id, embedding)
      * rows ([[pipeline.Projection.mahalanobisTop]]).
      */
    def graftMahalanobisTop(k: Int): DataFrame =
      pipeline.Projection.mahalanobisTop(df, k)
  }
}
