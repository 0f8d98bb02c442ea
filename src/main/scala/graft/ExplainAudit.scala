package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audit (run: `sbt "runMain graft.ExplainAudit"`): asserts
  * the plan shapes the 100 TB design depends on — filters on the scan,
  * dimension broadcasts, top-k without global sort, whole-stage codegen.
  * Executes each query first so AQE's FINAL plan is inspected, not the
  * pre-execution wrapper.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    var failed = 0

    /** Execute THIS QueryExecution (so AQE finalizes + codegen
      * collapses) and return the final physical plan — the one unwrap
      * point for every audit below.
      */
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      // drop persisted frames from earlier audits first: CacheManager
      // substitutes cached subtrees by canonical form, so without the
      // clear an audited plan's text would depend on which audits ran
      // before it (and cache memory would be bounded by the whole
      // sweep, not one query — the Verify/Bench discipline)
      try df.sparkSession.catalog.clearCache()
      catch { case _: Throwable => () }
      df.collect()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
    }
    def finalPlan(name: String): String =
      planOf(SparkEntry.queries(name)(spark, d))
    def audit(name: String, expect: String*): Unit = {
      val plan = finalPlan(name)
      val missing = expect.filterNot(plan.contains)
      if (missing.isEmpty) println(s"AUDIT $name: OK")
      else { failed += 1
        println(s"AUDIT $name: MISSING ${missing.mkString(",")}") }
    }

    /** At most `max` occurrences of `pattern` in the final plan. */
    def auditAtMost(name: String, pattern: String, max: Int): Unit = {
      val n = pattern.r.findAllIn(finalPlan(name)).size
      if (n <= max) println(s"AUDIT $name: OK ($n $pattern)")
      else { failed += 1
        println(s"AUDIT $name: $n × $pattern, expected ≤ $max") }
    }
    /** Diamond-reuse gate: the query's shared subtree must be PERSISTED
      * and consumed from cache by ≥ `minReads` plan branches — i.e. the
      * dominant pass executes once, not once per consumer (the
      * round-10 `weak` class: three bench-top queries paying their
      * corpus pass twice). Unlike the other audits this one must NOT
      * clear the cache after construction (the builder's persist()
      * registers at construction time and planOf's clear would undo
      * it), so it clears FIRST, then constructs + executes and counts
      * cached reads in the final adaptive plan.
      */
    def auditDiamond(name: String, minReads: Int): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      val n = "InMemoryTableScan|TableCacheQueryStage".r
        .findAllIn(plan).size
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      if (n >= minReads) println(s"AUDIT $name: OK ($n cached reads)")
      else { failed += 1
        println(s"AUDIT $name: $n cached reads, expected ≥ $minReads " +
          "— a shared subtree lost its persist (diamond rule)") }
    }

    /** `marker` present and no `banned` anywhere BELOW it (tree prints
      * top-down, so "below" = after the marker's line).
      */
    def auditNoneBelow(name: String, marker: String, banned: String): Unit = {
      val plan = finalPlan(name)
      val at = plan.indexOf(marker)
      if (at < 0) { failed += 1
        println(s"AUDIT $name: MISSING $marker") }
      else if (plan.indexOf(banned, at) >= 0) { failed += 1
        println(s"AUDIT $name: $banned below $marker") }
      else println(s"AUDIT $name: OK (no $banned below $marker)")
    }

    audit("f_eq", "*(", "Filter")                         // codegen'd filter
    audit("r_local_supplier_volume", "BroadcastHashJoin") // dims broadcast
    audit("r_topk", "TakeOrderedAndProject")              // no global sort
    audit("ckpt_after_seq_restart", "BroadcastHashJoin")  // ckpt broadcast
    audit("s_ann_bruteforce", "BroadcastNestedLoopJoin")  // corpus unshuffled
    audit("t_rolling_fingerprint", "*(")                  // custom expr fused
    // ROUGE-L: the custom LCS Expression stays inside whole-stage
    // codegen and the whole query is per-row — zero hash exchanges at
    // any corpus size (only the oracle-edge orderBy's range exchange)
    audit("a_rouge_l", "*(")
    auditAtMost("a_rouge_l", "Exchange hashpartitioning|Join", 0)
    // the FIM and T5-span training transforms are pure per-row array
    // expressions — scan throughput, no join, no hash exchange
    auditAtMost("p_fim_split", "Exchange hashpartitioning|Join", 0)
    auditAtMost("p_span_corruption", "Exchange hashpartitioning|Join", 0)
    audit("d_embedding_dup", "BroadcastNestedLoopJoin")
    // the sketch-screened cascade: both stages present, fused (the
    // screen rides its sig-fetch join as the join CONDITION), and no
    // vector dot below the screen in the tree print — i.e. every
    // arraydot sits DOWNSTREAM of the sighamming screen in dataflow,
    // so a screened-out candidate never touches vector payloads
    audit("d_embedding_dup_screened", "sighamming", "arraydot")
    auditNoneBelow("d_embedding_dup_screened", "sighamming", "arraydot")

    // past-dial candidate-bounded fetch (r16): with the broadcast dial
    // forced to 0, every verify payload fetch must be semi-pruned by
    // the broadcast touched-id set BEFORE the payload join — no join
    // below the verify carries the full vector table. Batch tier,
    // screened: 4 prunes (vector + signature fetch × both pair sides).
    locally {
      spark.conf.set("graft.broadcastFetchMaxRows", "0")
      try {
        // the builder persists its diamonds at CONSTRUCTION time, so
        // clear the cache first and inspect the executed plan directly
        // (the auditDiamond pattern) — planOf's post-construction clear
        // would drop those persists and optimize a different tree
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        val df = graft.pipeline.Fingerprints.embeddingDupLsh(
          spark, d,
          screenSigmas = Some(graft.pipeline.Fingerprints.ScreenSigmas))
        df.collect()
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan.toString
          case p => p.toString
        }
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        val n = "LeftSemi".r.findAllIn(plan).size
        if (n >= 4)
          println(s"AUDIT embeddingDupLsh(past-dial): OK ($n semi prunes)")
        else { failed += 1
          println(s"AUDIT embeddingDupLsh(past-dial): $n LeftSemi, " +
            "expected >= 4 — a payload fetch joined the full table") }
      } finally spark.conf.unset("graft.broadcastFetchMaxRows")
    }
    // streaming ingest, same gate: build a real two-batch index, then
    // pin the THIRD batch's drops plan under the forced dial — the
    // cross-verify vector fetch and the screen's signature fetch must
    // both be semi-pruned (2 prunes; intra-batch fetches broadcast the
    // micro-batch and never touch the index)
    locally {
      import graft.streaming.EmbeddingDedupStream
      val root = java.nio.file.Files
        .createTempDirectory("audit_embdial").toString
      val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
      for (b <- 0 until 2)
        EmbeddingDedupStream.ingestBatch(
          emb.filter(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.lit(3)) === b),
          batchId = b, s"$root/index", s"$root/flagged", 6, 4, 2,
          threshold = 0.47, screenSigmas = Some(2.5))
      spark.conf.set("graft.broadcastFetchMaxRows", "0")
      try {
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        val p = EmbeddingDedupStream.batchPlan(
          emb.filter(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.lit(3)) === 2),
          batchId = 2, s"$root/index", 6, 4, 2, 0.47,
          graft.pipeline.Fingerprints.DefaultBucketCap, Some(2.5))
        p.drops.collect()
        val plan = p.drops.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan.toString
          case q => q.toString
        }
        p.release()
        val n = "LeftSemi".r.findAllIn(plan).size
        // the survivors' left_anti is absent here (drops plan only);
        // both index fetches must show as semi prunes
        if (n >= 2)
          println(s"AUDIT embDedupStream(past-dial): OK ($n semi prunes)")
        else { failed += 1
          println(s"AUDIT embDedupStream(past-dial): $n LeftSemi, " +
            "expected >= 2 — an index fetch joined the full table") }
      } finally spark.conf.unset("graft.broadcastFetchMaxRows")
    }

    // sketch aggregations keep map-side partial aggregation: the shuffle
    // carries one buffer per (partition, doc), never the shingle rows
    audit("d_simhash", "partial_simhashsketch")
    audit("d_minhash_lsh", "partial_minhashsketch")
    // portable simhash: the registered queries PERSIST the shared
    // fingerprint frame (its diamond reuse — bands + two verify joins —
    // re-ran the shingle pass 3-4× uncached; measured 2.9→1.8 s and
    // 4.7→2.1 s at sf0.1), so their physical plans read the cached
    // subtree as an InMemoryTableScan; the counter aggregation is
    // audited on the fingerprint operator directly, and the registered
    // plans are gated on their join shape instead
    locally {
      val plan = planOf(
        graft.pipeline.Fingerprints.simhashPortableFingerprints(
          graft.Tables.documents(spark, d)))
      // the 60 vote counters are ONE map-side-combined declarative
      // aggregate — the shuffle carries 60 longs per doc, never the
      // shingle rows
      if (plan.contains("partial_sum"))
        println("AUDIT simhashPortableFingerprints: OK")
      else { failed += 1
        println("AUDIT simhashPortableFingerprints: MISSING partial_sum") }
    }
    auditAtMost("d_simhash_portable",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // the cap drift audit: its capped-minus-uncapped set difference
    // must plan as an anti-join (never a collected set)
    audit("a_simhash_cap_drift", "LeftAnti")
    // portable HLL: the register table is a map-side-combined MAX
    // aggregate over ≤ 256·|langs| keys — the shuffle never carries
    // the word stream
    audit("t_hll_portable", "partial_max")
    // composed training-set: the language gate reaches the parquet scan
    // and the dedup drop-list anti-joins via broadcast (never a shuffle
    // of the corpus for the keep-list)
    audit("p_training_set", "LeftAnti", "EqualTo(lang,en)")
    // as-of join is the tagged-union+window form: ONE computational
    // (hash) exchange on user_id, never an inequality-join product. The
    // final orderBy's rangepartitioning is presentation-only, so count
    // hash exchanges specifically.
    auditAtMost("r_join_asof", "Exchange hashpartitioning", 1)
    // session windows aggregate behind a single hash exchange
    auditAtMost("w_session", "Exchange hashpartitioning", 1)
    // correlated subqueries must rewrite to join operators, never a
    // per-row re-execution or nested-loop product
    audit("r_subqueries", "LeftSemi", "LeftAnti")
    // decontamination: the benchmark gram set broadcasts — the corpus
    // side must never shuffle for the membership join
    audit("p_decontaminate", "BroadcastHashJoin")
    // two-phase bloom decontamination: the bloom prefilter (UDF over the
    // broadcast sketch) sits corpus-side with NO shuffle, and the exact
    // confirm join still broadcasts the benchmark gram set
    audit("p_decontaminate_bloom", "BroadcastHashJoin", "UDF")
    // span dedup joins only on the span hash — never a pair product
    auditAtMost("d_span_dup", "CartesianProduct|BroadcastNestedLoopJoin", 0)
    auditAtMost("d_span_strip", "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // boilerplate strip: hot-span detection and coverage join key on
    // (source, span hash) — never a pair product
    auditAtMost("d_boilerplate_strip",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // prefix-filtered exact jaccard: candidate generation and full-set
    // verification are all equi-joins — exactness must never come from
    // a pair product
    auditAtMost("d_jaccard_prefix",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // triplet mining composes the prefix tier with a broadcast bucket
    // join — still no pair product anywhere
    auditAtMost("p_contrastive_triplets",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // DSIR: the bucket-bounded λ table broadcasts back to the feature
    // stream — scoring must never shuffle the corpus against λ
    audit("p_dsir_weights", "BroadcastHashJoin")
    // SemDeDup: the within-cluster pair join must key on the cluster
    // column — an unkeyed pair product would be the n² the clustering
    // exists to avoid
    auditAtMost("d_semdedup",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // sampled-gate agreement: the per-language cutoffs broadcast back
    audit("a_gate_agreement", "BroadcastHashJoin")
    // TopKOptimizations: the key filter written ABOVE the custom operator
    // reaches the parquet scan as a PushedFilter, and the scan reads only
    // the two live columns (ts/event_type/value/props pruned)
    audit("r_topk_pushdown", "LessThan(user_id,8)",
      "ReadSchema: struct<event_id:bigint,user_id:bigint>")
    // ANN re-rank runs on the bounded-heap operator; nothing below it
    // sorts (the only Sorts sit above, over the k·|queries| survivors)
    // "Sort [" matches only a bare Sort node — "Sort" alone would also
    // hit SortMergeJoin/SortAggregate in sibling subtrees
    auditNoneBelow("s_ann_lsh", "TopKPerKey", "Sort [")
    // domain cap runs on the bounded-heap operator, not a rank window —
    // a hot domain must never be fully sorted just to keep 15 rows
    auditNoneBelow("p_domain_cap", "TopKPerKey", "Window")
    // latest-wins upsert is an aggregation with a map-side partial (the
    // shuffle carries one row per key per map partition, not the union)
    audit("r_merge_upsert", "partial_max_by")
    // hash split aggregates behind map-side partials: the shuffle carries
    // (split, lang) partial counts, never per-doc rows
    audit("p_hash_split", "partial_count")
    // token mixture is ONE hash exchange (the per-source window); the
    // final orderBy's range partitioning is presentation-only
    auditAtMost("p_token_mixture", "Exchange hashpartitioning", 1)
    // the hashed-feature classifier is a pure per-row expression: no
    // exchange anywhere except the presentation sort
    auditAtMost("t_hash_classifier", "Exchange hashpartitioning", 0)
    // PQ: encoding + ADC run corpus-side with only the broadcast query
    // table — the corpus never shuffles before the bounded-heap shortlist
    auditNoneBelow("s_ann_pq", "TopKPerKey", "Sort [")
    // IVF: candidate re-rank also runs on the bounded heap, sort-free
    auditNoneBelow("s_ann_ivf", "TopKPerKey", "Sort [")
    // corpus diff joins id+digest only: a full-outer join whose inputs
    // are the md5 projections (the digest projects BELOW the exchange,
    // so the shuffle carries 16-byte hashes, never text payloads)
    audit("p_corpus_diff", "FullOuter", "md5")
    // audio fingerprint pairs come from posting lists — never a product
    auditAtMost("m_audio_fp_dup",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // salted two-phase agg: exactly two hash exchanges (salted partial +
    // final), each over already-combined rows
    auditAtMost("r_agg_twophase", "Exchange hashpartitioning", 2)
    // bigram LM: every count table aggregates behind map-side partials
    // (the shuffles carry combined longs, never token rows), and the
    // vocab-size scalar rides a one-row broadcast cross join
    audit("t_ngram_lm", "partial_count", "BroadcastNestedLoopJoin")
    // domain-LM scoring keeps the same contract with the target-trained
    // tables (left joins on the bigram/unigram keys, scalar broadcast)
    audit("p_lm_domain_score", "partial_count", "BroadcastNestedLoopJoin")
    // k-means assignment is a shuffle-free scan: centroids are literal
    // argmin expressions, so the returned pass has NO hash exchange
    // (the recompute's constant-size k·dim shuffle runs inside the
    // operator's earlier jobs, not in this plan)
    auditAtMost("s_kmeans", "Exchange hashpartitioning", 0)
    // normalization is pure per-row codegen — no exchange at all
    auditAtMost("t_normalize", "Exchange hashpartitioning", 0)
    // BM25: query terms broadcast (the corpus token stream filters
    // map-side before any aggregation) and per-query ranking runs on
    // the bounded heap — no sort below it
    audit("s_bm25", "BroadcastHashJoin")
    auditNoneBelow("s_bm25", "TopKPerKey", "Sort [")
    // QL: same contract as BM25 — broadcast query terms, bounded-heap cut
    audit("s_ql", "BroadcastHashJoin")
    auditNoneBelow("s_ql", "TopKPerKey", "Sort [")
    // RRF: fusion must stay pair-product-free (legs union, never join
    // all-pairs). Exactly the legs' two ONE-ROW scalar broadcasts
    // (avgdl/N and |C|) may plan as BroadcastNestedLoopJoin; a third
    // would mean the fusion itself went cross-join
    auditAtMost("s_rrf", "CartesianProduct", 0)
    auditAtMost("s_rrf", "BroadcastNestedLoopJoin", 2)
    audit("s_rrf", "TopKPerKey")
    // C4 line rules: pure per-row codegen like the Gopher battery
    auditAtMost("t_c4_rules", "Exchange hashpartitioning", 0)
    // tf-idf keywords: N rides a one-row broadcast cross join and the
    // per-source cut runs on the bounded heap — no sort feeds it
    audit("t_tfidf_keywords", "TopKPerKey", "BroadcastNestedLoopJoin")
    auditNoneBelow("t_tfidf_keywords", "TopKPerKey", "Sort [")
    // winnowing: the per-doc window and the selection dedup are the only
    // hash exchanges — the gram stream never joins itself
    auditAtMost("d_winnow_fingerprint", "Exchange hashpartitioning", 2)
    // margin mining: the anchor batch broadcasts against the corpus scan
    // (nested-loop by design — the condition is a non-equi guard) and
    // penalties/ranking run on the bounded heap; never a shuffled product
    audit("s_margin_mining", "BroadcastNestedLoopJoin", "TopKPerKey")
    auditAtMost("s_margin_mining", "CartesianProduct", 0)
    // MMR: corpus-scale work stays in the BM25 leg (broadcast query
    // terms, bounded-heap cut); the greedy fold sees k rows per query
    audit("s_mmr_diversify", "BroadcastHashJoin", "TopKPerKey")
    auditAtMost("s_mmr_diversify", "CartesianProduct", 0)
    // novelty: first-occurrence is min(doc_id) behind a map-side partial
    // — the gram shuffle carries combined longs, never raw occurrences
    audit("t_ngram_novelty", "partial_min")
    // char-trigram lang-ID: the trained profile table broadcasts back;
    // the corpus side never shuffles to be scored
    audit("t_charngram_langid", "BroadcastHashJoin", "TopKPerKey")
    // train-once variant: the model folds into the scoring expression —
    // the scoring plan carries NO join and NO hash exchange at any scale
    // (the only exchange is the oracle-edge orderBy's range partitioning)
    auditAtMost("t_charngram_langid_trained",
      "Join|Exchange hashpartitioning", 0)
    // pooling: ONE (group, dim) exchange; the output is 5× smaller than
    // the input, which is the point of pooling before the ANN index
    auditAtMost("s_embed_pool", "Exchange hashpartitioning", 1)
    // containment: ordered pairs come from posting lists like the
    // jaccard tiers — never a pair product
    auditAtMost("d_containment_dup",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // SCD2: the per-doc run windows share one doc_id exchange; the run
    // grouping adds at most one more
    auditAtMost("p_scd2_history", "Exchange hashpartitioning", 2)
    // soft dedup: the cluster-size table is component-count sized and
    // broadcasts back onto the doc spine
    audit("p_soft_dedup_weights", "BroadcastHashJoin")
    // funnel: the stage's event_type filter reaches the parquet scan
    audit("w_funnel", "PushedFilters: [IsNotNull(event_type), " +
      "EqualTo(event_type,signup)]")
    // rolling active users: the observed-day filter broadcasts (never
    // shuffles the exploded pairs against a day list), and the distinct
    // count runs as partial-then-final HashAggregate
    audit("w_active_users", "BroadcastHashJoin", "partial_count(distinct")
    // anomaly flags: the heavy input collapses via a map-side partial
    // count before any shuffle, and only the collapsed (type, hour)
    // frame moves — one exchange into the final aggregate, one into the
    // per-type window, nothing else
    audit("w_anomaly", "partial_count")
    auditAtMost("w_anomaly", "Exchange hashpartitioning", 2)
    // seasonal slots: the heavy input collapses map-side before the
    // grid/window machinery — count partials + ≤2 hash exchanges
    // (count aggregate; slot window on the calendar-sized grid)
    audit("w_seasonal_anomaly", "partial_count")
    auditAtMost("w_seasonal_anomaly", "Exchange hashpartitioning", 2)
    // anneal schedule: every window is per-source (the bounded-stratum
    // rule — no global running sum), the per-source stats broadcast
    audit("p_anneal_mix", "BroadcastHashJoin")
    auditAtMost("p_anneal_mix", "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // readability: pure per-row expressions — no exchange at all
    auditAtMost("t_readability", "Exchange hashpartitioning", 0)
    // epoch mix: broadcast factor table + bounded explode — no shuffle
    auditAtMost("p_epoch_mix", "Exchange hashpartitioning", 0)
    audit("p_epoch_mix", "BroadcastHashJoin")
    // temperature sampling: the per-language rate table broadcasts back
    // to the corpus scan — the doc side never shuffles to be sampled
    audit("p_temperature_sample", "BroadcastHashJoin")
    // chunking is a pure per-row explode — no exchange at all
    auditAtMost("p_chunk_docs", "Exchange hashpartitioning", 0)
    // fuzzy join: candidates come from the trigram posting-list
    // equi-join — edit distance must never run on a pair product
    auditAtMost("r_fuzzy_join",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // shard assignment: one hash exchange (the per-shard rank window);
    // the production write twin has none
    auditAtMost("p_shard_assign", "Exchange hashpartitioning", 1)
    // band join: the bucket trick must turn the pure inequality into an
    // equi-join — a bare |Δt|<=δ condition would plan as a nested-loop
    // product over the full pair space
    auditAtMost("r_join_band",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    audit("r_join_band", "HashJoin")
    // interval-overlap join: bucket replication must keep the pure
    // overlap inequality an EQUI-join on the bucket key — the bare
    // `ls<=re AND rs<=le` condition would plan as a nested-loop product
    auditAtMost("r_join_interval",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // blocklist gate: the derived list is a driver-bounded sort-limit
    // BROADCAST into both match joins; never a product
    audit("t_blocklist_gate", "BroadcastHashJoin")
    auditAtMost("t_blocklist_gate",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // JL projection is a pure map stage: ZERO computational shuffles
    // (the presentation orderBy is a range partitioning, not hash)
    auditAtMost("s_random_projection", "Exchange hashpartitioning", 0)
    // zipf fit: the bounded-heap cap must sit between the count and the
    // rank window, so the window never sorts more than 100 rows/source
    audit("t_zipf_fit", "TopKPerKey")
    // robust outlier gate: per-source stats ride back via broadcast —
    // the doc scan is never reshuffled to meet its own statistics
    audit("t_length_outliers", "BroadcastHashJoin")
    // contamination matrix: distinct-collapsed (source, fp) self-join is
    // all equi-joins — never a pair product
    auditAtMost("a_source_overlap",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // diamond-reuse gates (the round-10 weak class): every query whose
    // dominant corpus pass feeds >1 consumer must read it from cache in
    // every consuming branch — both self-join sides of the (source, fp)
    // frame; both the df build and the probe side of the shingle
    // explode (×2 queries); both anti-join directions of each pairDrift
    // tier; all three bleuStats consumers of the token-array frame
    auditDiamond("a_source_overlap", 2)
    auditDiamond("t_informativeness", 2)
    auditDiamond("t_ngram_novelty", 2)
    auditDiamond("a_capped_pair_drift", 4)
    auditDiamond("a_bleu", 3)
    // round-12 closures of the same class: the capped posting-list seam
    // (shingle frame ×3 consumers + drop-adjusted sizes ×2 inside
    // jaccardPairsFrom/containmentPairsFrom/incrementalJaccardPairs),
    // the prefix tier's exploded/ordered diamonds, and the two text
    // queries (tri ×2, tf ×2)
    auditDiamond("d_ngram_jaccard_capped", 4)
    auditDiamond("d_containment_dup", 4)
    // the LCS verify tier rides the capped pair lineage (same seam
    // persists) and must never degrade to a pair product
    auditDiamond("d_lcs_verify", 4)
    auditAtMost("d_lcs_verify",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    auditDiamond("d_incremental_dedup", 4)
    auditDiamond("d_ngram_jaccard", 2)    // uncapped: sizes feed both joins
    auditDiamond("d_jaccard_prefix", 4)
    // round-15 multi-probe tier: the (id, t, sig, home) probe frame is
    // a diamond (bucket sizes + both join sides) and the normalized
    // vectors feed the signature pass + both verify re-fetches — every
    // consumer must read from cache, and the probe fan-out must never
    // degrade to a pair product
    auditDiamond("d_embedding_dup_mp", 4)
    auditAtMost("d_embedding_dup_mp", "CartesianProduct", 0)
    // the dedup-recall audit rides two persisted pair sets (a count and
    // the overlap join each) — the exact tier's documented
    // BroadcastNestedLoopJoin is the measurement, not a leak
    auditDiamond("a_emb_dup_recall", 4)
    auditDiamond("t_charngram_langid", 2)
    // the two round-13 DiamondLint per-subtree findings, fixed with
    // lazy persists: phash banding (×2 cappedPairs consumers) and the
    // length-outlier deviation frame (×2: MAD aggregate + flag pass)
    auditDiamond("m_phash_pairs", 2)
    auditDiamond("t_length_outliers", 2)
    auditDiamond("t_tfidf_keywords", 2)
    // round-13 closure found by the reworked DiamondLint phase-2 sweep:
    // the exploded token stream feeds the freq-sketch aggregation AND
    // the name-recovery distinct
    auditDiamond("t_heavy_hitters", 2)
    // d_dup_clusters takes the driver union-find path at audit scale, so
    // its FINAL plan is a local relation (the diamond executes in the
    // pair-production jobs during construction) — gate the pair subquery
    // it feeds to dupClusters instead, which is the registered tier
    // d_ngram_jaccard_capped's exact lineage
    locally {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      val pairs = graft.pipeline.Dedup.jaccardPairs(
        Tables.documents(spark, d), 0.8, maxDf = 20)
      pairs.collect()
      val plan = pairs.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      val n = "InMemoryTableScan|TableCacheQueryStage".r.findAllIn(plan).size
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      if (n >= 4) println(s"AUDIT d_dup_clusters(pairs): OK ($n cached reads)")
      else { failed += 1
        println(s"AUDIT d_dup_clusters(pairs): $n cached reads, " +
          "expected ≥ 4 — the capped posting-list seam lost its persist") }
    }
    // hilbert curve expression participates in whole-stage codegen
    audit("r_hilbert_curve", "*(")
    // gap-fill: the calendar grid rides broadcasts (one-row bounds +
    // type list) — densifying never reshuffles the fact aggregate
    audit("w_gapfill", "BroadcastHashJoin")
    // ema inherits the same densify shape; the smoothing window runs on
    // the calendar-sized frame
    audit("w_ema", "BroadcastHashJoin")
    // nearest join: band pairs stream into the bounded-heap top-1 —
    // never a nested-loop product, never a per-key sort
    auditAtMost("r_join_nearest",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    audit("r_join_nearest", "TopKPerKey")
    // projection recall: both rankings through the bounded heap
    audit("a_projection_recall", "TopKPerKey")
    // Q8-style 8-way star: dims ride broadcasts, the fact carries the
    // only real shuffles
    audit("r_market_share", "BroadcastHashJoin")
    // ema-anomaly shares the densify shape; lag/compare on the
    // calendar-sized frame
    audit("w_ema_anomaly", "BroadcastHashJoin")
    // interleave: one source-keyed rank window, nothing else shuffles
    auditAtMost("p_interleave_sources", "Exchange hashpartitioning", 1)
    // cusum shares the densify shape; the closed-form windows run on
    // the calendar-sized frame per type
    audit("w_cusum", "BroadcastHashJoin")
    // diag mahalanobis: scoring is one scan against literal artifacts,
    // top-k through the bounded heap — no join, no product
    audit("s_mahalanobis_diag", "TopKPerKey")
    auditAtMost("s_mahalanobis_diag",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // packing audit: one lang-keyed window + per-lang aggregate — the
    // groupBy rides the window's partitioning, so one exchange total
    auditAtMost("a_pack_efficiency", "Exchange hashpartitioning", 1)
    // sft pairing: JSON round-trip + bounded explode + doc-keyed lag,
    // never a join
    auditAtMost("p_sft_pairs",
      "CartesianProduct|BroadcastNestedLoopJoin|SortMergeJoin", 0)
    // kneser-ney: top-N lands in the bounded heap (no global sort of
    // the bigram table); the types scalar rides the one-row broadcast
    audit("t_kneser_ney", "TakeOrderedAndProject",
      "BroadcastNestedLoopJoin")
    // poisson bootstrap: the corpus×B explode collapses map-side — the
    // only hash exchange is the B-row replicate aggregate; the rank+CI
    // windows run on that B-row frame in the same lineage (a second
    // exchange would mean the corpus lineage executes twice)
    auditAtMost("a_bootstrap_ci", "Exchange hashpartitioning", 1)
    // preference matches: the pair self-join must be an equi-join on
    // (user, day) — never a product
    auditAtMost("p_preference_pairs",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // preference CI: the true-rate columns ride the SAME single match
    // pass as the bootstrap (a second matches() lineage would scan the
    // events twice) — so exactly one (user, day) window sort and no
    // product anywhere
    auditAtMost("a_preference_ci",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // retrieval eval: both the actual and the ideal ranking run through
    // the bounded heap — no per-query sort of the hit list
    audit("a_retrieval_ndcg", "TopKPerKey")
    // MRR/P@10/R@10: the relevance join is query-term-bounded and
    // broadcast; the only heavy leg is the shared BM25 bounded heap
    audit("a_retrieval_mrr", "TopKPerKey", "BroadcastHashJoin")
    // pass@k / distinct-n: pure per-row expressions — the sample loop
    // is an `aggregate` HOF and bigrams a `transform`, so NO Generate
    // and the only exchange is the oracle-edge orderBy
    auditAtMost("a_pass_at_k", "Generate", 0)
    // the two exchanges: Tables.spread's core-spreading repartition
    // plus the oracle-edge orderBy — nothing computational
    auditAtMost("a_pass_at_k", "Exchange", 2)
    auditAtMost("a_distinct_n", "Generate", 0)
    auditAtMost("a_distinct_n", "Exchange", 2)
    // BLEU stats: gram counting map-side-combines, and each side's
    // grams for ALL n come from ONE explode (the (n, gram)-struct
    // concat), never one per (side, n) — the union shape would show 8+
    // Generates. Budget: cand grams appear twice (the clip join and the
    // totals both consume them — cache-collapsed in the real run, but
    // planOf clears caches by design), ref grams once, the 4-row base
    // n explode once.
    audit("a_bleu", "partial_count")
    auditAtMost("a_bleu", "Generate explode", 4)
    // chrF rides the same shape: gram counting behind map-side partial
    // aggregation. Generate budget is ONE MORE than a_bleu's: ref grams
    // feed two consumers here (the clip join AND ref_total — chrF is an
    // F-score, BLEU precision-only), so uncached planOf sees cand ×2,
    // ref ×2, base ×1 (one collapsed by exchange reuse). The executed
    // plan cache-collapses all of it via the pairs persist (diamond gate)
    audit("a_chrf", "partial_count")
    auditAtMost("a_chrf", "Generate explode", 5)
    auditDiamond("a_chrf", 3)
    // DPO dataset: the per-cell balance cap is the bounded heap, not a
    // global sort, and the match product stays a hash join on the
    // capped (user, day) groups
    audit("p_dpo_dataset", "TopKPerKey")
    auditAtMost("p_dpo_dataset",
      "CartesianProduct|BroadcastNestedLoopJoin", 0)
    // calibration eval: deciles and ranks run in per-SOURCE windows
    // (the bounded-stratum rule) — the window exchange must be a hash
    // partitioning on source, never a global range sort of the corpus
    audit("a_reliability", "Exchange hashpartitioning(source")
    audit("a_auc", "Exchange hashpartitioning(source")
    // NB: auditAtMost compiles its pattern as a REGEX — the literal
    // paren must be escaped (unescaped it throws PatternSyntaxException
    // and killed the whole audit run from round 10 until caught here)
    auditAtMost("a_reliability",
      "Exchange rangepartitioning\\(s_micro", 0)
    auditAtMost("a_auc", "Exchange rangepartitioning\\(s_micro", 0)
    // (s_covariance's aggregate runs at query-construction time — its
    // registered frame is a driver-local relation, so the map-side-
    // partial plan shape is asserted in PcaSpec instead of here)
    // bucketed ingest joins with NO shuffle: both sides' distribution
    // comes from the bucketed layout (write once here, plan must be
    // Exchange-free)
    locally {
      import graft.sources.Bucketing
      spark.sql("DROP TABLE IF EXISTS audit_li")
      spark.sql("DROP TABLE IF EXISTS audit_ord")
      // a crashed previous run can leave orphaned managed-table dirs the
      // catalog no longer knows about; clear them or the write refuses
      for (t <- Seq("audit_li", "audit_ord")) {
        val p = new java.io.File(s"spark-warehouse/$t")
        if (p.exists()) {
          import scala.reflect.io.Directory
          new Directory(p).deleteRecursively()
        }
      }
      Bucketing.writeBucketed(Tables.lineitem(spark, d)
        .select("l_orderkey", "l_quantity"), "audit_li", "l_orderkey", 4)
      Bucketing.writeBucketed(Tables.orders(spark, d)
        .select("o_orderkey", "o_orderpriority"), "audit_ord",
        "o_orderkey", 4)
      // at audit scale the planner would (rightly) broadcast instead;
      // disable auto-broadcast so the bucketed SMJ path is what's planned
      // (restore the PRIOR value in finally — a thrown collect must not
      // leave broadcast disabled for the rest of the audit)
      val savedThreshold =
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val plan =
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          planOf(Bucketing.colocatedJoin(spark, "audit_li", "audit_ord",
            "l_orderkey", "o_orderkey"))
        } finally spark.conf.set(
          "spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      val ok = !plan.contains("Exchange") && plan.contains("SortMergeJoin")
      if (!ok) failed += 1
      println("AUDIT bucketed-join: " + (if (ok) "OK (no Exchange)"
        else "FAIL\n" + plan))
    }

    // partitioned layout: a lang predicate prunes whole directories at
    // planning time (PartitionFilters), the coarse complement to
    // row-group pushdown
    locally {
      import graft.sources.PartitionedLayout
      val p = java.nio.file.Files
        .createTempDirectory("audit_part").toString + "/docs"
      PartitionedLayout.writePartitioned(
        Tables.documents(spark, d), p, Seq("lang"))
      val en = PartitionedLayout.readPartitioned(spark, p)
        .filter(org.apache.spark.sql.functions.col("lang") === "en")
      en.collect()
      val plan = en.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "")
      val ok = plan.contains("PartitionFilters") &&
        plan.contains("(lang = en)")
      if (!ok) failed += 1
      println("AUDIT partition-pruning: " + (if (ok) "OK"
        else "FAIL\n" + plan))
    }

    val scan = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    val pruned = scan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")
    if (!pruned) failed += 1
    println("AUDIT column-pruning: " + (if (pruned) "OK" else "FAIL"))

    println(if (failed == 0) "AUDIT RESULT: ALL OK"
      else s"AUDIT RESULT: $failed FAILURES")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
