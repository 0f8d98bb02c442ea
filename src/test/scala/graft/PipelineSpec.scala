package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import graft.pipeline.{Dedup, Fingerprints}

/** Accuracy/consistency coverage for the operators the DuckDB oracle can't
  * check: MinHash-LSH and SimHash recall against exact Jaccard ground
  * truth, LSH-ANN recall against brute force, and the custom RollingHash
  * expression (interpreted == codegen == reference impl).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs: Set[(Long, Long)] =
    pairs(Dedup.jaccardPairs(Tables.documents(spark, sf), 0.8))

  test("fixture sanity: exact near-dup ground truth is non-trivial") {
    assert(exactPairs.size >= 10, s"only ${exactPairs.size} exact pairs")
  }

  test("minhash-LSH recalls ≥90% of exact Jaccard≥0.8 pairs") {
    val cand = pairs(SparkEntry.queries("d_minhash_lsh")(spark, sf))
    val recall = exactPairs.count(cand.contains).toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall over ${exactPairs.size} pairs")
  }

  test("portable minhash: emitted pairs are a SUBSET of the exact " +
      "ground truth with their exact jaccard values, recall ≥ 70%") {
    val got = SparkEntry.queries("d_minhash_portable")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val exact = Dedup.jaccardPairs(Tables.documents(spark, sf), 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        BigDecimal(r.getDouble(2)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toMap
    // verification makes every emitted pair a true pair at its exact
    // similarity — no false positives by construction
    got.foreach { case (p, j) =>
      assert(exact.contains(p), s"false positive $p")
      assert(j == exact(p), s"$p: emitted $j vs exact ${exact(p)}")
    }
    // 4×4 banding at s ≥ 0.8 catches ≥ 1−(1−s⁴)⁴ ≈ 0.88 of pairs in
    // expectation; 0.7 is the deterministic-fixture floor
    val recall = got.keySet.size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall over ${exact.size} pairs")
  }

  test("minhash estimate tracks exact jaccard within 0.25") {
    val est = SparkEntry.queries("d_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val exact = Dedup.jaccardPairs(Tables.documents(spark, sf), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val deviations = exact.collect {
      case (k, j) if est.contains(k) => math.abs(est(k) - j) }
    assert(deviations.nonEmpty && deviations.max <= 0.25,
      s"max deviation ${if (deviations.nonEmpty) deviations.max else -1}")
  }

  test("simhash finds near-dup pairs and they overlap ground truth") {
    val sh = SparkEntry.queries("d_simhash")(spark, sf)
    val shPairs = pairs(sh)
    assert(shPairs.nonEmpty, "simhash found no pairs")
    val overlap = shPairs.count(exactPairs.contains).toDouble
    // simhash (token-set based) and trigram jaccard measure different
    // similarity — require meaningful, not total, agreement
    assert(overlap / exactPairs.size >= 0.5,
      s"simhash recall ${overlap / exactPairs.size}")
  }

  test("portable simhash finds near-dup pairs overlapping ground truth") {
    val shPairs = pairs(SparkEntry.queries("d_simhash_portable")(spark, sf))
    assert(shPairs.nonEmpty, "portable simhash found no pairs")
    val overlap = shPairs.count(exactPairs.contains).toDouble
    assert(overlap / exactPairs.size >= 0.5,
      s"portable simhash recall ${overlap / exactPairs.size}")
  }

  test("portable simhash 4×15-bit banding is COMPLETE for hamming ≤ 3") {
    val sigs = Fingerprints
      .simhashPortableFingerprints(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (ida, ha) <- sigs; (idb, hb) <- sigs
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ida, idb)).toSet
    val found = pairs(SparkEntry.queries("d_simhash_portable")(spark, sf))
    assert(truth.nonEmpty, "fixture has no hamming≤3 pairs to check")
    assert(truth.subsetOf(found),
      s"banding missed ${(truth -- found).size} of ${truth.size} pairs")
    assert(found == truth,
      "portable pairs must be EXACTLY the hamming≤3 set (the tier is " +
        "deterministic, not sampled)")
  }

  test("simhash band cap: capped pairs are a subset of uncapped and the " +
      "drift audit captures exactly the lost pairs") {
    val docs = Tables.documents(spark, sf)
    val uncapped = pairs(
      Fingerprints.simhashPortablePairs(docs, 3, Int.MaxValue))
    val capped = pairs(Fingerprints.simhashPortablePairs(docs, 3, 2))
    val drift = pairs(Fingerprints.simhashCapDrift(docs, 2))
    assert(capped.subsetOf(uncapped),
      "the star rewrite must never invent candidate pairs")
    assert(drift == (uncapped -- capped),
      "drift must be exactly the verified pairs the cap loses")
    // at the production cap the fixture has no oversized buckets, so
    // the capped tier IS the uncapped set (the completeness test above
    // remains exact) and the default-cap drift is empty
    assert(pairs(Fingerprints.simhashCapDrift(docs,
      Fingerprints.DefaultBucketCap)).isEmpty)
  }

  test("simhash 4×16-bit banding is COMPLETE for hamming ≤ 3 " +
      "(pigeonhole: 3 flipped bits cannot touch all 4 bands)") {
    val sigs = Fingerprints.simhashes(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (ida, ha) <- sigs; (idb, hb) <- sigs
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ida, idb)).toSet
    val found = pairs(SparkEntry.queries("d_simhash")(spark, sf))
    assert(truth.nonEmpty, "fixture has no hamming≤3 pairs to check")
    assert(truth.subsetOf(found),
      s"banding missed ${(truth -- found).size} of ${truth.size} pairs")
  }

  private def topSet(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH-ANN recalls ≥50% of brute-force top-10") {
    val bf = topSet("s_ann_bruteforce")
    val recall = bf.count(topSet("s_ann_lsh").contains).toDouble / bf.size
    assert(recall >= 0.5, s"ANN recall $recall")
  }

  test("IVF-ANN recalls ≥50% of brute-force top-10") {
    val bf = topSet("s_ann_bruteforce")
    val recall = bf.count(topSet("s_ann_ivf").contains).toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("PQ-ANN (ADC + exact re-rank) recalls ≥60% of brute-force top-10") {
    // measured 0.76 at sf0.001 / 0.82 at sf0.01 — fully deterministic
    // (literal codebook, no RNG), so the margin absorbs future codebook
    // retunes, not run-to-run noise
    val bf = topSet("s_ann_bruteforce")
    val recall = bf.count(topSet("s_ann_pq").contains).toDouble / bf.size
    assert(recall >= 0.6, s"PQ recall $recall")
  }

  test("embedding-LSH near-dup recalls ≥50% of exact pairs") {
    val exact = SparkEntry.queries("d_embedding_dup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("d_embedding_dup_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.5, s"emb-LSH recall $recall over ${exact.size}")
    // precision is 1.0 by construction: every candidate is re-verified
    // with the same exact dot>threshold predicate
    assert((lsh -- exact).isEmpty, "LSH produced a non-exact pair")
  }

  test("RollingHash: codegen, interpreted, and reference agree") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "πßé unicode", "x" * 10000)
    val df = samples.toDF("s")
    val viaExpr = df.select(RollingHash.rolling_hash(col("s"))).collect()
      .map(_.getLong(0))
    assert(viaExpr.toSeq == samples.map(RollingHash.hashString))
    // null passes through
    val n = Seq[String](null).toDF("s")
      .select(RollingHash.rolling_hash(col("s"))).head()
    assert(n.isNullAt(0))
    // type error is caught at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("i").select(RollingHash.rolling_hash(col("i"))).collect()
    }
  }

  test("LSH bucket cap: degenerate corpus slice stays linear, star keeps recall") {
    import spark.implicits._
    // 1000 identical docs — every band bucket degenerates to size 1000;
    // uncapped this is 499,500 pairs PER BAND. Plus 20 distinct docs.
    val hot = (0L until 1000L).map(i => (i, "the same exact boilerplate text repeated across the corpus slice"))
    val cold = (1000L until 1020L).map(i => (i, s"unique document $i with tokens alpha$i beta$i gamma$i delta$i"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val cand = Fingerprints.minhashCandidates(
      Fingerprints.minhashSignatures(docs), 0.5, cap = 50)
    val got = pairs(cand.select(col("da"), col("db")))
    // linear fan-out: exactly the 999 star pairs to the representative,
    // not half a million all-pairs
    assert(got.size < 2000, s"fan-out not bounded: ${got.size} pairs")
    // star recall: every identical member is connected to rep doc 0
    val starTargets = got.collect { case (0L, m) => m }
    assert(starTargets.size == 999,
      s"star covered ${starTargets.size}/999 members")
  }

  test("capped ngram-jaccard equals exact tier on the benign fixture") {
    // max shingle df at this sf is far below the cap, so the capped
    // scale-path variant must reproduce the ground-truth tier exactly
    val capped = pairs(SparkEntry.queries("d_ngram_jaccard_capped")(spark, sf))
    val exact = pairs(SparkEntry.queries("d_ngram_jaccard")(spark, sf))
    assert(capped == exact, s"capped=${capped.size} exact=${exact.size}")
  }

  test("shingles of a doc shorter than n tokens are empty") {
    import spark.implicits._
    val got = Seq("one two", "a", "", "one two three")
      .toDF("text").select(Dedup.shingles(col("text")).as("sh"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, Nil, Nil, List("one two three")))
  }

  test("dup clustering: chains collapse transitively to the min-id keeper") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 forces multi-round propagation),
    // separate pair 10-11, plus a clique 20-21-22
    val prs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("ida", "idb")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find fast path (default threshold)…
    val got = Dedup.dupClusters(prs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // …and the distributed label-propagation path (threshold 0 forces
    // it) must produce the identical labeling
    val distributed = Dedup.dupClusters(prs, driverMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expect)
  }

  test("dup clustering: both paths agree on the fixture pair graph") {
    val prs = Dedup.jaccardPairs(Tables.documents(spark, sf), 0.8)
      .select(col("da").as("ida"), col("db").as("idb"))
    def labels(threshold: Long) =
      Dedup.dupClusters(prs, driverMaxPairs = threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = labels(4L << 20)
    val dist = labels(0L)
    assert(fast == dist && fast.nonEmpty)
  }

  test("dup clustering: empty pair set yields empty clusters, no error") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("ida", "idb")
    assert(Dedup.dupClusters(none).count() == 0)
  }

  test("dup clustering: refuses to return silently-unconverged labels") {
    import spark.implicits._
    // a path graph propagates the min one hop per round; with maxIter=2
    // a 6-node chain cannot converge and MUST throw, not emit two keepers
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("ida", "idb")
    intercept[IllegalStateException] {
      // driverMaxPairs=0 forces the iterative path (the driver
      // union-find has no convergence bound to test)
      Dedup.dupClusters(chain, maxIter = 2, driverMaxPairs = 0L).collect()
    }
  }

  test("incremental dedup equals the full pair set restricted to the batch") {
    val docs = Tables.documents(spark, sf)
    val inc = pairs(Dedup.incrementalJaccardPairs(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0), 0.8, maxDf = 20))
    val expected = exactPairs.filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(inc == expected)
    // non-vacuous both ways: some pairs touch the batch, some don't
    assert(inc.nonEmpty && inc.size < exactPairs.size)
  }

  test("PII redaction is non-vacuous: counts vary and text changes") {
    // guards the synthesized-dirty-column trick against fixture drift: if
    // redaction ever stops firing (or fires on every row identically) the
    // oracle would still hash-match while testing nothing
    val out = SparkEntry.queries("t_pii_redact")(spark, sf)
      .select("n_emails", "n_phones", "redacted").collect()
    assert(out.map(_.getInt(0)).toSet == Set(0, 1))
    assert(out.map(_.getInt(1)).toSet == Set(0, 1))
    val redacted = out.map(_.getString(2))
    assert(redacted.exists(_.contains("<EMAIL>")))
    assert(redacted.exists(_.contains("<PHONE>")))
    assert(redacted.forall(t => !t.contains("@") && !t.contains("+1-555-")))
  }

  test("repetition signals are non-degenerate on the fixture") {
    val out = SparkEntry.queries("t_repetition")(spark, sf)
      .select("top_trigram_frac", "dup_trigram_frac").collect()
    val top = out.map(_.getDouble(0))
    val dup = out.map(_.getDouble(1))
    assert(top.forall(v => v > 0.0 && v <= 1.0))
    assert(dup.forall(v => v >= 0.0 && v < 1.0))
    // the synthetic corpus repeats trigrams in SOME docs but not all
    assert(dup.exists(_ > 0.0) && dup.distinct.length > 10)
  }

  test("approx quality gate tracks the exact percentile gate") {
    def keep(name: String): Set[Long] =
      SparkEntry.queries(name)(spark, sf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = keep("p_quality_gate")
    val approx = keep("p_quality_gate_approx")
    val inter = (exact & approx).size.toDouble
    assert(inter / exact.size >= 0.97 && inter / approx.size >= 0.97,
      s"exact=${exact.size} approx=${approx.size} inter=$inter")
  }

  test("readability: syllable runs, sentence floor, and negative grades " +
      "on a hand fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world."),     // 2 words, 1 sentence, 3 vowel runs
      (2L, "sky sky"),          // y counts as a vowel; no punctuation → 1
      (3L, "go now! stop. ok?"), // 3 sentence runs, punct glued to words
      (4L, "queue"))            // consecutive vowels are ONE run
      .toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.readability(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (2, 1, 3, 2.89),
      (2, 1, 2, -3.01),  // grade below kindergarten: still well-defined
      (4, 3, 4, -3.27),
      (1, 1, 1, -3.4)))
  }

  test("multimodal decode keeps partition count (mapPartitions shape)") {
    val meta = graft.pipeline.Multimodal.decodeMeta(spark, sf)
    assert(meta.rdd.getNumPartitions ==
      graft.pipeline.Multimodal.mediaTable(spark, sf).rdd.getNumPartitions)
    assert(meta.columns.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "width", "height", "n_frames"))
  }
}
