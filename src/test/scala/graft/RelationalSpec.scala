package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level regression on the relational surface at sf0.001 — semantic
  * invariants the DuckDB oracle can't express (plan shape, broadcast).
  * Full value-level correctness is the driver's oracle gate.
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("every registered query executes and most return rows at sf0.001") {
    val counts = SparkEntry.queries.keys.map(n => n -> run(n).count()).toMap
    // f_missing_and is empty BY DESIGN (missing property under AND rejects
    // all); everything else must produce rows.
    val expectedEmpty = Set("f_missing_and")
    val unexpectedlyEmpty = counts.filter { case (n, c) =>
      c == 0 && !expectedEmpty.contains(n) }
    assert(unexpectedlyEmpty.isEmpty, s"empty results: $unexpectedlyEmpty")
    assert(counts("f_missing_and") == 0)
  }

  test("every query name has either an oracle or is documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Rows-only allowlist: genuinely non-SQL-expressible ops — approximate
    // sketches (seeded-hash dependent), iterative trainer state (BPE /
    // unigram EM), and the custom hash Expression. Accuracy is asserted
    // in the named specs instead (PipelineSpec, BpeSpec, UnigramSpec).
    // s_ann_ivf left this list in round 6: its centroid sampling moved
    // to the engine-portable Knuth hash, so it carries a full oracle.
    // p_weighted_sample left in round 7: its Efraimidis–Spirakis keys
    // became exact integer math with a DuckDB twin. s_pca_top and
    // s_ann_pq left in round 9: the eigen step now iterates on the
    // 1e-6-quantized covariance (contraction makes the recursive-CTE
    // twin engine-stable), and PQ's oracle is the ivfpq twin minus the
    // probe step.
    // s_ann_lsh / d_embedding_dup_lsh left this list in round 14: the
    // hyperplane family was always deterministic plan literals
    // (a_ann_recall's twin replayed it since round 5), so both tiers
    // graduated to full oracles — signatures + bucket join (+ the
    // cappedPairs star replay for the dedup tier) + exact re-rank/
    // verify, hash-green at all three sf.
    // d_minhash_lsh left in round 16: md5-60-bit base + Carter–Wegman
    // affine variants made the sketch engine-portable.
    val rowsOnly = Set("d_simhash",
      "r_approx_distinct", "p_quality_gate_approx", "t_cms_freq",
      // The trainer tail left this list in round 10: t_bpe_merges /
      // t_bpe_encode replay training one merge per unrolled round
      // (island-parity greedy application); t_unigram_train /
      // t_unigram_encode moved the engine to 1e-6-grid INTEGER piece
      // scores so the Viterbi argmax is engine-portable, and the twin
      // unrolls the per-word DP and backpointer walk position by
      // position; p_doremi_weights moved its weight state to the same
      // grid with a portable sampling hash.
      // p_doremi_weights left this list in round 10: the weight state
      // moved to the 1e-6 integer grid with a portable sample hash, so
      // the DuckDB twin replays the loop unrolled (one CTE block per
      // round) and hash-matches.
      // Gauss–Jordan elimination is non-contractive and its
      // data-dependent pivot choices can diverge per engine, so unlike
      // the graduated pca tier no quantized-input recursion can be
      // engine-stable; PcaSpec pins an exact in-memory recompute + the
      // low-variance-direction catch L2 misses
      "s_mahalanobis")
    assert(missing == rowsOnly, s"queries without oracle: $missing")
  }

  test("approx_count_distinct tracks exact within 5% (the default HLL rsd)") {
    val approx = run("r_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = run("r_count_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k) - ex).toDouble / ex
      assert(err <= 0.05, s"$k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("star joins broadcast their dimension sides") {
    val plan = run("r_local_supplier_volume").queryExecution.executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!plan.contains("SortMergeJoin") ||
      plan.contains("BroadcastHashJoin"),
      "fact-to-fact may sort-merge, dims must broadcast")
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = run("r_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("parquet filter pushdown reaches the scan for events queries") {
    val df = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      scan.take(800))
  }
}
