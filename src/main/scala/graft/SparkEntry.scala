package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.filters.{FilterCompiler, FilterSpec, FilterVerbs, PayloadFilter}
import graft.operators._
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * End-to-end exercise of the reference's consume path in batch form
    * (SURVEY §3.1): JSON payload filter (AND spec) → metadata projection →
    * per-partition-key checkpoint sequence (`max(sequenceNumber)` per key,
    * the `SaveCheckpoint` analog of `KinesisThreadJobs.cs:404-408`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val spec = FilterSpec(Seq(
      PayloadFilter("k", FilterVerbs.GreaterThanOrEqual, "1")))
    Tables.events(spark, "/root/testdata/sf0.001")
      .filter(FilterCompiler.compile(spec, col("props")))
      .groupBy(col("user_id").as("partition_key"))
      .agg(max(col("event_id")).as("checkpoint_sequence"),
        count(lit(1)).as("delivered"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FilterQueries.queries ++ StreamAnalogs.queries ++ Relational.queries ++
      Dedup.queries ++ Similarity.queries ++ Fingerprints.allQueries ++
      TextAnalysis.queries ++ Multimodal.queries ++ EventWindows.queries ++
      TrainingSet.queries ++ Agreement.queries ++ Bpe.queries ++
      WordPiece.queries ++ Unigram.queries ++
      CorpusOps.queries ++ KMeansOps.queries ++ Retrieval.queries ++
      BleuEval.queries ++ Calibration.queries ++
      Classifier.queries ++ Projection.queries ++ Preference.queries ++
      GraphRank.queries ++ graft.operators.FuzzyJoin.queries ++
      graft.operators.BandJoin.queries ++
      graft.operators.IntervalJoin.queries ++
      graft.operators.QuantileSketch.queries ++
      graft.sources.SourceQueries.queries

  /** Machine-readable intent for every registered query that carries NO
    * oracleSql entry: name → (oracle-green sibling, why no oracle can
    * exist). The registry is finished BY CONSTRUCTION: CoverageTotalsSpec
    * asserts this map's key set EQUALS `queries.keySet -- oracleSql
    * .keySet` and that every named sibling IS oracle-backed, so a future
    * query registered without either an oracle or an annotation fails
    * the build instead of shipping as an unexplained no_oracle row.
    * Verify dumps it as `no_oracle.json` next to `oracle_sql.json` so
    * the driver-side comparator sees the same contract.
    */
  // d_minhash_lsh left this map in round 16: the sketch's base hash
  // moved to the md5-60-bit BIGINT (the d_simhash_portable-proven
  // base) and its buffer mixer to the Carter–Wegman affine family mod
  // 2^61−1 — plain modular arithmetic DuckDB replays in HUGEINT — so
  // the tier keeps its single-pass-aggregate identity AND carries a
  // full signature → band → cappedPairs → estimate oracle.
  def noOracle: Map[String, (String, String)] = Map(
    "d_simhash" -> ("d_simhash_portable",
      "SimHash bands over xxhash64 bits are seed-dependent; " +
        "reference-equality + recall specs pin it, the portable " +
        "md5-bit twin is oracle-green"),
    "s_mahalanobis" -> ("s_mahalanobis_diag",
      "the full-covariance inverse is iterative float linear algebra " +
        "(engine-divergent at ulp level); the diagonal variant walks " +
        "the same scoring path and is oracle-green"),
    "r_approx_distinct" -> ("r_count_distinct",
      "HLL++ estimates are implementation-defined (Spark's sketch ≠ " +
        "DuckDB's); the error bound is spec-pinned against the " +
        "oracle-green exact count"),
    "t_cms_freq" -> ("t_cms_portable",
      "Spark's count_min_sketch binary layout/seeds are " +
        "implementation-defined; the md5-hash portable CMS twin " +
        "replays the same estimates oracle-green"),
    "p_quality_gate_approx" -> ("p_quality_gate",
      "approx_percentile cutoffs are sketch-implementation-defined; " +
        "the ≥97% keep-set agreement with the exact gate is " +
        "spec-pinned, the exact gate is oracle-green"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    FilterQueries.oracles ++ StreamAnalogs.oracles ++ Relational.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Fingerprints.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ EventWindows.oracles ++
      TrainingSet.oracles ++ Agreement.oracles ++ Bpe.oracles ++
      WordPiece.oracles ++ Unigram.oracles ++
      CorpusOps.oracles ++ KMeansOps.oracles ++ Retrieval.oracles ++
      BleuEval.oracles ++ Calibration.oracles ++
      Classifier.oracles ++ Projection.oracles ++ Preference.oracles ++
      GraphRank.oracles ++ graft.operators.FuzzyJoin.oracles ++
      graft.operators.BandJoin.oracles ++
      graft.operators.IntervalJoin.oracles ++
      graft.operators.QuantileSketch.oracles ++
      graft.sources.SourceQueries.oracles
}
