package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximation-fidelity AUDIT queries: deterministic agreement metrics
  * between an exact tier and its scale-path approximation, expressed so a
  * SQL oracle can hash-check them. The approximate tiers elsewhere in the
  * engine (MinHash/SimHash/IVF) are hash-seeded and carry recall SPECS;
  * these two queries complement them by making approximation error itself
  * an oracle-checkable result:
  *
  *   - [[Agreement.gateAgreement]]: the per-language quality-percentile
  *     gate computed exactly (full percent_rank) vs. from a deterministic
  *     hash sample (the shape a 100 TB corpus uses — a 30% sample's
  *     discrete p25 as the cutoff). Both sides are pure rank/compare
  *     logic over identical doubles, so keep/drop counts match any
  *     engine bit-for-bit — no interpolation arithmetic to drift.
  *   - capped-pair drift (in [[Agreement.queries]]): the exact n-gram
  *     Jaccard pair set vs. the df-capped production tier, emitting the
  *     symmetric difference with each pair's own-tier similarity. The
  *     fixture cap (df ≤ 2) is chosen BELOW the corpus's max shingle df
  *     so the drift is non-empty: a 3-doc near-dup clique's shared
  *     shingles have df = 3 and are all dropped — the exact failure mode
  *     (cliques just over the cap) an operator of the capped tier must
  *     size its cap against.
  */
object Agreement {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic 30% sample: Knuth multiplicative hash on the id.
    * Content- and partitioning-independent (same sample on every run,
    * retry, and layout), and plain 64-bit arithmetic any SQL engine
    * reproduces exactly — unlike `rand()` or `TABLESAMPLE`. The id is
    * reduced mod a prime FIRST so the product stays ≤ ~2.7e15: a raw
    * 64-bit id times the Knuth constant overflows int64, which under
    * ANSI mode (Spark 4 default) is a runtime error and in DuckDB an
    * overflow error — not a silent wrap on either engine.
    */
  private def inSample(id: org.apache.spark.sql.Column) =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(10)) < 3

  /** Exact vs. sampled per-language quality gate, as per-language
    * keep-set counts: `n_exact` (percent_rank ≥ p over all docs),
    * `n_approx` (quality ≥ the sample's discrete p-th percentile), and
    * `n_common`. The sampled cutoff is `min(quality)` over sample rows
    * with in-sample percent_rank ≥ p — a discrete percentile, i.e. an
    * ACTUAL data value, so the `quality >= cut` comparison never touches
    * interpolated arithmetic. At scale the exact side's per-language
    * full sort disappears and only the sample is ranked; this query
    * measures what that buys and what it costs, per language.
    */
  def gateAgreement(docs: DataFrame, p: Double): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = Window.partitionBy(col("lang")).orderBy(col("quality"))
    val cuts = scored.filter(inSample(col("doc_id")))
      .withColumn("spr", percent_rank().over(w))
      .filter(col("spr") >= p)
      .groupBy("lang").agg(min("quality").as("cut"))
    // cuts is ≤ one row per language — always broadcast-sized. A language
    // absent from the sample yields no cut row: the left join's null cut
    // makes `quality >= cut` null, and count(when(...)) skips it — the
    // same FILTER(WHERE ...) null semantics the oracle uses.
    scored.withColumn("pr", percent_rank().over(w))
      .join(broadcast(cuts), Seq("lang"), "left")
      .groupBy("lang").agg(
        count(when(col("pr") >= p, lit(1))).as("n_exact"),
        count(when(col("quality") >= col("cut"), lit(1))).as("n_approx"),
        count(when(col("pr") >= p && col("quality") >= col("cut"), lit(1)))
          .as("n_common"))
  }

  /** Symmetric difference of two (da, db, jaccard) pair sets, each row
    * tagged with the side that produced it and that side's own jaccard.
    * Both inputs are PERSISTED first (lazy `persist()`): each side
    * feeds both anti-join directions, and uncached the full pair-tier
    * lineage (scan + shingle pass + posting join) re-executed per
    * direction — the diamond-reuse rule. The cached frames are
    * candidate-pair-sized (bounded by the tiers' own caps), trivial at
    * any scale; persist (vs checkpoint) keeps lineage for executor-loss
    * recovery and launches no job at build time.
    */
  def pairDrift(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.persist()
    val x = approx.persist()
    def minus(a: DataFrame, b: DataFrame, tag: String) =
      a.join(b.select("da", "db"), Seq("da", "db"), "left_anti")
        .select(col("da"), col("db"),
          round(col("jaccard"), 4).as("jaccard"), lit(tag).as("side"))
    minus(e, x, "lost").union(minus(x, e, "gained"))
  }

  /** Exact↔capped drift from ONE posting-list pass: the exact tier's
    * all-shingle enumeration subsumes the capped tier's, so instead of
    * running `jaccardPairs` twice and anti-joining (two scans, two
    * posting builds, two join trees — measured 8.2 s at sf0.1), each
    * candidate pair carries its shared-shingle count over BOTH spaces
    * (`i_all`, and `i_rare = i_all − i_hot` via a per-shingle hot flag)
    * and both Jaccards come out of the same aggregation. Semantics are
    * identical to the two-tier formulation (AgreementSpec pins the
    * output to the independently-computed set difference); a pair whose
    * shared shingles are all hot gets a null capped-space Jaccard
    * (0/0), which coalesces to not-in-capped — exactly the capped
    * tier's absence.
    */
  def cappedDriftOnePass(docs: DataFrame, threshold: Double,
      maxDf: Int): DataFrame = {
    val spreadDocs = graft.Tables.spread(docs)
    val exploded = spreadDocs.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("text"))).as("s"))
    val hot = exploded.groupBy("s").agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") > maxDf).select(col("s"), lit(1L).as("hot"))
    val flagged = exploded.join(hot, Seq("s"), "left")
      .select(col("doc_id"), col("s"),
        coalesce(col("hot"), lit(0L)).as("hot"))
    val inter = flagged.groupBy("s")
      .agg(collect_list(col("doc_id")).as("ids"), first(col("hot")).as("h"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("da"), col("ids"), col("h"))
      .select(col("da"), explode(col("ids")).as("db"), col("h"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("i_all"), sum("h").as("i_hot"))
    val nAll = spreadDocs.select(col("doc_id"),
      size(Dedup.shingleHashes(col("text"))).cast("long").as("n_all"))
    val sizes = nAll
      .join(flagged.filter(col("hot") === 1)
          .groupBy("doc_id").agg(count(lit(1)).as("nh")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_all"),
        (col("n_all") - coalesce(col("nh"), lit(0L))).as("n_rare"))
    val iRare = col("i_all") - col("i_hot")
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("i_all") /
          (col("sa.n_all") + col("sb.n_all") - col("i_all")))
          .as("j_exact"),
        // try_divide: an all-hot pair has 0 rare shingles on both sides
        // (0/0) — under ANSI that must be null-not-error; the null
        // coalesces to not-in-capped below, the capped tier's absence
        try_divide(iRare, col("sa.n_rare") + col("sb.n_rare") - iRare)
          .as("j_capped"))
      .select(col("da"), col("db"), col("j_exact"), col("j_capped"),
        (col("j_exact") >= threshold).as("in_exact"),
        coalesce(col("j_capped") >= threshold, lit(false)).as("in_capped"))
      .filter(col("in_exact") =!= col("in_capped"))
      .select(col("da"), col("db"),
        round(when(col("in_exact"), col("j_exact"))
          .otherwise(col("j_capped")), 4).as("jaccard"),
        when(col("in_exact"), "lost").otherwise("gained").as("side"))
  }

  val queries: Map[String, Q] = Map(
    "a_gate_agreement" -> { (s, d) =>
      gateAgreement(Tables.documents(s, d), 0.25).orderBy("lang")
    },
    // Full-corpus drift audit with a SCALE-SAFE exact side: the exact
    // pair set comes from [[Dedup.prefixJaccardPairs]] (AllPairs/PPJoin
    // prefix filtering — provably lossless, candidates bounded by the
    // (1−t) prefix instead of all-pairs posting lists), the capped set
    // from the df-capped production tier, and the drift is their
    // symmetric difference. Identical output to the one-pass all-pairs
    // formulation (same oracle), but the uncapped posting-list self-join
    // — measured 82 s at sf0.1, 41% of the whole bench, quadratic in
    // hot-shingle df at scale — is gone. [[cappedDriftOnePass]] stays
    // available for offline audits but is deliberately not registered.
    "a_capped_pair_drift" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      // ONE shingle explode feeds BOTH tiers through their From-seams
      // (r16): the exact prefix tier and the capped tier each shingled
      // the corpus independently — a full split+hash pass per tier plus
      // two separate caches of the identical frame. Sizes derive from
      // the shared cache (the jaccardPairs count≡size argument).
      val exploded = Tables.spread(docs)
        .select(col("doc_id"),
          explode(Dedup.shingleHashes(col("text"))).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rawSizes = exploded.groupBy("doc_id")
        .agg(count(lit(1)).as("n0"))
      pairDrift(Dedup.prefixJaccardPairsFrom(exploded, 0.8),
          Dedup.jaccardPairsFrom(exploded, rawSizes, 0.8, maxDf = 2))
        .orderBy("da", "db", "side")
    },
    // Cross-source contamination matrix: for every source pair, how many
    // distinct winnowing fingerprints they share — the audit that tells
    // you two "independent" crawls are actually mirroring each other
    // (and that a benchmark source leaked into a training source)
    // BEFORE composition weights are chosen. Shape at scale: the
    // (source, fp) frame is DISTINCT-collapsed first, so each
    // fingerprint's posting list is bounded by |sources| regardless of
    // how many documents carry it — the self-join emits at most
    // |sources|²/2 rows per fingerprint and the result is
    // |sources|²-sized. Nothing here scales with corpus size except
    // the one winnow pass (2n/(w+1) fingerprints, one doc_id shuffle).
    "a_source_overlap" -> { (s, d) =>
      sourceOverlap(Tables.documents(s, d)).orderBy("src_a", "src_b")
    },
    // Poisson-bootstrap CI for mean tokens/doc — uncertainty for a
    // corpus statistic, computed the only way a 100 TB scan can
    "a_bootstrap_ci" -> { (s, d) =>
      bootstrapCi(Tables.documents(s, d)).orderBy("b")
    })

  /** Poisson-bootstrap confidence interval for mean tokens/doc — the
    * bootstrap that actually runs at 100 TB. Classical bootstrap
    * resamples by INDEX (draw n rows with replacement), which a
    * distributed scan cannot do; the Poisson bootstrap (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012)
    * replaces index draws with an independent per-row replicate weight
    * w ~ Poisson(1) — the multiset a with-replacement resample induces,
    * row-locally. Here the draw is DETERMINISTIC: 5 md5 nibbles of
    * (doc_id, replicate) inverse-CDF'd through integer thresholds
    * ⌊F(k)·16⁵⌋, so both engines reproduce the identical weight table
    * (the [[inSample]] discipline, one hash deeper).
    *
    * Shape at scale: the corpus×B explode never reaches a shuffle — the
    * per-replicate sums are map-side combined to ≤B rows per partition,
    * so the exchange carries B·partitions rows regardless of corpus
    * size; the final rank-and-CI window touches B rows. All replicate
    * arithmetic is integer-exact (sums of longs, one integer division
    * onto the micro grid); int64 headroom: Σtokens·1e6 per replicate
    * caps the corpus at ~9e12 tokens before the micro product overflows
    * — raise the grid divisor at that scale. The CI is the discrete
    * 5th/95th percentile of the B replicate means (rank-selected actual
    * values, no interpolation — the a_gate_agreement discipline).
    */
  def bootstrapCi(docs: DataFrame, reps: Int = 64): DataFrame = {
    require(reps >= 20 && reps <= 4096,
      s"reps=$reps: the replicate frame is window-ranked, keep it small")
    val thresholds = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L,
      1047952L)
    val ex = Tables.spread(docs).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        explode(sequence(lit(0), lit(reps - 1))).as("b0"))
      .select(col("doc_id"), col("n_tok"), col("b0").cast("long").as("b"))
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), col("b").cast("string"), lit(":bsci"))), 1, 5), 16, 10)
      .cast("long")
    val w = thresholds.map(t => when(h >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val rep = ex.select(col("b"), col("n_tok"), w.as("w"))
      .groupBy("b").agg(sum(col("w")).as("n_drawn"),
        sum(col("w") * col("n_tok")).as("wtok"))
      .select(col("b"), col("n_drawn"),
        when(col("n_drawn") === 0L, 0L)
          .otherwise(expr("wtok * 1000000 DIV n_drawn")).as("mean_micro"))
    val lo = math.ceil(0.05 * reps).toInt
    val hi = math.ceil(0.95 * reps).toInt
    // rank + CI in ONE window pass over the B-row frame (a cross join
    // against a separately-aggregated CI frame would re-execute the
    // corpus lineage — two scans for one result)
    val all = Window.orderBy(col("mean_micro"), col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rep.withColumn("r", row_number().over(
        Window.orderBy(col("mean_micro"), col("b"))))
      .select(col("b"), col("n_drawn"), col("mean_micro"),
        max(when(col("r") === lo, col("mean_micro"))).over(all)
          .as("lo_micro"),
        max(when(col("r") === hi, col("mean_micro"))).over(all)
          .as("hi_micro"))
  }

  /** (src_a, src_b, n_shared_fp) for src_a < src_b — distinct winnowing
    * fingerprints shared by each source pair (see the a_source_overlap
    * scaladoc above for the scale argument).
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    // the distinct-collapsed (source, fp) frame feeds BOTH sides of the
    // self-join — lazy persist per the diamond rule ([[pairDrift]]), or
    // the winnow pass (the engine's most expensive per-token rolling-
    // hash expression) plus the join+distinct executes twice. The
    // cached frame is ≤ |distinct fingerprints|·|sources| rows of two
    // columns — far below the corpus at any scale (DiamondReuseSpec
    // gates the reuse; the caller/harness owns release).
    val fp = Fingerprints.winnow(docs)
      .join(Tables.spread(docs).select("doc_id", "source"), "doc_id")
      .select("source", "fp").distinct().persist()
    fp.select(col("source").as("src_a"), col("fp"))
      .join(fp.select(col("source").as("src_b"), col("fp")), "fp")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared_fp"))
  }

  private val pairCtes =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(t) - 2, 1) + 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) s
      |  FROM toks WHERE len(t) >= 3),
      |df AS (SELECT s, count(*) c FROM sh GROUP BY s),
      |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN df USING(s)
      |        WHERE c <= 2),
      |sizes0 AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |inter0 AS (
      |  SELECT a.doc_id da, b.doc_id db, count(*) i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |exact AS (
      |  SELECT da, db, i * 1.0 / (sa.n + sb.n - i) j FROM inter0
      |  JOIN sizes0 sa ON sa.doc_id = da
      |  JOIN sizes0 sb ON sb.doc_id = db
      |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
      |sizes1 AS (SELECT doc_id, count(*) n FROM shc GROUP BY doc_id),
      |inter1 AS (
      |  SELECT a.doc_id da, b.doc_id db, count(*) i
      |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |capped AS (
      |  SELECT da, db, i * 1.0 / (sa.n + sb.n - i) j FROM inter1
      |  JOIN sizes1 sa ON sa.doc_id = da
      |  JOIN sizes1 sb ON sb.doc_id = db
      |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the 5-nibble md5 value and the ⌊F(k)·16⁵⌋ Poisson(1) thresholds
    // mirror bootstrapCi exactly; all replicate arithmetic is integer,
    // every sum CAST to BIGINT (DuckDB types sum(BIGINT) as HUGEINT —
    // the round-8 red-row class this repo now fences against)
    "a_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) n_tok
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id, n_tok, CAST(i AS BIGINT) b
        |  FROM base, unnest(range(0, 64)) u(i)),
        |hv AS (
        |  SELECT b, n_tok,
        |    (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 65536 +
        |    (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 4096 +
        |    (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 256 +
        |    (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(m, 5, 1)) - 1) AS h
        |  FROM (SELECT b, n_tok,
        |          md5(CAST(doc_id AS VARCHAR) || ':' ||
        |              CAST(b AS VARCHAR) || ':bsci') m
        |        FROM ex)),
        |wv AS (
        |  SELECT b, n_tok,
        |    CAST(h >= 385749 AS BIGINT) + CAST(h >= 771499 AS BIGINT) +
        |    CAST(h >= 964373 AS BIGINT) + CAST(h >= 1028665 AS BIGINT) +
        |    CAST(h >= 1044738 AS BIGINT) + CAST(h >= 1047952 AS BIGINT)
        |      AS w
        |  FROM hv),
        |rep AS (
        |  SELECT b, CAST(sum(w) AS BIGINT) n_drawn,
        |    CASE WHEN sum(w) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(sum(w * n_tok) AS BIGINT) * 1000000
        |              // CAST(sum(w) AS BIGINT) END AS mean_micro
        |  FROM wv GROUP BY b),
        |rk AS (
        |  SELECT mean_micro, row_number() OVER (
        |    ORDER BY mean_micro, b) AS r FROM rep),
        |ci AS (
        |  SELECT max(CASE WHEN r = 4 THEN mean_micro END) lo_micro,
        |         max(CASE WHEN r = 61 THEN mean_micro END) hi_micro
        |  FROM rk)
        |SELECT b, n_drawn, mean_micro, lo_micro, hi_micro
        |FROM rep CROSS JOIN ci ORDER BY b""".stripMargin,
    "a_gate_agreement" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang,
        |    0.4 * (len(list_distinct(t)) / (len(t) * 1.0)) +
        |    0.3 * (1.0 - len(list_filter(t,
        |      x -> list_contains(['the','a','of','and','to'], x))) /
        |      (len(t) * 1.0)) +
        |    0.3 * least(len(t) / 100.0, 1.0) AS quality
        |  FROM toks),
        |pr AS (
        |  SELECT doc_id, lang, quality, percent_rank() OVER (
        |    PARTITION BY lang ORDER BY quality) AS pr
        |  FROM q),
        |smp AS (
        |  SELECT lang, quality, percent_rank() OVER (
        |    PARTITION BY lang ORDER BY quality) AS spr
        |  FROM q WHERE ((doc_id % 1000003) * 2654435761) % 10 < 3),
        |cuts AS (
        |  SELECT lang, min(quality) AS cut FROM smp
        |  WHERE spr >= 0.25 GROUP BY lang)
        |SELECT pr.lang,
        |  count(*) FILTER (WHERE pr >= 0.25) AS n_exact,
        |  count(*) FILTER (WHERE quality >= cut) AS n_approx,
        |  count(*) FILTER (WHERE pr >= 0.25 AND quality >= cut)
        |    AS n_common
        |FROM pr LEFT JOIN cuts USING (lang)
        |GROUP BY pr.lang ORDER BY pr.lang""".stripMargin,
    "a_capped_pair_drift" -> (pairCtes +
      """
        |SELECT da, db, round(j, 4) AS jaccard, 'lost' AS side
        |FROM exact e
        |WHERE NOT EXISTS (SELECT 1 FROM capped c
        |                  WHERE c.da = e.da AND c.db = e.db)
        |UNION ALL
        |SELECT da, db, round(j, 4) AS jaccard, 'gained' AS side
        |FROM capped c
        |WHERE NOT EXISTS (SELECT 1 FROM exact e
        |                  WHERE e.da = c.da AND e.db = c.db)
        |ORDER BY da, db, side""".stripMargin),
    // reuses the winnow oracle verbatim as a subquery, so the two
    // queries can never disagree about what a fingerprint is
    "a_source_overlap" ->
      s"""WITH wfp AS (
         |  SELECT * FROM (
         |${Fingerprints.oracles("d_winnow_fingerprint")}
         |  ) q),
         |fs AS (
         |  SELECT DISTINCT d.source, w.fp
         |  FROM wfp w JOIN documents d USING (doc_id))
         |SELECT a.source AS src_a, b.source AS src_b,
         |  count(*) AS n_shared_fp
         |FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
