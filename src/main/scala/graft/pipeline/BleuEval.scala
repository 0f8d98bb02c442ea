package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BLEU statistics — the n-gram-overlap half of generation eval
  * (Papineni et al. 2002), joining nDCG ([[Retrieval]]) and the
  * win-rate CIs ([[Preference]], [[Agreement]]) in the eval family.
  *
  * The operator computes, per (candidate, reference) pair and per n in
  * 1..4, the EXACT integer sufficient statistics of BLEU: clipped
  * modified n-gram matches (`Σ_g min(cnt_cand(g), cnt_ref(g))`), the
  * candidate n-gram total, both lengths, and the DIV-exact micro
  * precisions. Deliberately NOT the combined geometric-mean score: that
  * needs `exp`/4th roots (float, engine-divergent at ulp boundaries),
  * while corpus BLEU is a function of the SUMS of these statistics —
  * the caller aggregates matches/totals/lengths and applies the
  * brevity penalty driver-side, which is also the statistically right
  * order (corpus BLEU is not the mean of sentence BLEUs). Every cell
  * here is BIGINT, so the DuckDB twin hash-matches.
  *
  * Scale shape: gram counting is one groupBy per side on the
  * (pair, n, gram) key; the clip join runs on the same key the counts
  * were just partitioned by (no extra exchange beyond the aggregation's
  * own), and everything downstream is (pairs × 4)-sized. Pair-mass
  * linear — the corpus is scanned once per side.
  *
  * The registry query demonstrates it reference-free (the
  * [[TrainingSet]] p_sft_pairs synthesis discipline): the reference is
  * each document's own token stream and the candidate is the same
  * stream with ~1/16 of tokens deterministically dropped (first md5
  * nibble of `doc_id:pos:bleu`), so precisions near 1e6 and a brevity
  * gap are both exercised and the twin re-derives the identical pair.
  */
object BleuEval {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column =
    filter(split(c, " "), w => length(w) > 0)

  /** BLEU sufficient statistics per pair and n in 1..maxN.
    * Input: (pair_id, cand, ref) with token-array sides.
    * Output: pair_id, n, cand_len, ref_len, len_ratio_micro, matches,
    * total, p_micro — all BIGINT, DIV-exact.
    */
  def bleuStats(pairs0: DataFrame, maxN: Int = 4,
      retain: DataFrame => Unit = _ => ()): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN=$maxN out of the sane band")
    val ns = 1 to maxN
    // the token-array frame feeds a 3-way diamond (cand counts, ref
    // counts, the base lens) — lazy persist per the repo's diamond rule
    // so the side derivations (the candidate's per-token md5 in the
    // registered query) run once, not once per consumer.
    // CACHE LIFETIME: the result is lazy, so this function cannot
    // unpersist without defeating the cache (unlike WordPiece's
    // in-round persists, which bracket their own actions). The CALLER
    // owns release once the result is materialized — the repo-wide
    // diamond contract (DiamondReuseSpec documents and gates it):
    // Verify clearCache()s after every query, Bench before every
    // sample, specs via the shared-session teardown. A long-lived
    // embedder should spark.catalog.clearCache() (or unpersist this
    // frame by plan) after consuming the result — or pass `retain` to
    // receive the handle (the jaccardPairsFrom seam discipline;
    // GenEvalStream releases per micro-batch this way).
    val pairs = pairs0.persist()
    retain(pairs)
    // ONE explode per side covering every n: each row's grams for all
    // n are concatenated as (n, gram) structs, so the side array is
    // evaluated once instead of once per union branch
    def gramCounts(side: String): DataFrame = {
      val structs = ns.map { n =>
        when(size(col(side)) >= n,
          transform(sequence(lit(1), size(col(side)) - (n - 1)),
            i => struct(lit(n).as("n"),
              concat_ws(" ", slice(col(side), i, lit(n))).as("g"))))
          .otherwise(array().cast("array<struct<n:int,g:string>>"))
      }.reduce(concat(_, _))
      pairs.select(col("pair_id"), explode(structs).as("x"))
        .select(col("pair_id"), col("x.n").as("n"), col("x.g").as("g"))
        .groupBy("pair_id", "n", "g")
        .agg(count(lit(1)).as(s"c_$side"))
    }
    val cc = gramCounts("cand")
    val rc = gramCounts("ref")
    val matched = cc.join(rc, Seq("pair_id", "n", "g"))
      .groupBy("pair_id", "n")
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("matches"))
    val totals = cc.groupBy("pair_id", "n")
      .agg(sum(col("c_cand")).as("total"))
    val base = pairs.select(col("pair_id"),
        size(col("cand")).cast("long").as("cand_len"),
        size(col("ref")).cast("long").as("ref_len"),
        explode(sequence(lit(1), lit(maxN))).as("n"))
    base.join(totals, Seq("pair_id", "n"), "left")
      .join(matched, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("n").cast("long").as("n"),
        col("cand_len"), col("ref_len"),
        when(col("ref_len") > 0, expr("cand_len * 1000000 DIV ref_len"))
          .otherwise(0L).as("len_ratio_micro"),
        coalesce(col("matches"), lit(0L)).as("matches"),
        coalesce(col("total"), lit(0L)).as("total"))
      .withColumn("p_micro",
        when(col("total") > 0, expr("matches * 1000000 DIV total"))
          .otherwise(0L))
  }

  /** chrF sufficient statistics (Popović 2015) — the char-n-gram third
    * of the standard generation-eval trio (BLEU precision, ROUGE-L LCS,
    * chrF character F). Per pair and n in 1..maxN: clipped char-n-gram
    * matches, BOTH totals (chrF is an F-score, so recall's denominator
    * ships too), and the DIV-exact micro precision/recall. The β²
    * combination stays caller-side for the same reason BLEU's geometric
    * mean does: corpus chrF aggregates the SUMS, and the float β-mix
    * belongs past the exact-integer boundary. Input: (pair_id, cand,
    * ref) as STRING sides (char grams, not token grams).
    *
    * Scale shape mirrors [[bleuStats]]: one explode per side covering
    * every n, gram counting behind map-side partial aggregation, the
    * clip join on the key the counts are already partitioned by,
    * everything downstream (pairs × maxN)-sized.
    */
  def chrfStats(pairs0: DataFrame, maxN: Int = 6,
      retain: DataFrame => Unit = _ => ()): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN=$maxN out of the sane band")
    val ns = 1 to maxN
    // same 3-way diamond as bleuStats (cand grams, ref grams, the base
    // spine) — lazy persist, CALLER owns release once materialized
    // (`retain` hands out the handle, the bleuStats contract)
    val pairs = pairs0.persist()
    retain(pairs)
    def gramCounts(side: String): DataFrame = {
      val structs = ns.map { n =>
        when(length(col(side)) >= n,
          transform(sequence(lit(1), length(col(side)) - (n - 1)),
            i => struct(lit(n).as("n"), col(side).substr(i, lit(n)).as("g"))))
          .otherwise(array().cast("array<struct<n:int,g:string>>"))
      }.reduce(concat(_, _))
      pairs.select(col("pair_id"), explode(structs).as("x"))
        .select(col("pair_id"), col("x.n").as("n"), col("x.g").as("g"))
        .groupBy("pair_id", "n", "g")
        .agg(count(lit(1)).as(s"c_$side"))
    }
    val cc = gramCounts("cand")
    val rc = gramCounts("ref")
    val matched = cc.join(rc, Seq("pair_id", "n", "g"))
      .groupBy("pair_id", "n")
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("matches"))
    val ct = cc.groupBy("pair_id", "n")
      .agg(sum(col("c_cand")).as("cand_total"))
    val rt = rc.groupBy("pair_id", "n")
      .agg(sum(col("c_ref")).as("ref_total"))
    val base = pairs.select(col("pair_id"),
      explode(sequence(lit(1), lit(maxN))).as("n"))
    base.join(ct, Seq("pair_id", "n"), "left")
      .join(rt, Seq("pair_id", "n"), "left")
      .join(matched, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("n").cast("long").as("n"),
        coalesce(col("matches"), lit(0L)).as("matches"),
        coalesce(col("cand_total"), lit(0L)).as("cand_total"),
        coalesce(col("ref_total"), lit(0L)).as("ref_total"))
      .withColumn("p_micro",
        when(col("cand_total") > 0, expr("matches * 1000000 DIV cand_total"))
          .otherwise(0L))
      .withColumn("r_micro",
        when(col("ref_total") > 0, expr("matches * 1000000 DIV ref_total"))
          .otherwise(0L))
  }

  /** The deterministic candidate side: each 1-based token position
    * survives unless the first md5 nibble of `doc_id:pos:bleu` is '0'.
    */
  def corruptedCandidate(docId: Column, ref: Column): Column =
    transform(
      filter(zip_with(ref, sequence(lit(1), size(ref)),
          (t, i) => struct(t.as("t"), i.as("i"))),
        s => DetDraw.keepGate(docId, s.getField("i"), lit("bleu"))),
      s => s.getField("t"))

  /** `base` with 1-based positions dropped when the first md5 nibble of
    * `pair_id:pos:tag` is '0' (~1/16) — the deterministic, engine-portable
    * corruption both ROUGE sides use (different tags ⇒ different drop
    * sets, so NEITHER side is a subsequence of the other and the LCS is a
    * real alignment, not trivially `cand_len`).
    */
  private def droppedSide(pairId: Column, base: Column,
      tag: String): Column =
    when(size(base) >= 1, transform(
      filter(zip_with(base, sequence(lit(1), size(base)),
          (t, i) => struct(t.as("t"), i.as("i"))),
        x => DetDraw.keepGate(pairId, x.getField("i"), lit(tag))),
      x => x.getField("t")))
      .otherwise(array().cast("array<string>"))

  /** The registered a_bleu pair frame from a (doc_id, text) docs frame —
    * ONE definition shared by the batch query and [[graft.streaming
    * .GenEvalStream]], so stream ≡ batch is by construction.
    */
  def bleuPairsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("pair_id"), toks(col("text")).as("ref"))
      .select(col("pair_id"),
        corruptedCandidate(col("pair_id"), col("ref")).as("cand"),
        col("ref"))

  /** The registered a_rouge_l pair frame — same sharing contract as
    * [[bleuPairsOf]]: ONE definition for the batch query and
    * [[graft.streaming.GenEvalStream]], 40-token sides (the
    * bounded-generation contract), different md5 drop tags per side so
    * the LCS is a real alignment.
    */
  def rougePairsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("pair_id"),
        slice(toks(col("text")), 1, 40).as("base"))
      .select(col("pair_id"),
        droppedSide(col("pair_id"), col("base"), "rougeC").as("cand"),
        droppedSide(col("pair_id"), col("base"), "rougeR").as("ref"))

  /** Per-pair ROUGE-L sufficient statistics — (pair_id, cand_len,
    * ref_len, lcs), all BIGINT, the [[graft.functions.LcsLength]]
    * codegen DP per row, no shuffle. Pair-LOCAL like the BLEU/chrF
    * stats, so per-batch sums partition the corpus sums and the
    * streaming twin is exact under any split.
    */
  def rougeRows(pairs: DataFrame): DataFrame =
    pairs.select(col("pair_id"),
      size(col("cand")).cast("long").as("cand_len"),
      size(col("ref")).cast("long").as("ref_len"),
      graft.functions.LcsLength.lcs_length(col("cand"), col("ref"))
        .cast("long").as("lcs"))

  /** The registered a_chrf pair frame — same sharing contract. */
  def chrfPairsOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("pair_id"), toks(col("text")).as("t"),
        substring(translate(col("text"), " ", ""), 1, 240).as("ref"))
      .select(col("pair_id"),
        substring(concat_ws("",
          droppedSide(col("pair_id"), col("t"), "chrf")), 1, 240)
          .as("cand"),
        col("ref"))

  val queries: Map[String, Q] = Map(
    "a_bleu" -> { (s, d) =>
      bleuStats(bleuPairsOf(Tables.spread(Tables.documents(s, d))))
        .orderBy("pair_id", "n")
    },
    // ROUGE-L (Lin 2004) — the LCS half of generation eval, completing
    // BLEU's n-gram-precision half: per pair, the token-level LCS length
    // plus DIV-exact micro precision/recall/F. The LCS runs in the custom
    // codegen'd [[graft.functions.LcsLength]] Expression (per-row two-row
    // DP — no shuffle, no UDF boxing; scan throughput at any corpus
    // size). Tokens cap at the first 40 per side so the DuckDB twin — a
    // recursive-CTE replay of the SAME DP via the prefix-max row
    // recurrence — stays tractable; the Spark side has no such need (the
    // cap is the CONTRACT here, not a limitation: ROUGE-L in eval
    // harnesses scores bounded generations, not whole documents).
    // Sides drop ~1/16 of positions under DIFFERENT md5 tags, so neither
    // side embeds in the other and the DP does real work.
    "a_rouge_l" -> { (s, d) =>
      rougeRows(rougePairsOf(Tables.spread(Tables.documents(s, d))))
        .withColumn("p_micro", when(col("cand_len") > 0,
          expr("lcs * 1000000 DIV cand_len")).otherwise(0L))
        .withColumn("r_micro", when(col("ref_len") > 0,
          expr("lcs * 1000000 DIV ref_len")).otherwise(0L))
        .withColumn("f_micro", when(col("p_micro") + col("r_micro") > 0,
          expr("(2 * p_micro * r_micro) DIV (p_micro + r_micro)"))
          .otherwise(0L))
        .orderBy("pair_id")
    },
    // chrF: char-n-gram (n=1..6) clipped matches + both totals over
    // space-stripped sides capped at 240 chars (the oracle-tractability
    // cap doubling as the bounded-generation contract, like ROUGE's 40
    // tokens). cand drops ~1/16 of TOKENS (tag 'chrf') before the char
    // join — chrF's whole point is scoring through tokenization
    // differences at the char level.
    "a_chrf" -> { (s, d) =>
      chrfStats(chrfPairsOf(Tables.spread(Tables.documents(s, d))))
        .orderBy("pair_id", "n")
    },
    // pass@k (Chen et al. 2021, HumanEval §2.1) — THE code-eval
    // estimator: for a problem with n samples of which c pass,
    // pass@k = 1 − C(n−c, k)/C(n, k), the unbiased probability that at
    // least one of k drawn samples passes. n = 10 samples per problem
    // (doc), each sample's verdict a [[DetDraw]] draw gated by a
    // per-problem rate (draws 30-80%), so c varies realistically.
    // EXACT integers end to end: the binomial ratio is the telescoped
    // product Π_{i<k}(n−c−i)/Π_{i<k}(n−i) — numerator terms clamped at
    // 0 (k > n−c ⇒ some term 0 ⇒ certainty), denominators literal
    // constants, ONE micro DIV per k. Per-row expressions only (the
    // sample loop is an `aggregate` over sequence(1,10), no explode) —
    // scan throughput at any corpus size.
    "a_pass_at_k" -> { (s, d) =>
      val n = 10
      val thr = (DetDraw.draw(4, col("doc_id"), lit("passrate")) % 500L) +
        lit(300L)
      val c = aggregate(sequence(lit(1), lit(n)), lit(0L), (acc, j) =>
        acc + when(
          DetDraw.draw(4, col("doc_id"), j, lit("pass")) % 1000L < thr,
          1L).otherwise(0L))
      def passK(k: Int): Column = {
        val den = (0 until k).map(i => (n - i).toLong).product
        val num = (0 until k)
          .map(i => s"greatest($n - c - $i, 0)").mkString(" * ")
        expr(s"1000000 - ($num) * 1000000 DIV $den")
      }
      Tables.spread(Tables.documents(s, d))
        .filter(col("text").isNotNull)
        .select(col("doc_id"), lit(n.toLong).as("n_samples"), c.as("c"))
        .select(col("doc_id"), col("n_samples"), col("c"),
          passK(1).as("pass1_micro"), passK(5).as("pass5_micro"),
          passK(10).as("pass10_micro"))
        .orderBy("doc_id")
    },
    // distinct-n (Li et al. 2016) — the standard generation-DIVERSITY
    // metric BLEU/ROUGE can't see (a high-overlap generator can still
    // be degenerate): per doc, unique/total ratios for unigrams and
    // bigrams on the micro grid. Bigram keys join tokens with a space —
    // collision-free because tokens are split ON spaces. Pure per-row
    // array expressions, zero shuffles beyond the oracle-edge orderBy.
    "a_distinct_n" -> { (s, d) =>
      val t = toks(col("text"))
      val bi = when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1), i =>
          concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
        .otherwise(array().cast("array<string>"))
      Tables.spread(Tables.documents(s, d))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("uniq1"),
          size(bi).cast("long").as("n_bi"),
          size(array_distinct(bi)).cast("long").as("uniq2"))
        .select(col("doc_id"), col("n_tokens"), col("uniq1"),
          when(col("n_tokens") > 0, expr("uniq1 * 1000000 DIV n_tokens"))
            .otherwise(0L).as("distinct1_micro"),
          col("uniq2"),
          when(col("n_bi") > 0, expr("uniq2 * 1000000 DIV n_bi"))
            .otherwise(0L).as("distinct2_micro"))
        .orderBy("doc_id")
    })

  /** DuckDB twin of a_pass_at_k: the same DetDraw gates (shared
    * fragment builder) and the same clamped telescoped binomial
    * products — all-integer, so the rows hash-match exactly.
    */
  private def passAtKOracle: String = {
    val thr = s"300 + ${DetDraw.sqlDraw(4, "doc_id", "'passrate'")} % 500"
    val gate =
      s"${DetDraw.sqlDraw(4, "doc_id", "j", "'pass'")} % 1000 < thr"
    def passK(k: Int): String = {
      val den = (0 until k).map(i => (10 - i).toLong).product
      val num = (0 until k).map(i => s"greatest(10 - c - $i, 0)")
        .mkString(" * ")
      s"CAST(1000000 - ($num) * 1000000 // $den AS BIGINT)"
    }
    s"""WITH base AS (
       |  SELECT doc_id, $thr AS thr
       |  FROM documents WHERE text IS NOT NULL),
       |cs AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(range(1, 11), j -> $gate)) AS BIGINT) AS c
       |  FROM base)
       |SELECT doc_id, CAST(10 AS BIGINT) AS n_samples, c,
       |  ${passK(1)} AS pass1_micro,
       |  ${passK(5)} AS pass5_micro,
       |  ${passK(10)} AS pass10_micro
       |FROM cs ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "a_pass_at_k" -> passAtKOracle,
    "a_distinct_n" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(t)) AS BIGINT) AS uniq1,
        |    CASE WHEN len(t) >= 2
        |         THEN list_transform(range(1, len(t)),
        |                i -> t[i] || ' ' || t[i + 1])
        |         ELSE []::VARCHAR[] END AS bi
        |  FROM tk)
        |SELECT doc_id, n_tokens, uniq1,
        |  CAST(CASE WHEN n_tokens > 0 THEN uniq1 * 1000000 // n_tokens
        |       ELSE 0 END AS BIGINT) AS distinct1_micro,
        |  CAST(len(list_distinct(bi)) AS BIGINT) AS uniq2,
        |  CAST(CASE WHEN len(bi) > 0
        |       THEN CAST(len(list_distinct(bi)) AS BIGINT) * 1000000
        |         // len(bi)
        |       ELSE 0 END AS BIGINT) AS distinct2_micro
        |FROM b ORDER BY doc_id""".stripMargin,
    "a_bleu" ->
      """WITH tk AS (
        |  SELECT doc_id AS pair_id,
        |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS r
        |  FROM documents WHERE text IS NOT NULL),
        |pair AS MATERIALIZED (
        |  SELECT pair_id, r,
        |    list_transform(
        |      list_filter(range(1, len(r) + 1), i ->
        |        substr(md5(CAST(pair_id AS VARCHAR) || ':' ||
        |          CAST(i AS VARCHAR) || ':bleu'), 1, 1) != '0'),
        |      i -> r[i]) AS c
        |  FROM tk),
        |ns AS (SELECT unnest(range(1, 5)) AS n),
        |cg AS (
        |  SELECT pair_id, n,
        |    array_to_string(list_slice(c, i, i + n - 1), ' ') AS g,
        |    CAST(count(*) AS BIGINT) AS cc
        |  FROM pair, ns, unnest(range(1, len(c) - n + 2)) u(i)
        |  WHERE len(c) >= n
        |  GROUP BY 1, 2, 3),
        |rg AS (
        |  SELECT pair_id, n,
        |    array_to_string(list_slice(r, i, i + n - 1), ' ') AS g,
        |    CAST(count(*) AS BIGINT) AS rc
        |  FROM pair, ns, unnest(range(1, len(r) - n + 2)) u(i)
        |  WHERE len(r) >= n
        |  GROUP BY 1, 2, 3),
        |mt AS (
        |  SELECT pair_id, n, CAST(sum(least(cc, rc)) AS BIGINT) AS matches
        |  FROM cg JOIN rg USING (pair_id, n, g)
        |  GROUP BY 1, 2),
        |tt AS (
        |  SELECT pair_id, n, CAST(sum(cc) AS BIGINT) AS total
        |  FROM cg GROUP BY 1, 2),
        |base AS (
        |  SELECT pair_id, CAST(n AS BIGINT) AS n,
        |    CAST(len(c) AS BIGINT) AS cand_len,
        |    CAST(len(r) AS BIGINT) AS ref_len
        |  FROM pair, ns)
        |SELECT base.pair_id, base.n, cand_len, ref_len,
        |  CASE WHEN ref_len > 0 THEN cand_len * 1000000 // ref_len
        |       ELSE 0 END AS len_ratio_micro,
        |  coalesce(matches, 0) AS matches,
        |  coalesce(total, 0) AS total,
        |  CASE WHEN coalesce(total, 0) > 0
        |       THEN coalesce(matches, 0) * 1000000 // total
        |       ELSE 0 END AS p_micro
        |FROM base
        |LEFT JOIN tt ON tt.pair_id = base.pair_id AND tt.n = base.n
        |LEFT JOIN mt ON mt.pair_id = base.pair_id AND mt.n = base.n
        |ORDER BY base.pair_id, base.n""".stripMargin,
    // the SAME two-row LCS DP the custom Expression runs, replayed as a
    // recursive CTE over candidate positions i, carrying the previous DP
    // row as a BIGINT list. The row recurrence uses the prefix-max
    // formulation new[j] = max(prev[j], max_{k<=j}(prev[k-1]+1 when
    // c[i]=r[k])) — equivalent to the textbook three-way recurrence but
    // free of the within-row sequential dependence a list_transform
    // cannot express. `dprow[x]` holds dp[i][x-1] (1-based lists), so
    // prev[j] = dprow[j+1] and prev[k-1] = dprow[k].
    "a_rouge_l" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id AS pair_id,
        |    list_slice(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0), 1, 40) AS base
        |  FROM documents WHERE text IS NOT NULL),
        |pair AS MATERIALIZED (
        |  SELECT pair_id,
        |    list_transform(
        |      list_filter(range(1, len(base) + 1), i ->
        |        substr(md5(CAST(pair_id AS VARCHAR) || ':' ||
        |          CAST(i AS VARCHAR) || ':rougeC'), 1, 1) != '0'),
        |      i -> base[i]) AS c,
        |    list_transform(
        |      list_filter(range(1, len(base) + 1), i ->
        |        substr(md5(CAST(pair_id AS VARCHAR) || ':' ||
        |          CAST(i AS VARCHAR) || ':rougeR'), 1, 1) != '0'),
        |      i -> base[i]) AS r
        |  FROM tk),
        |dp AS (
        |  SELECT pair_id, c, r, 0 AS i,
        |    list_transform(range(0, len(r) + 1),
        |      x -> CAST(0 AS BIGINT)) AS dprow
        |  FROM pair
        |  UNION ALL
        |  SELECT pair_id, c, r, i + 1,
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(r) + 1), j ->
        |        greatest(dprow[j + 1],
        |          list_max(list_transform(range(1, j + 1), k ->
        |            CASE WHEN r[k] = c[i + 1] THEN dprow[k] + 1
        |                 ELSE CAST(0 AS BIGINT) END)))))
        |  FROM dp WHERE i < len(c)),
        |fin AS (
        |  SELECT pair_id, CAST(len(c) AS BIGINT) AS cand_len,
        |    CAST(len(r) AS BIGINT) AS ref_len,
        |    dprow[len(r) + 1] AS lcs
        |  FROM dp WHERE i = len(c)),
        |pr AS (
        |  SELECT pair_id, cand_len, ref_len, lcs,
        |    CASE WHEN cand_len > 0 THEN lcs * 1000000 // cand_len
        |         ELSE 0 END AS p_micro,
        |    CASE WHEN ref_len > 0 THEN lcs * 1000000 // ref_len
        |         ELSE 0 END AS r_micro
        |  FROM fin)
        |SELECT pair_id, cand_len, ref_len, lcs, p_micro, r_micro,
        |  CASE WHEN p_micro + r_micro > 0
        |       THEN (2 * p_micro * r_micro) // (p_micro + r_micro)
        |       ELSE 0 END AS f_micro
        |FROM pr ORDER BY pair_id""".stripMargin,
    // the chrF derivation replayed: same token-drop candidate, same
    // space-strip + 240-char cap, char grams via substr windows
    "a_chrf" ->
      """WITH tk AS (
        |  SELECT doc_id AS pair_id,
        |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS t,
        |    substr(replace(text, ' ', ''), 1, 240) AS ref
        |  FROM documents WHERE text IS NOT NULL),
        |pair AS MATERIALIZED (
        |  SELECT pair_id, ref,
        |    substr(array_to_string(list_transform(
        |      list_filter(range(1, len(t) + 1), i ->
        |        substr(md5(CAST(pair_id AS VARCHAR) || ':' ||
        |          CAST(i AS VARCHAR) || ':chrf'), 1, 1) != '0'),
        |      i -> t[i]), ''), 1, 240) AS cand
        |  FROM tk),
        |ns AS (SELECT unnest(range(1, 7)) AS n),
        |cg AS (
        |  SELECT pair_id, n, substr(cand, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
        |    CAST(count(*) AS BIGINT) AS cc
        |  FROM pair, ns, unnest(range(1, len(cand) - n + 2)) u(i)
        |  WHERE len(cand) >= n
        |  GROUP BY 1, 2, 3),
        |rg AS (
        |  SELECT pair_id, n, substr(ref, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
        |    CAST(count(*) AS BIGINT) AS rc
        |  FROM pair, ns, unnest(range(1, len(ref) - n + 2)) u(i)
        |  WHERE len(ref) >= n
        |  GROUP BY 1, 2, 3),
        |mt AS (
        |  SELECT pair_id, n, CAST(sum(least(cc, rc)) AS BIGINT) AS matches
        |  FROM cg JOIN rg USING (pair_id, n, g) GROUP BY 1, 2),
        |ct AS (SELECT pair_id, n, CAST(sum(cc) AS BIGINT) AS cand_total
        |  FROM cg GROUP BY 1, 2),
        |rt AS (SELECT pair_id, n, CAST(sum(rc) AS BIGINT) AS ref_total
        |  FROM rg GROUP BY 1, 2),
        |base AS (SELECT pair_id, CAST(n AS BIGINT) AS n FROM pair, ns)
        |SELECT base.pair_id, base.n,
        |  coalesce(matches, 0) AS matches,
        |  coalesce(cand_total, 0) AS cand_total,
        |  coalesce(ref_total, 0) AS ref_total,
        |  CASE WHEN coalesce(cand_total, 0) > 0
        |       THEN coalesce(matches, 0) * 1000000 // cand_total
        |       ELSE 0 END AS p_micro,
        |  CASE WHEN coalesce(ref_total, 0) > 0
        |       THEN coalesce(matches, 0) * 1000000 // ref_total
        |       ELSE 0 END AS r_micro
        |FROM base
        |LEFT JOIN ct ON ct.pair_id = base.pair_id AND ct.n = base.n
        |LEFT JOIN rt ON rt.pair_id = base.pair_id AND rt.n = base.n
        |LEFT JOIN mt ON mt.pair_id = base.pair_id AND mt.n = base.n
        |ORDER BY base.pair_id, base.n""".stripMargin)
}
