package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents` (north star): token counting,
  * quality scoring, language-ID. All pure column expressions — codegen'd,
  * shuffle-free per-row transforms; only the final ORDER BY (for the oracle)
  * costs anything, and that disappears under aggregation at scale.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column) = split(c, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(toks(text))

  /** BPE-ish subword estimate: Σ ceil(len(token)/4) — the standard
    * chars/4 heuristic applied per token so short tokens still count 1.
    */
  def subwordEstimate(text: Column): Column =
    aggregate(toks(text), lit(0L),
      (acc, t) => acc + ceil(length(t) / 4.0).cast("long"))

  /** Stopword ratio against a small built-in list. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")
  def stopwordRatio(text: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    size(filter(toks(text), t => array_contains(sw, t))).cast("double") /
      size(toks(text))
  }

  /** Language-ID by marker-token voting: score(lang) = #distinct marker
    * tokens present; argmax wins, ties (incl. all-zero) → "und". A real
    * deployment swaps the marker lists for char-n-gram profiles; the
    * mechanism (membership counting + deterministic argmax) is identical.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("la", "el", "los"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "les", "des"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val distinctToks = array_distinct(toks(text))
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(distinctToks,
        t => array_contains(array(markers.map(lit): _*), t)))
    }
  }

  def predictedLang(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // deterministic argmax: first language (in declaration order) hitting
    // the max; all-zero → "und"
    val folded = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight means earlier langs overwrite later ones on ties
    folded
  }

  /** Explicit HALF-UP rounding: `floor(x·10ˢ + 0.5)/10ˢ`.
    * `round(x, s)` is NOT portable at half boundaries — Spark rounds the
    * exact binary value via BigDecimal HALF_UP while DuckDB rounds the
    * scaled float, and a value landing on a .…5 boundary flips between
    * them (first seen at sf0.1, doc 1017). Spelling the arithmetic out
    * makes both engines compute the identical double. Non-negative inputs
    * only. The oracle SQL must use the same spelled-out form.
    */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }

  def round4HalfUp(c: Column): Column = roundHalfUp(c, 4)

  /** Flesch–Kincaid grade level with a deterministic syllable heuristic:
    * syllables = maximal `[aeiouy]+` runs in the lowercased text (runs
    * can't span the space tokenizer's separators, so the text-level
    * count equals the per-word sum without an explode), sentences =
    * `[.!?]+` runs floored at 1. The grade is the textbook
    * 0.39·(W/S) + 11.8·(Syl/W) − 15.59 with the arithmetic spelled
    * identically in the oracle (same literals, same op order — the
    * float-determinism contract of [[roundHalfUp]]) and the result
    * grid-rounded at 1e-2. Pure per-row codegen'd regex counts — zero
    * shuffles at any corpus size; the counts ship alongside the grade
    * so a downstream gate can threshold on exact integers instead.
    */
  def readability(docs: DataFrame): DataFrame = {
    val w = tokenCount(col("text"))
    val sents = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+")))
    val syl = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    docs.select(
      col("doc_id"),
      w.as("n_words"), sents.as("n_sentences"), syl.as("n_syllables"),
      roundHalfUp(lit(0.39) * (w / sents) +
        lit(11.8) * (syl / w) - lit(15.59), 2).as("fk_grade"))
  }

  /** Hashed-feature linear classifier, fastText-shaped plumbing: each
    * token hashes to a bucket in a 2²⁰ feature space (feature-hashing, so
    * the model is fixed-size regardless of vocabulary), the bucket maps
    * to a weight, and the doc score is the mean token weight. The weight
    * table here is a deterministic affine map of the bucket (a stand-in
    * for trained weights — a real exported model swaps it for an
    * `element_at` into a broadcast weight array, same plan shape), which
    * keeps the whole pipeline — tokenize → hash → look up → mean-pool —
    * ONE codegen'd per-row expression, no shuffle, no UDF, and integer
    * math end-to-end so the oracle recomputes scores bit-identically.
    *
    * Returns the raw integer weight-sum (milli-units): thresholds belong
    * on the exact integer, not on a rounded float. ASCII fixture only
    * (like the rolling-hash oracle): `ascii` is first-byte in Spark vs
    * first-codepoint in DuckDB, identical on ASCII.
    */
  def hashClassifierWeightSum(text: Column): Column =
    aggregate(toks(text), lit(0L), (acc, w) => {
      val feat = length(w).cast("long") * lit(31L) +
        ascii(substring(w, 1, 1)).cast("long") * lit(7L) +
        ascii(substring(w, -1, 1)).cast("long")
      val bucket = (feat * lit(2654435761L)) % lit(1048576L)
      acc + ((bucket * lit(40503L)) % lit(2001L) - lit(1000L))
    })

  /** Composite quality score: 0.4·TTR + 0.3·(1−stopword) + 0.3·length cap.
    * UNROUNDED — round only at output edges; filter thresholds must be
    * chosen with measured margin to the nearest data value.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val ttr = size(array_distinct(toks(text))) / n
    val stop = stopwordRatio(text)
    lit(0.4) * ttr + lit(0.3) * (lit(1.0) - stop) +
      lit(0.3) * least(n / 100.0, lit(1.0))
  }

  /** The Gopher rule battery's stopword list (Rae et al. 2021, App. A1):
    * a doc must contain at least two of these to pass `ok_stopwords`.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document-quality rule battery (Rae et al. 2021,
    * App. A1.1) — the standard pre-training heuristic gate: word-count
    * bounds, mean-word-length band, symbol-to-word ratio, bulleted- and
    * ellipsis-line fractions, alphabetic-word fraction, stopword
    * presence. Complements [[qualityScore]] (a composite score) and
    * `t_repetition` (the repetition half of the Gopher rules) with the
    * structural half.
    *
    * Every ratio threshold is INTEGER cross-multiplication
    * (`10·symbols ≤ words` instead of `symbols/words ≤ 0.1`), so each
    * flag — and therefore the oracle hash — is exact in any engine: no
    * float division ever happens, the t_hash_classifier discipline.
    * Words are the non-empty `[ \n]`-separated runs, lines the non-empty
    * newline-separated runs (explicit empty-filter on BOTH, because
    * engines disagree on trailing-empty split semantics). Pure per-row
    * codegen'd expressions: zero exchanges at any corpus size.
    */
  def gopherRules(docs: DataFrame, text: Column = col("text")): DataFrame = {
    def nonEmpty(a: Column): Column = filter(a, s => s =!= "")
    val words = nonEmpty(split(text, "[ \n]"))
    val lines = nonEmpty(split(text, "\n"))
    val w = size(words).cast("long")
    val l = greatest(lit(1), size(lines)).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, t) => acc + length(t))
    val nHash = (length(text) - length(translate(text, "#", ""))).cast("long")
    val nEll = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
      .cast("long")
    val nBullet = size(filter(lines, ln => ln.substr(lit(1), lit(2)) === "- "))
      .cast("long")
    val nEllLine = size(filter(lines, ln =>
      length(ln) >= 3 && ln.substr(length(ln) - 2, lit(3)) === "..."))
      .cast("long")
    val nAlpha = size(filter(words, t => t.rlike("[a-z]"))).cast("long")
    val nStop = size(filter(array(GopherStopwords.map(lit): _*),
      sw => array_contains(words, sw))).cast("long")
    val okWords = w >= 50L && w <= 100000L
    val okLen = lit(3L) * w <= sumLen && sumLen <= lit(10L) * w
    val okSym = lit(10L) * (nHash + nEll) <= w
    val okBullet = lit(10L) * nBullet <= lit(9L) * l
    val okEllLine = lit(10L) * nEllLine <= lit(3L) * l
    val okAlpha = lit(10L) * nAlpha >= lit(8L) * w
    val okStop = nStop >= 2L
    docs.select(col("doc_id"), w.as("n_words"), l.as("n_lines"),
      okWords.as("ok_word_count"), okLen.as("ok_mean_word_len"),
      okSym.as("ok_symbol_ratio"), okBullet.as("ok_bullet_lines"),
      okEllLine.as("ok_ellipsis_lines"), okAlpha.as("ok_alpha_words"),
      okStop.as("ok_stopwords"),
      (okWords && okLen && okSym && okBullet && okEllLine && okAlpha &&
        okStop).as("keep"))
  }

  /** C4 line-level cleaning rules (Raffel et al. 2020, §2.2) — the OTHER
    * canonical heuristic battery next to Gopher's ([[gopherRules]]): where
    * Gopher judges the whole document, C4 first judges each LINE and then
    * the page from what survived. A line is retained iff it ends in a
    * terminal punctuation mark (`.` `!` `?` `"`), carries at least five
    * words, and does not mention "javascript" (the boilerplate tell C4
    * calls out); the page is kept iff it contains neither the "lorem
    * ipsum" placeholder nor a curly brace (code tell) and at least three
    * lines survived. Emits the retained-line text so the operator is the
    * TRANSFORMATION, not just the gate.
    *
    * Same cross-engine discipline as [[gopherRules]]: counts are exact
    * integers, string predicates are dialect-portable (`$`-anchored
    * character class, substring containment), empty-kept docs join to ''
    * in both engines. Pure per-row codegen'd expressions — zero exchanges
    * at any corpus size.
    */
  def c4Rules(docs: DataFrame, text: Column = col("text")): DataFrame = {
    def nonEmpty(a: Column): Column = filter(a, s => s =!= "")
    val lines = nonEmpty(split(text, "\n"))
    val kept = filter(lines, ln =>
      ln.rlike("[.!?\"]$") &&
        size(nonEmpty(split(ln, " "))) >= 5 &&
        !ln.contains("javascript"))
    val keepPage = !text.contains("lorem ipsum") && !text.contains("{") &&
      size(kept) >= 3
    docs.select(col("doc_id"),
      size(lines).as("n_lines"), size(kept).as("n_kept"),
      keepPage.as("keep_page"),
      array_join(kept, "\n").as("text_clean"))
  }

  /** ALL word-trigram occurrences (Dedup.shingles dedups for Jaccard; the
    * repetition signals need the multiplicities). Same short-doc guard.
    */
  def trigramOccurrences(text: Column): Column = {
    val tk = toks(text)
    when(size(tk) >= 3,
      transform(sequence(lit(0), size(tk) - 3),
        i => concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2),
          element_at(tk, i + 3))))
      .otherwise(array().cast("array<string>"))
  }

  /** Email / phone redaction patterns — RE2-compatible (no backrefs or
    * lookaround) so Java (Spark) and RE2 (DuckDB/real pipelines) agree.
    */
  val EmailRe = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** All char trigrams of `text` (overlapping, order preserved); docs
    * shorter than 3 chars yield the empty array. Shared by the two
    * charngram language-ID tiers so train and score agree exactly.
    */
  def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  val queries: Map[String, Q] = Map(
    "t_blocklist_gate" -> { (s, d) =>
      blocklistGate(Tables.spread(Tables.documents(s, d))) },
    // PII redaction: count + replace emails/phones. The fixture corpus is
    // clean synthetic prose, so the query plants deterministic PII derived
    // from doc_id (emails on even ids, phones on ids % 3 == 0) — both
    // engines synthesize the identical dirty column, and the oracle then
    // checks the FULL redacted string, not just the counts.
    "t_pii_redact" -> { (s, d) =>
      val dirty = concat(col("text"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" call +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.as("dirty"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("dirty"), lit(EmailRe), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("dirty"), lit(PhoneRe), lit(0)))
            .as("n_phones"),
          regexp_replace(
            regexp_replace(col("dirty"), lit(EmailRe), lit("<EMAIL>")),
            lit(PhoneRe), lit("<PHONE>")).as("redacted"))
        .orderBy("doc_id")
    },
    // Corpus-frequency informativeness: mean document frequency of the
    // doc's distinct trigrams — high mean ⇒ boilerplate shared across the
    // corpus, low ⇒ unique content. Deliberately INTEGER arithmetic until
    // the final division: a float log-average would be aggregation-order-
    // dependent across engines, while BIGINT sums are exact. Two shuffles
    // (df build, per-doc sum); the df side is a broadcast at any scale
    // where it fits, else a plain equi-join.
    "t_informativeness" -> { (s, d) =>
      // the exploded (doc_id, ngram) frame feeds BOTH the df build and
      // the join probe side — lazy persist per the diamond rule
      // ([[Agreement.pairDrift]]), or the corpus scan + tokenize +
      // trigram explode runs twice. The frame is shingle-mass-sized
      // (≈ tokens − 2 per doc), so MEMORY_AND_DISK: partitions that
      // don't fit executor memory spill to local disk instead of
      // evicting — at 100 TB that's still strictly cheaper than a
      // second full scan+explode, and on executor loss lineage recovery
      // recomputes only the lost partitions (DiamondReuseSpec gates the
      // reuse; the harness owns release).
      val sh = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), explode(Dedup.shingles(col("text")))
          .as("ngram"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df_ = sh.groupBy("ngram").agg(count(lit(1)).as("df"))
      sh.join(df_, "ngram")
        .groupBy("doc_id").agg(
          sum(col("df")).as("df_sum"),
          count(lit(1)).as("n_distinct_trigrams"))
        .select(col("doc_id"),
          col("df_sum"),
          col("n_distinct_trigrams"),
          round4HalfUp(col("df_sum") / col("n_distinct_trigrams"))
            .as("mean_df"))
        .orderBy("doc_id")
    },
    // Gopher-style repetition signals: share of the doc's trigrams taken
    // by its single most frequent trigram, and the duplicated-trigram
    // fraction. Two map-side-combined aggregations keyed by doc — linear,
    // one shuffle of (doc, ngram) counts.
    "t_repetition" -> { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(trigramOccurrences(col("text"))).as("ngram"))
        .groupBy("doc_id", "ngram").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(
          round4HalfUp(max(col("n")) / sum(col("n")))
            .as("top_trigram_frac"),
          round4HalfUp((sum(col("n")) - count(lit(1))) / sum(col("n")))
            .as("dup_trigram_frac"),
          sum(col("n")).cast("long").as("n_trigrams"))
        .orderBy("doc_id")
    },
    // Per-language heavy hitters through the SpaceSaving sketch
    // (graft_freq_sketch): O(m) state per language instead of a full
    // (lang, word) count shuffle — at corpus scale the vocabulary is
    // billions of keys, the sketch budget is 64 counters. Candidates
    // (≤ m × langs rows) broadcast back against the token stream to
    // recover the word strings; top-10 per language by estimate.
    // Oracle-hash-gated: the fixture vocabulary fits the 64-counter
    // summary without evicting, so estimates are exact counts and the
    // DuckDB oracle matches; eviction/merge error bounds are
    // spec-checked in FreqSketchSpec.
    // Diamond: the exploded token stream feeds the sketch aggregation
    // AND the name-recovery distinct — persisted lazily so the
    // explode pass runs once (caller/harness owns release; gated by
    // auditDiamond("t_heavy_hitters", 2) and DiamondLint).
    "t_heavy_hitters" -> { (s, d) =>
      val words = Tables.documents(s, d)
        .select(col("lang"), explode(toks(col("text"))).as("w"))
        .select(col("lang"), col("w"), xxhash64(col("w")).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cands = words.groupBy("lang")
        .agg(graft.functions.SketchAggregates
          .freq_sketch(col("h"), 64).as("sk"))
        .select(col("lang"), explode(col("sk")).as("e"))
        .select(col("lang"), col("e.item").as("h"),
          col("e.count").as("est"), col("e.err").as("err"))
      val named = words.select("lang", "w", "h").distinct()
        .join(broadcast(cands), Seq("lang", "h"))
      val byEst = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("est").desc, col("w"))
      named.withColumn("rk", row_number().over(byEst))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("w"), col("est"), col("err"))
        .orderBy("lang", "w")
    },
    // Unigram word entropy + type-token ratio — the information-density
    // quality signal (low-entropy docs are boilerplate/repetition, the
    // first thing a corpus filter drops). entropy = log2(n) − Σc·log2(c)/n
    // over per-doc word counts: one (doc, word) count shuffle, then a
    // map-side-combined per-doc aggregate — linear at any corpus size.
    "t_word_entropy" -> { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), explode(toks(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          round4HalfUp(log2(sum(col("c"))) -
            sum(col("c") * log2(col("c"))) / sum(col("c"))).as("entropy"),
          round4HalfUp(count(lit(1)) / sum(col("c"))).as("ttr"),
          sum(col("c")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },
    // token counting: whitespace + BPE-ish subword estimate
    "t_token_count" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(toks(col("text")))).as("n_distinct"),
        subwordEstimate(col("text")).as("n_subwords"),
        length(col("text")).as("n_chars_text"))
        .orderBy("doc_id")
    },
    // Vocabulary-coverage audit: per-doc out-of-vocabulary token count
    // against a tokenizer's word list (broadcast, human-sized — a real
    // run passes the exported vocab). Integer counts, not rates: the
    // division belongs to the consumer, the exact numerator/denominator
    // to the audit. Pure per-row codegen'd expressions — zero shuffles
    // at any corpus size.
    "t_oov_rate" -> { (s, d) =>
      val vocab = Seq("the", "data", "join", "table", "scan", "merge",
        "row", "key", "value", "query", "filter", "sort", "group")
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        size(filter(toks(col("text")),
          w => !w.isInCollection(vocab))).as("n_oov"))
        .orderBy("doc_id")
    },
    // Flesch–Kincaid grade level with a deterministic syllable heuristic:
    // syllables = maximal [aeiouy]+ runs in the lowercased text (runs
    // can't span the space tokenizer's separators, so the text-level
    // count equals the per-word sum without an explode), sentences =
    // [.!?]+ runs floored at 1. The grade is the textbook
    // 0.39·(W/S) + 11.8·(Syl/W) − 15.59 with the arithmetic spelled
    // identically in the oracle (same literals, same op order — the
    // float-determinism contract of round4HalfUp) and the result
    // grid-rounded at 1e-2. Pure per-row codegen'd regex counts — zero
    // shuffles at any corpus size; the counts ship alongside the grade
    // so a downstream gate can threshold on exact integers instead.
    "t_readability" -> { (s, d) =>
      readability(Tables.documents(s, d)).orderBy("doc_id")
    },
    // quality scoring: length/stopword/type-token-ratio mix
    "t_quality_score" -> { (s, d) =>
      val n = tokenCount(col("text")).cast("double")
      val ttr = size(array_distinct(toks(col("text")))) / n
      val stop = stopwordRatio(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        round4HalfUp(ttr).as("type_token_ratio"),
        round4HalfUp(stop).as("stopword_ratio"),
        round4HalfUp(qualityScore(col("text"))).as("quality"))
        .orderBy("doc_id")
    },
    // language-ID by marker voting, compared against the labeled column
    // per-language top-5 trigram shingles by frequency, reduced through
    // the engine's bounded-heap TopKPerKey (no per-language sort; at
    // corpus scale the heap sees one row per (lang, ngram) after the
    // map-side-combined count)
    "t_top_ngrams" -> { (s, d) =>
      val counts = Tables.spread(Tables.documents(s, d))
        .select(col("lang"), explode(Dedup.shingles(col("text"))).as("ngram"))
        .groupBy("lang", "ngram").agg(count(lit(1)).as("n"))
      graft.plans.TopKPerKey.topKPerKey(counts,
        Seq("lang"), Seq(("n", true), ("ngram", false)), 5)
        .orderBy(col("lang"), col("n").desc, col("ngram"))
    },
    // Per-source distinctive keywords — tf-idf-family ranking with an
    // INTEGER-EXACT rarity weight: score = tf · ((10⁶·N) div df), where df
    // counts the sources containing the word and N the sources overall.
    // The classic log-idf weights rarity as ln(N/df); the integer N/df
    // weight ranks identically for any fixed df and keeps every score a
    // BIGINT, so the cross-engine hash is exact (the t_hash_classifier
    // discipline — no float ln at a rounding boundary can flip a rank).
    // Shape at scale: tf is one (source, word) shuffle, df one
    // vocabulary-sized aggregate off tf's output, N a one-row broadcast
    // ride, ranking the bounded-heap TopKPerKey — a hot source is never
    // fully sorted.
    "t_tfidf_keywords" -> { (s, d) =>
      val toks = Tables.spread(Tables.documents(s, d))
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
      // tf feeds BOTH the source-df aggregation and the scoring join —
      // lazy persist per the diamond rule, or the token explode + first
      // groupBy runs twice (vocabulary×sources rows, so default level)
      val tf = toks.groupBy("source", "word").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // tf rows are distinct (source, word) ⇒ count per word = source-df
      val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val nSrc = Tables.documents(s, d)
        .agg(countDistinct(col("source")).as("n_src"))
      val scored = tf.join(df_, "word").crossJoin(broadcast(nSrc))
        .withColumn("score_micro",
          expr("tf * ((1000000 * n_src) DIV df)"))
        .select("source", "word", "tf", "df", "score_micro")
      graft.plans.TopKPerKey.topKPerKey(scored,
        Seq("source"), Seq(("score_micro", true), ("word", false)), 5)
        .orderBy(col("source"), col("score_micro").desc, col("word"))
    },
    // First-occurrence n-gram novelty — the corpus-freshness curve dedup
    // and curriculum work read: in doc_id (crawl) order, what fraction of
    // each doc's distinct trigrams has never been seen before? High
    // novelty = frontier content; novelty collapsing toward zero across
    // a crawl = the corpus is saturating (the diagnostic that tells you
    // MORE CRAWLING stopped buying new data). INTEGER end-to-end
    // (micro-unit fraction via integer DIV). Shape at scale: one gram
    // shuffle for min(doc_id), one gram-keyed join back, per-doc
    // aggregate — nothing pairwise, nothing corpus².
    "t_ngram_novelty" -> { (s, d) =>
      // same (doc_id, gram) diamond as t_informativeness: the explode
      // feeds both the min(doc_id) aggregate and the probe side — lazy
      // MEMORY_AND_DISK persist so the dominant corpus pass runs once
      val sh = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val first = sh.groupBy("g").agg(min("doc_id").as("fdoc"))
      sh.join(first, "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_grams"),
          sum(when(col("fdoc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty_micro",
          expr("(1000000 * n_novel) DIV n_grams"))
        .orderBy("doc_id")
    },
    // Char-trigram language-ID — the PROFILE-BASED tier the marker-word
    // t_lang_id scaladoc promises (Cavnar & Trenkle 1994's n-gram
    // profiles, the fastText/langdetect mechanism): per-language top-20
    // char-trigram profiles trained IN-PLAN from the labeled corpus
    // (the train-then-apply discipline of t_classifier_train — a real
    // deployment trains on a labeled seed corpus and broadcasts the
    // profile table exactly like this), then each doc scores by distinct-
    // trigram overlap with every profile; deterministic argmax (count
    // DESC, lang ASC), profile-less docs → 'und'. All integer counts —
    // exact oracle. Shape: one (lang, gram) shuffle for profiles (top-20
    // through the bounded heap), profiles broadcast (|langs|·20 rows),
    // one distinct + per-doc aggregate — linear everywhere.
    "t_charngram_langid" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.spread(Tables.documents(s, d))
      val grams = charTrigrams(col("text"))
      // tri — the full char-trigram explode of the corpus — feeds BOTH
      // the profile aggregation and the scoring side: lazy
      // MEMORY_AND_DISK persist per the diamond rule, or the dominant
      // explode runs twice (the round-11 weak pair; harness releases)
      val tri = docs.select(col("doc_id"), col("lang"),
        explode(grams).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lc = tri.groupBy("lang", "g").agg(count(lit(1)).as("n"))
      val prof = graft.plans.TopKPerKey.topKPerKey(lc,
        Seq("lang"), Seq(("n", true), ("g", false)), 20)
        .select(col("lang").as("plang"), col("g"))
      val docg = tri.select("doc_id", "g").distinct()
      val sc = docg.join(broadcast(prof), "g")
        .groupBy("doc_id", "plang").agg(count(lit(1)).as("n"))
      val pred = sc.withColumn("rn", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(col("n").desc, col("plang"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("plang").as("pred"))
      docs.select(col("doc_id"), col("lang").as("labeled"))
        .join(pred, Seq("doc_id"), "left")
        .select(col("doc_id"), col("labeled"),
          coalesce(col("pred"), lit("und")).as("predicted"))
        .orderBy("doc_id")
    },
    // Train-once / score-many variant of t_charngram_langid — the
    // broadcast-model discipline taken to its end state: training runs as
    // ONE bounded action (the |langs|·20-row profile table to the driver —
    // the MODEL, never the corpus), and scoring is a pure per-row
    // codegen'd expression with the profiles folded in as array literals —
    // `array_intersect` against each language's gram array, argmax via
    // `array_max` over (n, rank) structs (rank = reverse lang index, so
    // max picks n DESC then lang ASC — the same total order as the joined
    // tier). The scoring side has ZERO joins and ZERO shuffles (only the
    // oracle-edge orderBy): at 100 TB the corpus is scored at scan speed
    // on every executor independently, the amortization
    // t_charngram_langid pays a distinct + broadcast-join + per-doc
    // aggregate for on EVERY scoring run. Same answer, same oracle SQL.
    "t_charngram_langid_trained" -> { (s, d) =>
      val docs = Tables.spread(Tables.documents(s, d))
      val grams = charTrigrams(col("text"))
      // TRAIN: per-language top-20 trigram profiles, one bounded action
      val lc = docs.select(col("lang"), explode(grams).as("g"))
        .groupBy("lang", "g").agg(count(lit(1)).as("n"))
      val prof: Seq[(String, Seq[String])] =
        graft.plans.TopKPerKey.topKPerKey(lc,
            Seq("lang"), Seq(("n", true), ("g", false)), 20)
          .select("lang", "g").collect()
          .groupBy(_.getString(0))
          .map { case (l, rs) => l -> rs.map(_.getString(1)).toSeq }
          .toSeq.sortBy(_._1)
      // SCORE: distinct-gram overlap with every profile, per row
      val dg = array_distinct(grams)
      val labeled = docs.select(col("doc_id"), col("lang").as("labeled"))
      if (prof.isEmpty)
        labeled.withColumn("predicted", lit("und")).orderBy("doc_id")
      else {
        val scoredStructs = prof.zipWithIndex.map { case ((l, gs), i) =>
          struct(
            size(array_intersect(dg, typedLit(gs))).as("n"),
            lit(prof.size - i).as("rk"), lit(l).as("plang"))
        }
        val best = array_max(array(scoredStructs: _*))
        docs.select(col("doc_id"), col("lang").as("labeled"),
          when(best.getField("n") > 0, best.getField("plang"))
            .otherwise(lit("und")).as("predicted"))
          .orderBy("doc_id")
      }
    },
    "t_lang_id" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("labeled"),
        predictedLang(col("text")).as("predicted"))
        .orderBy("doc_id")
    },
    // content fingerprint via the custom codegen'd RollingHash
    // Expression. Oracle-backed: DuckDB has no 64-bit wraparound
    // primitive, but the hash is reproduced exactly with HUGEINT
    // modular arithmetic in a recursive CTE — an INDEPENDENT-ENGINE
    // recomputation of the custom expression's semantics, on top of the
    // interpreted-vs-codegen-vs-reference equality in PipelineSpec.
    "t_rolling_fingerprint" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("fp"))
        .orderBy("doc_id")
    },
    // Count-Min point-frequency audit: the sketch every 100 TB counter
    // service uses where SpaceSaving answers top-k — CMS answers "how
    // often did THIS key occur" for any key in O(d) probes over a
    // fixed-size table, with one-sided error (never undercounts).
    // Built with Spark's native count_min_sketch aggregate (map-side
    // partial merge — the shuffle carries one d×w table per partition,
    // never word rows). The sketch is a driver-sized summary by
    // construction (same size class as a broadcast side): the one-row
    // collect is the DESIGN, not a shortcut. Probes here are the exact
    // top-20 words, so the query emits its own ground truth; the
    // estimate column is seed-deterministic but not SQL-recomputable →
    // rows-only, with the one-sided-error bound pinned in MixtureSpec.
    // Tokenizer-QA fertility report (the subwords-per-word metric every
    // tokenizer evaluation tables per language — high fertility on a
    // language means the vocabulary underserves it and its documents
    // cost proportionally more context window): per lang, Σ subword
    // estimate / Σ words as an integer micro-ratio. One map-side
    // aggregate over per-row codegen'd counts; DIV-exact oracle
    // (ceil(len/4) ≡ (len+3)//4 on non-negative ints).
    "t_subword_fertility" -> { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .groupBy("lang")
        .agg(sum(subwordEstimate(col("text"))).as("subwords"),
          sum(tokenCount(col("text")).cast("long")).as("words"))
        .select(col("lang"), col("subwords"), col("words"),
          expr("(1000000 * subwords) DIV words").as("fertility_micro"))
        .orderBy("lang")
    },
    // ENGINE-PORTABLE Count-Min sketch next to t_cms_freq's built-in
    // tier: depth 4 × width 16⁴, bucket hashes from the md5-nibble
    // idiom (seed j prefixed), so sketch construction is a plain
    // integer groupBy ANY engine reproduces — the property that makes
    // cross-engine sketch MERGE possible (union the (j, b, c) tables
    // and sum), which Spark's opaque binary sketch cannot offer. The
    // dedupe-then-weight rule keeps it one token pass: buckets are
    // computed per DISTINCT word and weighted by its count, so the 4×
    // hash fan-out touches the vocabulary, not the corpus. Probes are
    // the exact top-20 (the query carries its own ground truth);
    // est = min over the 4 rows is exact BIGINT — full oracle, incl.
    // the one-sided est ≥ exact guarantee the spec pins.
    "t_cms_portable" -> { (s, d) =>
      val wc = Tables.spread(Tables.documents(s, d))
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      cmsReport(wc, cmsSketchFrom(wc))
    },
    // the portable-cardinality tier (see hllPortable)
    "t_hll_portable" -> { (s, d) =>
      hllPortable(Tables.documents(s, d))
    },
    // rows-only (the CMS row-hash layout is implementation-defined);
    // oracle coverage for the sketch family lives in the GREEN sibling
    // t_cms_portable, and the spec pins est ≥ exact here
    "t_cms_freq" -> { (s, d) =>
      // persisted: BOTH the exact top-20 and the sketch consume the
      // tokenized corpus — without the cache the scan+split runs twice
      val words = Tables.spread(Tables.documents(s, d))
        .select(explode(split(col("text"), " ")).as("w"))
        .persist()
      val exactTop = words.groupBy("w").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("w")).limit(20).collect()
      val sketchBytes = words
        .agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0)
      words.unpersist()
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      val rows = exactTop.toSeq.map(r => (r.getString(0), r.getLong(1),
        cms.estimateCount(r.getString(0))))
      s.createDataFrame(rows).toDF("w", "exact", "est")
        .orderBy(col("exact").desc, col("w"))
    },
    // Gopher structural-rule battery. The fixture corpus is clean
    // single-line prose, so (the t_pii_redact pattern) the query plants
    // deterministic structure keyed on doc_id % 7 before measuring:
    // bulleted-list docs, ellipsis-heavy docs, symbol-wrapped tokens,
    // multi-line docs, and numeric (non-alphabetic) tokens — both
    // engines synthesize the identical dirty text, and every rule flag
    // exercises both outcomes across the corpus.
    "t_gopher_rules" -> { (s, d) =>
      val m = pmod(col("doc_id"), lit(7))
      val enriched =
        when(m === 0, concat(lit("- "),
          regexp_replace(col("text"), lit(" scan "), lit(" scan\n- "))))
          .when(m === 1,
            regexp_replace(col("text"), lit(" table "), lit(" table...\n")))
          .when(m === 2,
            regexp_replace(col("text"), lit(" value "), lit(" #value# ")))
          .when(m === 3, regexp_replace(col("text"), lit(" a "), lit("\n")))
          .when(m === 4,
            regexp_replace(col("text"), lit(" key "), lit(" 42 ")))
          .otherwise(col("text"))
      gopherRules(Tables.documents(s, d), enriched).orderBy("doc_id")
    },
    // C4 line-level rule battery. The fixture is single-line unpunctuated
    // prose, so the query first sentences-izes it (every " merge " becomes
    // ".\n" — both engines see identical line structure) and then plants
    // one page-level tell per doc_id%5 class: the lorem-ipsum placeholder,
    // a javascript boilerplate line, a curly-brace code fragment, a clean
    // terminal sentence, and an untouched (non-punctuated) tail — so every
    // line rule and every page rule fires both ways across the corpus.
    "t_c4_rules" -> { (s, d) =>
      val base = regexp_replace(col("text"), lit(" merge "), lit(".\n"))
      val m = pmod(col("doc_id"), lit(5))
      val enriched = concat(base,
        when(m === 0, lit(" lorem ipsum."))
          .when(m === 1,
            lit("\nplease enable javascript to view this page."))
          .when(m === 2, lit(" { padding }"))
          .when(m === 3, lit(" end of the document."))
          .otherwise(lit("")))
      c4Rules(Tables.documents(s, d), enriched).orderBy("doc_id")
    },
    // model-based quality filter plumbing: label on the exact integer
    // weight-sum (no float-boundary flake), rounded mean score for audit
    "t_hash_classifier" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          hashClassifierWeightSum(col("text")).as("ws"),
          tokenCount(col("text")).cast("long").as("n"))
        .select(col("doc_id"),
          round4HalfUp(col("ws").cast("double") /
            (col("n").cast("double") * 1000.0)).as("score"),
          when(col("ws") >= 0, "pos").otherwise("neg").as("label"))
        .orderBy("doc_id")
    },
    // Zipf-slope fit per source — the corpus-health diagnostic: natural
    // text follows freq ∝ rank^s with s ≈ −1; a much flatter slope
    // flags template/boilerplate spam (few types dominating), a much
    // steeper one flags id-like noise (all types near-unique). Least
    // squares of ln f on ln rank over each source's top-100 types, the
    // slope assembled from explicit Σ terms so both engines run the
    // IDENTICAL formula (regr_slope's internal update order differs
    // across engines). Shape at scale: one (source, word) count
    // shuffle, then the bounded-heap TopKPerKey caps every source at
    // 100 rows BEFORE the window rank — the fit itself touches
    // 100·|sources| rows however large the corpus.
    // Heaps'-law fit — the third corpus-law diagnostic next to the
    // Zipf slope and the novelty curve: vocabulary growth V(n) ≈ K·n^β
    // in crawl (doc_id) order, β ≈ 0.4–0.6 for natural text; β near 1
    // flags id-like noise (every token new), β near 0 flags template
    // saturation. Least squares of ln V on ln n over per-doc cumulative
    // checkpoints, explicit Σ-term slope (the t_zipf_fit discipline).
    // The cumulative window is the oracle-visible twin of the
    // production two-pass prefix sum (range-partition + per-partition
    // offsets — the shardAssign window-vs-production note); everything
    // before it is one (word → min doc) shuffle, vocabulary-bounded.
    "t_heaps_fit" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      val newTypes = toks.groupBy("w").agg(min("doc_id").as("fdoc"))
        .groupBy(col("fdoc").as("doc_id")).agg(count(lit(1)).as("nv"))
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val xy = perDoc.join(newTypes, Seq("doc_id"), "left")
        .select(col("doc_id"), col("nt"),
          coalesce(col("nv"), lit(0L)).as("nv"))
        .select(log(sum(col("nt")).over(w)).as("x"),
          log(sum(col("nv")).over(w)).as("y"))
      xy.agg(count(lit(1)).cast("double").as("m"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(
          round((col("m") * col("sxy") - col("sx") * col("sy")) /
            (col("m") * col("sxx") - col("sx") * col("sx")), 4)
            .as("beta"),
          round((col("sy") - ((col("m") * col("sxy") -
            col("sx") * col("sy")) /
            (col("m") * col("sxx") - col("sx") * col("sx"))) *
            col("sx")) / col("m"), 4).as("ln_k"),
          col("m").cast("long").as("n_points"))
    },
    "t_zipf_fit" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Tables.spread(Tables.documents(s, d))
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("f"))
      val types = w.groupBy("source").agg(count(lit(1)).as("n_types"))
      val top = graft.plans.TopKPerKey.topKPerKey(w,
        Seq("source"), Seq(("f", true), ("word", false)), 100)
      // ranks are deterministic under ties (word tiebreak), and tied
      // frequencies pair the same y multiset with the same rank set
      // either way — the fit is tie-order-proof
      val xy = top.withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(col("f").desc, col("word"))))
        .select(col("source"), log(col("rk")).as("x"),
          log(col("f")).as("y"))
      xy.groupBy("source").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("source"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 4)
            .as("zipf_slope"))
        .join(types, "source")
        .orderBy("source")
    },
    // Robust length-outlier gate — median/MAD per source (the robust
    // twin of mean/σ: one 10⁶-char page can't drag the threshold the
    // way it drags a mean). Exact interpolated percentiles so the
    // DuckDB median()/mad() pair reproduces them bit-for-bit (integer
    // inputs ⇒ every median is a .0 or .5, exact in double). Shape at
    // scale: the exact sort-based percentile here is the ORACLE-GRADE
    // audit tier; the production gate swaps in approx_percentile on
    // the same two-phase frame (per-source stats are |sources|-sized
    // either way, broadcast back for the flag pass).
    "t_length_outliers" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars"))
      val med = docs.groupBy("source")
        .agg(expr("percentile(n_chars, 0.5)").as("med_chars"))
      // dev — the corpus-sized deviation frame — feeds BOTH the MAD
      // aggregate and the final flag pass: lazy persist per the diamond
      // rule or the scan+join runs twice (round-13 DiamondLint
      // per-subtree finding; harness owns release, auditDiamond-gated)
      val dev = docs.join(broadcast(med), "source")
        .withColumn("dv", abs(col("n_chars") - col("med_chars")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mad = dev.groupBy("source")
        .agg(expr("percentile(dv, 0.5)").as("mad_chars"))
      dev.join(broadcast(mad), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          first(col("med_chars")).as("med_chars"),
          first(col("mad_chars")).as("mad_chars"),
          sum(when(col("dv") > lit(3.0) * col("mad_chars"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("source")
    })

  /** The portable CMS's engine-portable bucket: md5-nibble over the
    * seed-prefixed word, 16⁴ buckets (the t_cms_portable hash).
    */
  def cmsBucket(j: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), c)), 1, 4), 16, 10)
      .cast("long")

  private def cmsFan(c: Column) = explode(array((0 until 4).map(j =>
    struct(lit(j).as("j"), cmsBucket(j, c).as("b"))): _*)).as("x")

  /** (j, b, cc) sketch table from a (w, c) word-count frame — the
    * dedupe-then-weight construction (4 hashes per DISTINCT word). The
    * sketch is LINEAR in its input counts: `cmsSketchFrom(wc₁ ⊎ wc₂)`
    * equals the (j, b)-wise SUM of the two sketches, which is what
    * makes cross-engine and cross-batch merge a plain union+sum
    * ([[graft.streaming.CmsStream]] rides exactly this).
    */
  def cmsSketchFrom(wc: DataFrame): DataFrame =
    wc.select(cmsFan(col("w")), col("c"))
      .select(col("x.j").as("j"), col("x.b").as("b"), col("c"))
      .groupBy("j", "b").agg(sum(col("c")).as("cc"))

  /** The exact-vs-estimate probe report over a (w, c) frame and a
    * (j, b, cc) sketch — shared verbatim by the batch query and the
    * streaming view, so stream ≡ batch is sketch linearity plus THIS
    * one function.
    */
  def cmsReport(wc: DataFrame, cms: DataFrame): DataFrame = {
    val exactTop = wc
      .orderBy(col("c").desc, col("w")).limit(20)
      .select(col("w"), col("c").as("exact"))
    exactTop.select(col("w"), col("exact"), cmsFan(col("w")))
      .select(col("w"), col("exact"), col("x.j").as("j"),
        col("x.b").as("b"))
      .join(cms, Seq("j", "b"))
      .groupBy("w", "exact").agg(min(col("cc")).as("est"))
      .orderBy(col("exact").desc, col("w"))
  }

  /** ENGINE-PORTABLE HyperLogLog per-language distinct-word cardinality
    * — the third pillar of the portable-sketch family (frequency =
    * `t_cms_portable`, similarity = `d_minhash_portable` /
    * `d_simhash_portable`, cardinality = THIS), next to the
    * engine-internal `r_approx_distinct` the way cms_portable sits
    * next to cms_freq. Flajolet et al. 2007 with m = 256 registers:
    * a word's md5 first 2 nibbles pick the register, the next 13
    * nibbles form a 52-bit field whose leading-zero rank is ρ
    * (bin-length arithmetic — `53 − length(bin(h))`, the all-zeros
    * field taking the conventional 53); the register table is
    * per-(lang, register) MAX of ρ — the property that makes HLL
    * MERGEABLE: union of corpora = element-wise max of register
    * tables, no token re-scan, the cross-engine/cross-day shape at
    * 100 TB. The estimate is the standard αm²/Σ2^−M harmonic mean
    * with the small-range linear-counting correction (E ≤ 5m/2 and
    * empty registers present → m·ln(m/V)).
    *
    * Oracle-checkable because everything through the register table is
    * INTEGER (md5 nibbles, bin lengths, maxes), 2^−M terms are exact
    * dyadic doubles summed in fixed register order, and the one
    * transcendental (ln, correction branch) sits on the same
    * deterministic argument in both engines under the 1e-4 output
    * grid (the t_zipf_fit/t_heaps_fit float contract). The exact
    * distinct count rides along per row, so the frame is its own
    * accuracy report. One distinct-(lang, word) aggregate + one
    * 256-bounded register aggregate; nothing corpus-sized leaves the
    * token scan.
    */
  private def hllWords(docs: DataFrame): DataFrame =
    Tables.spread(docs)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .distinct()

  /** (lang, j, mj) register table — public because MERGE is the point:
    * registers of a corpus union are the element-wise MAX of the
    * parts' registers (TextSketchSpec pins the law), so sketches
    * combine across engines/executors/days without a token re-scan.
    */
  def hllRegisters(docs: DataFrame): DataFrame = {
    val words = hllWords(docs)
    val h52 = conv(substring(md5(col("w")), 3, 13), 16, 10).cast("long")
    words.select(col("lang"),
      conv(substring(md5(col("w")), 1, 2), 16, 10).cast("int").as("j"),
      when(h52 === 0L, lit(53))
        .otherwise(lit(53) - length(bin(h52))).as("rho"))
      .groupBy("lang", "j").agg(max(col("rho")).as("mj"))
  }

  def hllPortable(docs: DataFrame): DataFrame = {
    val m = 256
    val words = hllWords(docs)
    val regs = hllRegisters(docs)
      .groupBy("lang")
      .agg(map_from_arrays(collect_list(col("j")),
        collect_list(col("mj"))).as("regs"))
    val sumPow = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, jj) => acc + pow(lit(2.0),
        -coalesce(element_at(col("regs"), jj), lit(0)).cast("double")))
    val zeros = lit(m) - size(col("regs"))
    val raw = lit(0.7213 / (1.0 + 1.079 / m)) * lit(m.toDouble * m) /
      sumPow
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    val exact = words.groupBy("lang")
      .agg(count(lit(1)).as("exact_distinct"))
    regs
      .select(col("lang"), (round(est, 4) + lit(0.0)).as("est"))
      .join(exact, Seq("lang"))
      .select(col("lang"), col("exact_distinct"), col("est"))
      .orderBy("lang")
  }

  /** Blocklist rank windows + gate threshold, shared verbatim with the
    * generated oracle SQL (the MixTargets/MaxSample shared-constant
    * discipline). The fixture vocabulary holds only 31 unigrams, so the
    * unigram window sits at ranks 17-24; bigrams (916 distinct) at
    * ranks 20-27.
    */
  private[graft] val BlockUniSkip = 16
  private[graft] val BlockUniTake = 8
  private[graft] val BlockBiSkip = 19
  private[graft] val BlockBiTake = 8
  private[graft] val BlockMaxCatHits = 5L

  /** C4-style blocklist gate (Raffel et al. 2020 §2.2 filter pages
    * against an exogenous "bad words" list; RefinedWeb/Dolma ship
    * category-tagged term lists): every doc is scored against a
    * VARIABLE-LENGTH phrase blocklist and kept only while no single
    * category's hit count exceeds `maxCatHits` — the per-category
    * threshold is what lets one list serve several policies. The list
    * here is derived deterministically from the corpus's own
    * mid-frequency rank band (the t_pii_redact planting discipline —
    * the synthetic fixture contains no real bad words), with category =
    * first md5 nibble mod 3 (engine-portable, the t_hll register
    * split); a production deployment swaps the derived list for the
    * curated one and the plan is unchanged from the match joins down.
    *
    * Match semantics are declarative, not greedy-sequential: bigram
    * phrases match at every token position (overlapping bigram hits
    * all count); a unigram hit is SUPPRESSED when any bigram hit
    * covers its position, so "free" inside a matched "free money"
    * never double-counts. True leftmost-longest CONSUMPTION would
    * chain each position's outcome on its predecessor's — a per-doc
    * sequential scan no window expresses — while the cover rule is one
    * anti-join and differs only on pathological self-overlapping
    * chains (BlocklistSpec pins both rules' disagreement case).
    *
    * Scale shape: two corpus token passes (posexplode unigrams +
    * zip_with bigrams — no per-doc window, so no corpus-wide shuffle
    * before aggregation), vocabulary-bounded count tables into
    * driver-bounded sort-limits (take ≤ 4096 rows total,
    * require-guarded), the blocklist BROADCAST into both match joins,
    * and the suppression anti-join keyed (doc_id, p) over MATCH
    * streams only — every frame past the explodes is hits-sized.
    * All-BIGINT counts → hash-exact oracle.
    */
  /** The corpus-derived blocklist halves, `(g, cat)` each — the shared
    * seam between [[blocklistGate]] and the streaming twin
    * ([[graft.streaming.WindowedStreams.blocklistGateStream]] ships
    * them as broadcast map artifacts), so list membership can never
    * drift between the two modes.
    */
  def blocklistTables(docs: DataFrame, uniSkip: Int = BlockUniSkip,
      uniTake: Int = BlockUniTake, biSkip: Int = BlockBiSkip,
      biTake: Int = BlockBiTake): (DataFrame, DataFrame) = {
    require(uniTake >= 0 && biTake >= 0 && uniTake + biTake <= 4096,
      s"blocklist is a broadcast driver artifact: uniTake=$uniTake + " +
        s"biTake=$biTake must stay bounded")
    val t = toks(col("text"))
    def cat(g: Column) =
      (conv(substring(md5(g), 1, 1), 16, 10).cast("int") % 3).as("cat")
    val bl1 = docs.select(explode(t).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).offset(uniSkip).limit(uniTake)
      .select(col("w").as("g"), cat(col("w")))
    val bl2 = docs.select(explode(zip_with(slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("b").asc).offset(biSkip).limit(biTake)
      .select(col("b").as("g"), cat(col("b")))
    (bl1, bl2)
  }

  /** Per-ROW expression form of the blocklist scorer — same semantics
    * as [[blocklistGate]]'s join pipeline (overlapping bigram hits all
    * count, covered unigram hits suppressed), but computed entirely
    * inside one codegen'd column over driver-held map literals: the
    * deployment shape for a stream gate with an exogenous curated
    * list (the domainScoreGate ship-the-artifact discipline). Returns
    * `struct(c0, c1, c2)`; BlocklistSpec pins row-for-row equality
    * with the join pipeline on a varied corpus. `try_element_at`
    * throughout — ANSI errors on missing map keys and out-of-range
    * ranks, and both are ordinary here (non-listed grams; position 0's
    * missing left-neighbor).
    */
  def blocklistScore(text: Column, uni: Map[String, Int],
      bi: Map[String, Int]): Column = {
    val t = toks(text)
    val uniM = typedlit(uni)
    val biM = typedlit(bi)
    // bigram hit category per 0-based start position (null = no hit)
    val bcat = transform(zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b)), b => try_element_at(biM, b))
    // unigram hit at 0-based p survives unless a bigram hit starts at
    // p-1 or p (1-based element_at: positions p and p+1; the p = 0 row
    // has no left neighbor and index 0 is invalid even under try_, so
    // the lookup sits behind a lazily-evaluated when)
    val ucat = transform(t, (w, i) =>
      when(when(i >= 1, try_element_at(bcat, i)).isNotNull ||
          try_element_at(bcat, i + 1).isNotNull, lit(null))
        .otherwise(try_element_at(uniM, w)))
    def cnt(arr: Column, c: Int) = aggregate(arr, lit(0L),
      (acc, x) => acc + when(x === c, 1L).otherwise(0L))
    struct(
      (cnt(bcat, 0) + cnt(ucat, 0)).as("c0"),
      (cnt(bcat, 1) + cnt(ucat, 1)).as("c1"),
      (cnt(bcat, 2) + cnt(ucat, 2)).as("c2"))
  }

  def blocklistGate(docs: DataFrame, uniSkip: Int = BlockUniSkip,
      uniTake: Int = BlockUniTake, biSkip: Int = BlockBiSkip,
      biTake: Int = BlockBiTake, maxCatHits: Long = BlockMaxCatHits)
      : DataFrame = {
    val t = toks(col("text"))
    val tok = docs.select(col("doc_id"), posexplode(t).as(Seq("p", "w")))
    val bg = docs.select(col("doc_id"),
      posexplode(zip_with(slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as(Seq("p", "b")))
    val (bl1, bl2) =
      blocklistTables(docs, uniSkip, uniTake, biSkip, biTake)
    val uh = tok.join(broadcast(bl1), col("w") === col("g"))
      .select(col("doc_id"), col("p"), col("cat"))
    // bigram hits feed three consumers (cover set ×2, final union) —
    // persist per the diamond-reuse rule; the frame is hits-sized
    val bh = bg.join(broadcast(bl2), col("b") === col("g"))
      .select(col("doc_id"), col("p"), col("cat"))
      .persist()
    val cov = bh.select(col("doc_id"), col("p"))
      .union(bh.select(col("doc_id"), (col("p") + 1).as("p")))
    val uk = uh.join(cov, Seq("doc_id", "p"), "left_anti")
    val hits = uk.select("doc_id", "cat").union(bh.select("doc_id", "cat"))
    def catSum(i: Int) = sum(when(col("cat") === i, 1L).otherwise(0L))
    val pc = hits.groupBy("doc_id").agg(
      catSum(0).as("h0"), catSum(1).as("h1"), catSum(2).as("h2"))
    val c0 = coalesce(col("h0"), lit(0L))
    val c1 = coalesce(col("h1"), lit(0L))
    val c2 = coalesce(col("h2"), lit(0L))
    docs.select("doc_id").join(pc, Seq("doc_id"), "left")
      .select(col("doc_id"), c0.as("c0"), c1.as("c1"), c2.as("c2"),
        (c0 + c1 + c2).as("total_hits"),
        when(greatest(c0, c1, c2) <= maxCatHits, 1L).otherwise(0L)
          .as("keep"))
      .orderBy("doc_id")
  }

  private val oracleToks = "string_split(text, ' ')"

  // shared by t_charngram_langid and its trained (broadcast-model)
  // variant — the two tiers compute the identical answer by construction,
  // so they share one oracle derivation
  private val charngramLangidSql: String =
    s"""WITH tri AS (
       |  SELECT doc_id, lang, unnest(list_transform(
       |    range(1, len(text) - 2 + 1), i -> substr(text, i, 3))) g
       |  FROM documents WHERE len(text) >= 3),
       |lc AS (SELECT lang, g, count(*) n FROM tri GROUP BY 1, 2),
       |prof AS (
       |  SELECT lang AS plang, g FROM (
       |    SELECT lang, g, row_number() OVER (
       |      PARTITION BY lang ORDER BY n DESC, g) rn FROM lc)
       |  WHERE rn <= 20),
       |docg AS (SELECT DISTINCT doc_id, g FROM tri),
       |sc AS (
       |  SELECT doc_id, plang, count(*) n
       |  FROM docg JOIN prof USING (g) GROUP BY 1, 2),
       |pred AS (
       |  SELECT doc_id, plang FROM (
       |    SELECT doc_id, plang, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY n DESC, plang) rn FROM sc)
       |  WHERE rn = 1)
       |SELECT d.doc_id, d.lang AS labeled,
       |  coalesce(p.plang, 'und') AS predicted
       |FROM documents d LEFT JOIN pred p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // the blocklist derivation, both match tiers, the cover-suppression
    // rule, and the per-category gate replayed verbatim — rank windows
    // and threshold interpolated from the shared constants
    "t_blocklist_gate" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, string_split(text, ' ') t FROM documents),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, i - 1 AS p, t[i] AS w
         |  FROM toks, unnest(range(1, len(t) + 1)) u(i)),
         |bg AS MATERIALIZED (
         |  SELECT doc_id, i - 1 AS p, t[i] || ' ' || t[i + 1] AS b
         |  FROM toks, unnest(range(1, len(t))) u(i)),
         |bl1 AS (
         |  SELECT w AS g,
         |    (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) % 3
         |      AS cat
         |  FROM (SELECT w, count(*) c FROM tok GROUP BY 1
         |        ORDER BY c DESC, w ASC
         |        LIMIT $BlockUniTake OFFSET $BlockUniSkip)),
         |bl2 AS (
         |  SELECT b AS g,
         |    (strpos('0123456789abcdef', substr(md5(b), 1, 1)) - 1) % 3
         |      AS cat
         |  FROM (SELECT b, count(*) c FROM bg GROUP BY 1
         |        ORDER BY c DESC, b ASC
         |        LIMIT $BlockBiTake OFFSET $BlockBiSkip)),
         |uh AS (SELECT doc_id, p, cat FROM tok JOIN bl1 ON w = g),
         |bh AS MATERIALIZED (
         |  SELECT doc_id, p, cat FROM bg JOIN bl2 ON b = g),
         |cov AS (SELECT doc_id, p FROM bh
         |        UNION SELECT doc_id, p + 1 FROM bh),
         |uk AS (SELECT uh.doc_id, uh.cat FROM uh
         |       WHERE NOT EXISTS (SELECT 1 FROM cov
         |         WHERE cov.doc_id = uh.doc_id AND cov.p = uh.p)),
         |hits AS (SELECT doc_id, cat FROM uk
         |         UNION ALL SELECT doc_id, cat FROM bh),
         |pc AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN cat = 0 THEN 1 ELSE 0 END) AS BIGINT) h0,
         |  CAST(sum(CASE WHEN cat = 1 THEN 1 ELSE 0 END) AS BIGINT) h1,
         |  CAST(sum(CASE WHEN cat = 2 THEN 1 ELSE 0 END) AS BIGINT) h2
         |  FROM hits GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(h0, 0) AS c0, coalesce(h1, 0) AS c1,
         |  coalesce(h2, 0) AS c2,
         |  coalesce(h0, 0) + coalesce(h1, 0) + coalesce(h2, 0)
         |    AS total_hits,
         |  CAST(CASE WHEN greatest(coalesce(h0, 0), coalesce(h1, 0),
         |      coalesce(h2, 0)) <= $BlockMaxCatHits
         |    THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM documents d LEFT JOIN pc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t_subword_fertility" ->
      """SELECT lang, CAST(sum(sw) AS BIGINT) AS subwords,
        |  CAST(sum(w) AS BIGINT) AS words,
        |  CAST((1000000 * sum(sw)) // sum(w) AS BIGINT)
        |    AS fertility_micro
        |FROM (
        |  SELECT lang,
        |    list_sum(list_transform(string_split(text, ' '),
        |      t -> (length(t) + 3) // 4)) AS sw,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |  FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the portable HLL replayed: same md5-nibble register/field split,
    // same bin-length rho, per-(lang, register) max, the 256-term
    // harmonic sum as an ORDERED list (aggregate SUM order is
    // nondeterministic; the engine folds j = 0..255)
    "t_hll_portable" -> {
      val nib = (i: Int) =>
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
      val h52 = (3 to 15).map { i =>
        val mul = 1L << (4 * (15 - i))
        s"${nib(i)} * CAST($mul AS BIGINT)"
      }.mkString("\n    + ")
      s"""WITH words AS (
         |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |hx AS (SELECT lang, md5(w) AS h FROM words),
         |jr AS (
         |  SELECT lang, ${nib(1)} * 16 + ${nib(2)} AS j,
         |    $h52 AS h52
         |  FROM hx),
         |rr AS (
         |  SELECT lang, j,
         |    CASE WHEN h52 = 0 THEN 53
         |         ELSE 53 - length(bin(h52)) END AS rho
         |  FROM jr),
         |regs AS (SELECT lang, j, max(rho) AS mj FROM rr GROUP BY 1, 2),
         |grid AS (
         |  SELECT l.lang, u.j, regs.mj
         |  FROM (SELECT DISTINCT lang FROM words) l
         |  CROSS JOIN (SELECT unnest(range(0, 256)) AS j) u
         |  LEFT JOIN regs ON regs.lang = l.lang AND regs.j = u.j),
         |hm AS (
         |  SELECT lang,
         |    list_sum(list(pow(2.0, -coalesce(mj, 0)) ORDER BY j))
         |      AS sumpow,
         |    CAST(sum(CASE WHEN mj IS NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS zeros
         |  FROM grid GROUP BY lang),
         |est AS (
         |  SELECT lang,
         |    CASE WHEN 0.7213 / (1 + 1.079 / 256.0) * 65536.0 / sumpow
         |           <= 640.0 AND zeros > 0
         |      THEN 256.0 * ln(256.0 / zeros)
         |      ELSE 0.7213 / (1 + 1.079 / 256.0) * 65536.0 / sumpow
         |      END AS e
         |  FROM hm),
         |ex AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS exact_distinct
         |  FROM words GROUP BY lang)
         |SELECT ex.lang, ex.exact_distinct, round(est.e, 4) + 0.0 AS est
         |FROM ex JOIN est USING (lang)
         |ORDER BY lang""".stripMargin
    },
    // the portable CMS replayed: same md5-nibble buckets (seed j
    // prefixed), same vocabulary-weighted construction, min over depth
    "t_cms_portable" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM words GROUP BY w),
        |js AS (SELECT unnest(range(0, 4)) AS j),
        |hb AS (
        |  SELECT w, c, j,
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(j AS VARCHAR) || ':' || w), 1, 1)) - 1)
        |      * 4096 +
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(j AS VARCHAR) || ':' || w), 2, 1)) - 1)
        |      * 256 +
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(j AS VARCHAR) || ':' || w), 3, 1)) - 1)
        |      * 16 +
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(j AS VARCHAR) || ':' || w), 4, 1)) - 1)
        |      AS b
        |  FROM wc, js),
        |cms AS (SELECT j, b, sum(c) AS cc FROM hb GROUP BY j, b),
        |ex AS (
        |  SELECT w, c AS exact FROM wc ORDER BY c DESC, w LIMIT 20)
        |SELECT ex.w, ex.exact, CAST(min(cms.cc) AS BIGINT) AS est
        |FROM ex
        |JOIN hb ON hb.w = ex.w
        |JOIN cms ON cms.j = hb.j AND cms.b = hb.b
        |GROUP BY ex.w, ex.exact
        |ORDER BY ex.exact DESC, ex.w""".stripMargin,
    "t_heaps_fit" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |perdoc AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY 1),
        |newt AS (
        |  SELECT fdoc AS doc_id, count(*) AS nv FROM (
        |    SELECT w, min(doc_id) AS fdoc FROM toks GROUP BY w)
        |  GROUP BY 1),
        |cum AS (
        |  SELECT ln(sum(p.nt) OVER (ORDER BY p.doc_id
        |      ROWS UNBOUNDED PRECEDING)) AS x,
        |    ln(sum(coalesce(n.nv, 0)) OVER (ORDER BY p.doc_id
        |      ROWS UNBOUNDED PRECEDING)) AS y
        |  FROM perdoc p LEFT JOIN newt n USING (doc_id)),
        |agg AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS m, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM cum)
        |SELECT
        |  round((m*sxy - sx*sy) / (m*sxx - sx*sx), 4) AS beta,
        |  round((sy - ((m*sxy - sx*sy) / (m*sxx - sx*sx)) * sx) / m, 4)
        |    AS ln_k,
        |  CAST(m AS BIGINT) AS n_points
        |FROM agg""".stripMargin,
    "t_zipf_fit" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |f AS (SELECT source, word, count(*) AS f FROM w GROUP BY 1, 2),
        |types AS (SELECT source, count(*) AS n_types FROM f GROUP BY 1),
        |top AS (
        |  SELECT source, f, row_number() OVER (
        |    PARTITION BY source ORDER BY f DESC, word) AS rk
        |  FROM f QUALIFY rk <= 100),
        |xy AS (SELECT source, ln(rk) AS x, ln(f) AS y FROM top),
        |agg AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM xy GROUP BY 1)
        |SELECT a.source,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS zipf_slope,
        |  t.n_types
        |FROM agg a JOIN types t USING (source)
        |ORDER BY source""".stripMargin,
    "t_length_outliers" ->
      """WITH s1 AS (
        |  SELECT source, median(n_chars) AS med, mad(n_chars) AS madv
        |  FROM documents GROUP BY 1),
        |dev AS (
        |  SELECT d.source, abs(d.n_chars - s1.med) AS dv, s1.med, s1.madv
        |  FROM documents d JOIN s1 USING (source))
        |SELECT source, count(*) AS n_docs,
        |  any_value(med) AS med_chars, any_value(madv) AS mad_chars,
        |  CAST(sum(CASE WHEN dv > 3.0 * madv THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev GROUP BY source
        |ORDER BY source""".stripMargin,
    // The custom RollingHash expression (h := h*31 + byte, natural Long
    // wraparound) re-derived with HUGEINT modular arithmetic: chars fold
    // through a recursive CTE, (h*31 + c) mod 2^64 each step (h < 2^64
    // and 31h+c < 2^69 << 2^127, so the HUGEINT intermediate never
    // overflows), then mapped back to the signed-64 representation.
    // Valid while the fixture is ASCII (char = UTF-8 byte; verified: 0
    // non-ASCII docs) — the multi-byte case is covered by the reference-
    // impl equality in PipelineSpec instead.
    "t_rolling_fingerprint" ->
      """WITH RECURSIVE chars AS (
        |  SELECT doc_id, i,
        |    CAST(ascii(substr(text, CAST(i AS INT), 1)) AS HUGEINT) c
        |  FROM documents, unnest(range(1, len(text) + 1)) AS u(i)),
        |lens AS (SELECT doc_id, len(text) n FROM documents),
        |roll(doc_id, i, h) AS (
        |  SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS HUGEINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT r.doc_id, r.i + 1,
        |    (r.h * 31 + c.c) % CAST('18446744073709551616' AS HUGEINT)
        |  FROM roll r JOIN chars c ON c.doc_id = r.doc_id
        |    AND c.i = r.i + 1)
        |SELECT roll.doc_id,
        |  CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN h - CAST('18446744073709551616' AS HUGEINT)
        |       ELSE h END AS BIGINT) AS fp
        |FROM roll JOIN lens ON lens.doc_id = roll.doc_id
        |  AND roll.i = lens.n
        |ORDER BY roll.doc_id""".stripMargin,
    "t_pii_redact" ->
      """WITH dirty AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@mail.example.com'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END AS dirty
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(dirty,
        |    '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(dirty,
        |    '\+1-555-[0-9]{4}')) AS INT) AS n_phones,
        |  regexp_replace(regexp_replace(dirty,
        |    '[a-z0-9.]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM dirty ORDER BY doc_id""".stripMargin,
    "t_informativeness" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(t) - 2 + 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS ngram
        |  FROM (SELECT doc_id, string_split(text, ' ') t FROM documents)
        |  WHERE len(t) >= 3),
        |df AS (SELECT ngram, count(*) AS df FROM sh GROUP BY ngram)
        |SELECT doc_id,
        |  CAST(sum(df) AS BIGINT) AS df_sum,
        |  count(*) AS n_distinct_trigrams,
        |  floor(sum(df) / (count(*) * 1.0) * 10000 + 0.5) / 10000.0
        |    AS mean_df
        |FROM sh JOIN df USING (ngram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t_repetition" ->
      """WITH occ AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, len(t) - 2 + 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ngram
        |  FROM (SELECT doc_id, string_split(text, ' ') t FROM documents)
        |  WHERE len(t) >= 3),
        |counts AS (
        |  SELECT doc_id, ngram, count(*) AS n FROM occ GROUP BY 1, 2)
        |SELECT doc_id,
        |  floor(max(n) / (sum(n) * 1.0) * 10000 + 0.5) / 10000.0
        |    AS top_trigram_frac,
        |  floor((sum(n) - count(*)) / (sum(n) * 1.0) * 10000 + 0.5)
        |    / 10000.0 AS dup_trigram_frac,
        |  CAST(sum(n) AS BIGINT) AS n_trigrams
        |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exact on the fixture BY CONSTRUCTION: per-language vocabulary is 31
    // words (every SF) vs a 64-counter budget, so no eviction can occur,
    // counts are true counts and err = 0 — which makes the approximate
    // operator itself hash-gated here (the same fixture-margin trick as
    // d_ngram_jaccard_capped). Eviction behavior is spec-covered with
    // vocab > m fixtures in FreqSketchSpec.
    "t_heavy_hitters" ->
      """WITH wc AS (
        |  SELECT lang, w, count(*) AS est
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT lang, w, est, row_number() OVER (
        |    PARTITION BY lang ORDER BY est DESC, w) AS rk
        |  FROM wc)
        |SELECT lang, w, est, CAST(0 AS BIGINT) AS err
        |FROM rk WHERE rk <= 10 ORDER BY lang, w""".stripMargin,
    "t_word_entropy" ->
      """WITH wc AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |  floor((log2(sum(c)) - sum(c * log2(c)) / (sum(c) * 1.0))
        |    * 10000 + 0.5) / 10000.0 AS entropy,
        |  floor(count(*) / (sum(c) * 1.0) * 10000 + 0.5) / 10000.0 AS ttr,
        |  CAST(sum(c) AS BIGINT) AS n_tokens
        |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t_oov_rate" ->
      s"""SELECT doc_id,
         |  CAST(len($oracleToks) AS INT) AS n_tokens,
         |  CAST(len(list_filter($oracleToks,
         |    t -> NOT list_contains(['the','data','join','table','scan',
         |      'merge','row','key','value','query','filter','sort',
         |      'group'], t))) AS INT) AS n_oov
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len($oracleToks) AS INT) AS n_tokens,
         |  CAST(len(list_distinct($oracleToks)) AS INT) AS n_distinct,
         |  CAST(list_sum(list_transform($oracleToks,
         |    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT)
         |    AS n_subwords,
         |  CAST(length(text) AS INT) AS n_chars_text
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t_top_ngrams" ->
      """WITH sh AS (
        |  SELECT lang, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS ngram
        |  FROM (SELECT lang, string_split(text, ' ') t FROM documents)
        |  WHERE len(t) >= 3),
        |counts AS (
        |  SELECT lang, ngram, count(*) AS n FROM sh GROUP BY lang, ngram)
        |SELECT lang, ngram, n FROM (
        |  SELECT lang, ngram, n, row_number() OVER (
        |    PARTITION BY lang ORDER BY n DESC, ngram) AS rk
        |  FROM counts)
        |WHERE rk <= 5
        |ORDER BY lang, n DESC, ngram""".stripMargin,
    "t_readability" ->
      s"""SELECT doc_id, n_words, n_sentences, n_syllables,
         |  floor((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
         |       + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
         |       - 15.59) * 100.0 + 0.5) / 100.0 AS fk_grade
         |FROM (
         |  SELECT doc_id,
         |    CAST(len($oracleToks) AS INT) AS n_words,
         |    CAST(greatest(1,
         |      len(regexp_extract_all(text, '[.!?]+'))) AS INT)
         |      AS n_sentences,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
         |      AS INT) AS n_syllables
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "t_quality_score" ->
      s"""SELECT doc_id,
         |  floor(ttr * 10000 + 0.5) / 10000.0 AS type_token_ratio,
         |  floor(stop * 10000 + 0.5) / 10000.0 AS stopword_ratio,
         |  floor((0.4 * ttr + 0.3 * (1.0 - stop) +
         |         0.3 * least(n / 100.0, 1.0)) * 10000 + 0.5) / 10000.0
         |    AS quality
         |FROM (
         |  SELECT doc_id,
         |    len($oracleToks) * 1.0 AS n,
         |    len(list_distinct($oracleToks)) / (len($oracleToks) * 1.0)
         |      AS ttr,
         |    len(list_filter($oracleToks,
         |      t -> list_contains(['the','a','of','and','to'], t))) /
         |      (len($oracleToks) * 1.0) AS stop
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "t_lang_id" ->
      s"""SELECT doc_id, lang AS labeled,
         |  CASE
         |    WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
         |    WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
         |    WHEN de >= fr AND de > 0 THEN 'de'
         |    WHEN fr > 0 THEN 'fr'
         |    ELSE 'und' END AS predicted
         |FROM (
         |  SELECT doc_id, lang,
         |    len(list_filter(list_distinct($oracleToks),
         |      t -> list_contains(['the','a','of'], t))) AS en,
         |    len(list_filter(list_distinct($oracleToks),
         |      t -> list_contains(['la','el','los'], t))) AS es,
         |    len(list_filter(list_distinct($oracleToks),
         |      t -> list_contains(['der','die','das'], t))) AS de,
         |    len(list_filter(list_distinct($oracleToks),
         |      t -> list_contains(['le','les','des'], t))) AS fr
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    // every flag is an integer cross-multiplication over counts both
    // engines derive from the identical synthesized text — no float ever
    // enters, so the hash compare is exact. DuckDB regexp_replace needs
    // the explicit 'g' flag to match Spark's replace-all semantics.
    "t_gopher_rules" ->
      s"""WITH enr AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 7 AS INT)
         |      WHEN 0 THEN '- ' || regexp_replace(text, ' scan ',
         |        ' scan' || chr(10) || '- ', 'g')
         |      WHEN 1 THEN regexp_replace(text, ' table ',
         |        ' table...' || chr(10), 'g')
         |      WHEN 2 THEN regexp_replace(text, ' value ', ' #value# ', 'g')
         |      WHEN 3 THEN regexp_replace(text, ' a ', chr(10), 'g')
         |      WHEN 4 THEN regexp_replace(text, ' key ', ' 42 ', 'g')
         |      ELSE text END AS t
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, t,
         |    list_filter(string_split_regex(t, '[ \\n]'), x -> x <> '')
         |      AS words,
         |    list_filter(string_split_regex(t, '\\n'), x -> x <> '')
         |      AS lines
         |  FROM enr),
         |r AS (
         |  SELECT doc_id,
         |    CAST(len(words) AS BIGINT) AS w,
         |    CAST(greatest(1, len(lines)) AS BIGINT) AS l,
         |    CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0)
         |      AS BIGINT) AS sumlen,
         |    CAST(len(t) - len(replace(t, '#', '')) AS BIGINT) AS n_hash,
         |    CAST(len(regexp_extract_all(t, '\\.\\.\\.')) AS BIGINT)
         |      AS n_ell,
         |    CAST(len(list_filter(lines, x -> substr(x, 1, 2) = '- '))
         |      AS BIGINT) AS n_bul,
         |    CAST(len(list_filter(lines, x -> len(x) >= 3
         |      AND substr(x, len(x) - 2, 3) = '...')) AS BIGINT) AS n_elline,
         |    CAST(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
         |      AS BIGINT) AS n_alpha,
         |    CAST(len(list_filter(
         |      ['the','be','to','of','and','that','have','with'],
         |      s -> list_contains(words, s))) AS BIGINT) AS n_stop
         |  FROM m)
         |SELECT doc_id, w AS n_words, l AS n_lines,
         |  (w >= 50 AND w <= 100000) AS ok_word_count,
         |  (3 * w <= sumlen AND sumlen <= 10 * w) AS ok_mean_word_len,
         |  (10 * (n_hash + n_ell) <= w) AS ok_symbol_ratio,
         |  (10 * n_bul <= 9 * l) AS ok_bullet_lines,
         |  (10 * n_elline <= 3 * l) AS ok_ellipsis_lines,
         |  (10 * n_alpha >= 8 * w) AS ok_alpha_words,
         |  (n_stop >= 2) AS ok_stopwords,
         |  ((w >= 50 AND w <= 100000) AND
         |   (3 * w <= sumlen AND sumlen <= 10 * w) AND
         |   (10 * (n_hash + n_ell) <= w) AND (10 * n_bul <= 9 * l) AND
         |   (10 * n_elline <= 3 * l) AND (10 * n_alpha >= 8 * w) AND
         |   (n_stop >= 2)) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    // identical synthesized line structure, then pure integer counts and
    // substring/anchor predicates — the hash compare is exact. DuckDB's
    // array_to_string returns NULL (not '') on an empty list, unlike
    // Spark's array_join — the coalesce pins the empty-kept doc to ''.
    // min(doc_id) is an exact integer selection; counts and the
    // micro-fraction are BIGINT with integer DIV — hash-exact
    "t_ngram_novelty" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') t FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(t) - 2, 1) + 1),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) g
         |  FROM toks WHERE len(t) >= 3),
         |f AS (SELECT g, min(doc_id) fdoc FROM sh GROUP BY 1)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN fdoc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  (1000000 * CAST(sum(CASE WHEN fdoc = doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT)) // CAST(count(*) AS BIGINT) AS novelty_micro
         |FROM sh JOIN f USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // profile training and scoring are pure integer counts; the argmax
    // and the top-20 cut share the engine's (n DESC, key ASC) total order
    "t_charngram_langid" -> charngramLangidSql,
    // identical answer by construction (train-once/score-many variant)
    "t_charngram_langid_trained" -> charngramLangidSql,
    // integer DIV in both engines (Spark DIV ≡ DuckDB //): exact BIGINT
    // scores, deterministic (score DESC, word) total order per source
    "t_tfidf_keywords" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS word
         |  FROM documents),
         |tf AS (
         |  SELECT source, word, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(DISTINCT source) AS n_src FROM documents),
         |scored AS (
         |  SELECT source, word, tf, df,
         |    tf * ((1000000 * n_src) // df) AS score_micro
         |  FROM tf JOIN df USING (word) CROSS JOIN n),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source ORDER BY score_micro DESC, word) AS rn
         |  FROM scored)
         |SELECT source, word, tf, df, score_micro
         |FROM r WHERE rn <= 5
         |ORDER BY source, score_micro DESC, word""".stripMargin,
    "t_c4_rules" ->
      s"""WITH enr AS (
         |  SELECT doc_id,
         |    regexp_replace(text, ' merge ', '.' || chr(10), 'g') ||
         |    CASE CAST(doc_id % 5 AS INT)
         |      WHEN 0 THEN ' lorem ipsum.'
         |      WHEN 1 THEN chr(10) ||
         |        'please enable javascript to view this page.'
         |      WHEN 2 THEN ' { padding }'
         |      WHEN 3 THEN ' end of the document.'
         |      ELSE '' END AS t
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, t,
         |    list_filter(string_split(t, chr(10)), x -> x <> '') AS lines,
         |    list_filter(
         |      list_filter(string_split(t, chr(10)), x -> x <> ''),
         |      x -> regexp_matches(x, '[.!?"]$$')
         |        AND len(list_filter(string_split(x, ' '), w -> w <> ''))
         |          >= 5
         |        AND NOT contains(x, 'javascript')) AS kept
         |  FROM enr)
         |SELECT doc_id,
         |  CAST(len(lines) AS INT) AS n_lines,
         |  CAST(len(kept) AS INT) AS n_kept,
         |  (NOT contains(t, 'lorem ipsum') AND NOT contains(t, '{')
         |    AND len(kept) >= 3) AS keep_page,
         |  coalesce(array_to_string(kept, chr(10)), '') AS text_clean
         |FROM k ORDER BY doc_id""".stripMargin,
    // the classifier's integer pipeline spelled out verbatim; the mean
    // is the only float op, rounded with the shared floor(x·10⁴+0.5)
    // form (valid for negative scores too: both engines floor toward -∞)
    "t_hash_classifier" ->
      s"""SELECT doc_id,
         |  floor((CAST(ws AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0))
         |    * 10000 + 0.5) / 10000.0 AS score,
         |  CASE WHEN ws >= 0 THEN 'pos' ELSE 'neg' END AS label
         |FROM (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform($oracleToks, w ->
         |      ((((length(w) * 31 + ascii(substr(w, 1, 1)) * 7
         |          + ascii(substr(w, -1, 1))) * 2654435761)
         |        % 1048576) * 40503) % 2001 - 1000)) AS BIGINT) AS ws,
         |    CAST(len($oracleToks) AS BIGINT) AS n
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin)
}
