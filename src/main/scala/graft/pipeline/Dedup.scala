package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for LLM training-data pipelines (north star;
  * the reference has no dedup — its only duplicate handling is at-least-once
  * redelivery collapse, SURVEY §2.6 ST8).
  *
  * Four tiers, in increasing scale-friendliness:
  *   - exact: hash-groupBy on content — one shuffle on the content hash;
  *   - fingerprint: md5 over the normalized token set — order/multiplicity
  *     invariant, still one shuffle, catches shuffled/duplicated-token docs;
  *   - n-gram Jaccard: shingle blocking self-join — exact similarity, the
  *     oracle-checkable ground truth for the approximate tiers;
  *   - MinHash+LSH (and SimHash in [[Fingerprints]]): the 100 TB path —
  *     signature size is constant per doc, candidate generation is an
  *     equi-join on band keys, never an all-pairs product.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct word-trigram shingles per doc: `sequence`/`transform` higher-
    * order functions — all codegen, no UDF.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }

  /** Normalized content fingerprint: md5 over the sorted distinct token
    * set — invariant to token order and repetition.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(text, " ")))))

  /** Doc pairs with trigram-shingle Jaccard ≥ threshold, via shingle
    * blocking (shared-shingle equi-join → per-pair intersection counts).
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // block on the 64-bit shingle hash, not the ~30-char string: same
    // join/groupBy semantics (collision odds ~1e-10 at this cardinality),
    // 4× narrower shuffle rows
    val sh = docs
      .select(col("doc_id"), explode(shingles(col("text"))).as("s_str"))
      .select(col("doc_id"), xxhash64(col("s_str")).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  val queries: Map[String, Q] = Map(
    // Exact dedup: duplicated delivery (doc_id < 100 re-ingested) collapses
    // on content; keeper = min doc_id. Hash-groupBy — single shuffle.
    "d_exact_dup" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      docs.union(docs.filter(col("doc_id") < 100))
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"))
        .select(col("keeper"), col("copies"))
        .orderBy("keeper")
    },
    // Fingerprint dedup: the fixture plants token-permuted near-dups, so
    // normalized fingerprints genuinely collide (≈12% of docs).
    "d_fingerprint_dup" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("members"))
        .filter(col("members") > 1)
        .select(col("keeper"), col("members"))
        .orderBy("keeper")
    },
    // Exact n-gram Jaccard near-dup pairs (threshold 0.8 — nearest fixture
    // pair is >0.08 away on both sides, so float-safe).
    "d_ngram_jaccard" -> { (s, d) =>
      jaccardPairs(Tables.documents(s, d), 0.8)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("da", "db")
    },
    // Embedding cosine near-dup pairs: brute-force on the checkable scale;
    // the LSH-bucketed variant in Similarity is the 100 TB path.
    "d_embedding_dup" -> { (s, d) =>
      // normalize each side once (linear), so each of the O(n²) pairs is a
      // single codegen'd primitive dot product
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"),
          VectorOps.normalized(VectorOps.asDouble(col("embedding"))).as("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          VectorOps.dot(col("a.v"), col("b.v")).as("c"))
        .filter(col("c") > 0.47)
        .select(col("va"), col("vb"))
        .orderBy("va", "vb")
    })

  val oracles: Map[String, String] = Map(
    "d_exact_dup" ->
      """SELECT min(doc_id) AS keeper, count(*) AS copies FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100)
        |GROUP BY text ORDER BY keeper""".stripMargin,
    "d_fingerprint_dup" ->
      """SELECT min(doc_id) AS keeper, count(*) AS members
        |FROM (SELECT doc_id,
        |        md5(array_to_string(list_sort(list_distinct(
        |          string_split(text, ' '))), ' ')) AS fp
        |      FROM documents)
        |GROUP BY fp HAVING count(*) > 1 ORDER BY keeper""".stripMargin,
    "d_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) s
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id da, b.doc_id db, count(*) i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db,
        |       round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = da
        |JOIN sizes sb ON sb.doc_id = db
        |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
        |ORDER BY da, db""".stripMargin,
    "d_embedding_dup" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) > 0.47
        |ORDER BY va, vb""".stripMargin)
}
