package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE merge learning — tokenizer TRAINING as a distributed operator
  * (the train-time twin of the chars/4 inference estimate in
  * [[TextAnalysis.subwordEstimate]]).
  *
  * The scale shape is the engine's dedupe-then-weight rule: pair
  * statistics live on the DISTINCT-WORD vocabulary weighted by word
  * frequency, so every iteration aggregates a vocabulary-sized frame —
  * a few hundred thousand rows at any corpus size — never the corpus.
  * The corpus is touched exactly once (the word count); 100 TB and
  * 100 GB train the same merges at the same per-iteration cost.
  *
  * Per merge round: one weighted pair count over the vocabulary (one
  * shuffle), a 1-row argmax to the driver (deterministic tie-break:
  * count desc, then pair lexicographic), and a per-row fold that
  * rewrites each word's symbol array greedily left-to-right —
  * non-overlapping, the classic BPE application order. The vocabulary
  * is re-persisted per round and the lineage truncated, the same
  * iterative-DataFrame discipline as [[Dedup.dupClusters]].
  *
  * Rows-only (the iterative argmax is not SQL-expressible in one
  * oracle query); BpeSpec pins the result against an independent
  * sequential reference implementation.
  */
object Bpe {
  type Q = (SparkSession, String) => DataFrame

  /** Greedy left-to-right single-merge application: adjacent (a, b)
    * becomes the concatenated symbol; a merged symbol is never re-used
    * as the LEFT side within the same scan (non-overlapping), matching
    * the sequential reference. Pure fold — codegen-free HOF, but the
    * frame it runs on is vocabulary-sized.
    */
  def applyMerge(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"), (acc, s) =>
      // try_element_at: the fold starts from an EMPTY accumulator, and
      // under ANSI (Spark 4 default) a plain element_at(-1) on it is a
      // query-killing error, not a null
      when(try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` merges from (word, freq) vocabulary rows.
    * Returns (rank, left, right, pair_count) — the merge table in
    * learned order.
    */
  def learnMerges(vocab0: DataFrame, nMerges: Int): Seq[(Int, String,
      String, Long)] = {
    var vocab = vocab0
      .select(col("freq"), split(col("w"), "").as("sym"))
      .persist()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val pairs = vocab.select(col("freq"), explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      // scalar argmax — a TakeOrderedAndProject of ONE row, the same
      // driver-size class as a broadcast threshold
      val best = pairs
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) {
        vocab.unpersist(); return merges.toSeq
      }
      val a: String = best(0).getString(0)
      val b: String = best(0).getString(1)
      val cnt: Long = best(0).getLong(2)
      merges += ((rank, a, b, cnt))
      val next = vocab
        .select(col("freq"), applyMerge(col("sym"), a, b).as("sym"))
        .localCheckpoint(true) // truncate the per-round fold lineage
      vocab.unpersist()
      vocab = next
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Corpus word vocabulary: the ONLY corpus-sized pass. */
  def vocabulary(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** BPE ENCODING — the inference twin of [[learnMerges]]: the merge
    * table applied in rank order (each rank one greedy non-overlapping
    * [[applyMerge]] scan — cascades work because later ranks see
    * earlier ranks' merged symbols), producing per-doc subword counts.
    *
    * Dedupe-then-weight again: the 10-deep fold chain evaluates per
    * DISTINCT word (vocabulary-sized frame), and docs join the
    * word → n_subwords table back on the word — the corpus is scanned,
    * never folded per occurrence. At 100 TB the fold cost is fixed by
    * |vocab| · |merges| regardless of corpus size; the join is one
    * shuffle on the word (or a broadcast when the vocab fits).
    */
  def encode(docs: DataFrame,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val sym = merges.sortBy(_._1).foldLeft(split(col("w"), "")) {
      case (c, (_, a, b, _)) => applyMerge(c, a, b)
    }
    val encodedVocab = words.select("w").distinct()
      .select(col("w"), size(sym).cast("long").as("n_sub"))
    words.join(encodedVocab, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }

  val queries: Map[String, Q] = Map(
    "t_bpe_merges" -> { (s, d) =>
      val merges = learnMerges(
        vocabulary(Tables.spread(Tables.documents(s, d))), 10)
      s.createDataFrame(merges)
        .toDF("rank", "left", "right", "pair_count")
        .orderBy("rank")
    },
    // the full tokenizer pipeline: train 10 merges on the corpus, then
    // encode the same corpus with them. Rows-only like t_bpe_merges
    // (the learned table is iterative state no single SQL query can
    // reproduce); BpeSpec pins encode against the sequential reference
    // and the reconstruction/compression invariants
    "t_bpe_encode" -> { (s, d) =>
      val docs = Tables.spread(Tables.documents(s, d))
      val merges = learnMerges(vocabulary(docs), 10)
      encode(docs, merges).orderBy("doc_id")
    })

  // iterative argmax — no single-query SQL oracle; BpeSpec checks the
  // merge table against an independent sequential reference
  val oracles: Map[String, String] = Map.empty
}
