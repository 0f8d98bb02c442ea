package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram-LM tokenizer training (the SentencePiece algorithm, Kudo
  * 2018) — the second of the two tokenizer-training algorithms real
  * pipelines run, complementing [[Bpe]]: BPE grows a vocabulary bottom-
  * up by merging; unigram starts from an over-complete substring
  * vocabulary and re-estimates piece usage, keeping the pieces the
  * corpus actually segments with. Hard-EM variant: the E-step is
  * Viterbi (max, not sum) segmentation, so piece usage counts are exact
  * INTEGERS — every round's state is engine-portable and
  * partition-independent (per-word DP + integer frequency sums), which
  * is what makes the whole trainer deterministic across runs, retries,
  * and layouts.
  *
  * Scale shape — the same dedupe-then-weight rule as BPE: everything
  * after the one corpus word-count scan runs on the DISTINCT-WORD
  * vocabulary weighted by frequency. Seeding aggregates substring
  * occurrences (≤ maxWordLen · maxPieceLen rows per vocab word, one
  * shuffle); the kept piece table is driver-bounded by construction
  * (`vocabSize`, the same size class as a broadcast side or the PQ
  * codebook) and broadcast back; each EM round is ONE vocabulary-sized
  * job. 100 TB and 100 GB train the same pieces at the same
  * per-round cost.
  *
  * The per-word Viterbi DP runs as a typed `Dataset.map` over the
  * broadcast piece table — the documented per-row-imperative exception:
  * a position DP with backpointers has no HOF/codegen form, the frame
  * it runs on is vocabulary-sized (never the corpus), and the
  * segmentation of one word touches nothing but that word and the
  * shared read-only vocabulary.
  *
  * Rows-only (iterative EM state, like BPE's merge table, is not
  * SQL-expressible in one oracle query); UnigramSpec pins the trained
  * table and the encoding against an independent sequential reference.
  */
object Unigram {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic Viterbi segmentation of `word` under `score`
    * (log-prob per piece; pieces absent score -inf). Ties break to the
    * LONGER last piece (smaller backpointer), then are impossible
    * deeper: two paths with equal score and equal last piece share a
    * prefix-best that was itself tie-broken. Single-char fallback keeps
    * every word segmentable (chars are always in the vocabulary).
    */
  def viterbi(word: String, score: collection.Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val w = word.length
    val best = new Array[Double](w + 1)
    val back = new Array[Int](w + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= w) {
      var j = math.max(0, i - maxPieceLen)
      // iterate j ascending = longer pieces first; strict > keeps the
      // FIRST (longest-piece) argmax on ties
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          score.get(word.substring(j, i)).foreach { s =>
            if (best(j) + s > best(i)) { best(i) = best(j) + s; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(w) == Double.NegativeInfinity)
      return word.map(_.toString) // unreachable while chars are kept
    val stack = scala.collection.mutable.Stack[String]()
    var p = w
    while (p > 0) { stack.push(word.substring(back(p), p)); p = back(p) }
    stack.toSeq // top of stack = first piece: already in word order
  }

  /** Train the piece table: seed from frequency-weighted substring
    * occurrences (all single chars + the top multi-char candidates by
    * (count desc, piece asc) up to `vocabSize`), then `rounds` hard-EM
    * rounds of Viterbi-segment → integer re-count → re-score. Pieces a
    * round leaves unused are pruned (chars never are). Returns the
    * final (piece, count) table, counts from the last E-step.
    */
  def train(vocab: DataFrame, vocabSize: Int = 512, rounds: Int = 3,
      maxPieceLen: Int = 6, maxWordLen: Int = 20)
      : Seq[(String, Long)] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val words = vocab.select(col("w"), col("freq"))
      .filter(length(col("w")).between(1, maxWordLen))
      .as[(String, Long)].persist()
    words.count()
    // seed: substring occurrence mass, one explode + one shuffle
    val subs = words.toDF("w", "freq").select(col("freq"),
        explode(flatten(transform(
          sequence(lit(0), length(col("w")) - 1), st =>
            transform(
              sequence(lit(1),
                least(lit(maxPieceLen), length(col("w")) - st)),
              ln => col("w").substr(st + 1, ln)))))
          .as("p"))
      .groupBy("p").agg(sum(col("freq")).as("cnt"))
    val chars = subs.filter(length(col("p")) === 1)
      .orderBy(col("p")).as[(String, Long)].collect()
    val multi = subs.filter(length(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p"))
      .limit(math.max(0, vocabSize - chars.length))
      .as[(String, Long)].collect()
    var table: Seq[(String, Long)] = (chars ++ multi).toSeq
    for (_ <- 1 to rounds) {
      val total = math.max(1L, table.map(_._2).sum).toDouble
      // zero-count pieces (possible for chars after round 1) carry no
      // probability mass: excluded from scoring, single-char fallback
      // keeps their words segmentable
      val score = table.collect { case (p, c) if c > 0 =>
        p -> (math.log(c.toDouble) - math.log(total)) }.toMap
      val bc = spark.sparkContext.broadcast(score)
      // E-step: one vocabulary-sized job; counts are exact integers
      val counts = words.flatMap { case (w, f) =>
        viterbi(w, bc.value, maxPieceLen).map(_ -> f)
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().toMap
      bc.destroy()
      // M-step: used pieces re-scored; unused multi-char pieces pruned
      table = table.flatMap { case (p, _) =>
        counts.get(p) match {
          case Some(c) => Some(p -> c)
          case None => if (p.length == 1) Some(p -> 0L) else None
        }
      }
    }
    words.unpersist()
    table
  }

  /** Inference twin: segment the distinct-word vocabulary with the
    * trained table, join per-doc word occurrences back — the corpus is
    * scanned, never segmented per occurrence.
    */
  def encode(docs: DataFrame, table: Seq[(String, Long)],
      maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val total = math.max(1L, table.map(_._2).sum).toDouble
    val score = table.collect { case (p, c) if c > 0 =>
      p -> (math.log(c.toDouble) - math.log(total)) }.toMap
    val bc = spark.sparkContext.broadcast(score)
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // Eagerly materialize the vocabulary-sized segmentation frame and cut
    // its lineage so the score broadcast can be destroyed here rather than
    // leaking for the life of the session (train destroys per-round; this
    // is the inference twin's equivalent hygiene).
    val segmented = words.select("w").distinct().as[String]
      .map(w => (w, viterbi(w, bc.value, maxPieceLen).size.toLong))
      .toDF("w", "n_pieces")
      .localCheckpoint(true)
    bc.destroy()
    words.join(segmented, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
  }

  val queries: Map[String, Q] = Map(
    // trained piece table, top 50 by final usage — rows-only BY
    // DOCUMENTED REASON (unlike t_bpe_merges, which graduated): the
    // Viterbi E-step's argmax compares FLOAT log-prob path sums, and a
    // cross-engine 1-ulp difference in log() can flip a near-tie
    // argmax, which changes the chosen SEGMENTATION — a structural
    // divergence no output-grid rounding can absorb (the s_mahalanobis
    // class of impossibility, not the s_pca_top class: there the
    // iterate contracts back, here the flipped path feeds different
    // integer counts to the next round). Graduating would mean moving
    // the engine itself to integer-quantized piece scores so the DP
    // compares integers; until then UnigramSpec pins train + encode
    // against an independent in-memory sequential reference.
    "t_unigram_train" -> { (s, d) =>
      val table = train(Bpe.vocabulary(
        Tables.spread(Tables.documents(s, d))))
      s.createDataFrame(
          table.sortBy { case (p, c) => (-c, p) }.take(50))
        .toDF("piece", "cnt")
    },
    // rows-only for the same reason as t_unigram_train (the encoding
    // is a function of the float-Viterbi-trained table)
    "t_unigram_encode" -> { (s, d) =>
      val docs = Tables.spread(Tables.documents(s, d))
      val table = train(Bpe.vocabulary(docs))
      encode(docs, table).orderBy("doc_id")
    })

  // float-Viterbi argmax is structurally engine-divergent (see the
  // t_unigram_train note above); UnigramSpec checks the table and
  // encoding against a sequential reference
  val oracles: Map[String, String] = Map.empty
}
