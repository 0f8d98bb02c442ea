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
  * Oracle-backed since round 10 (the last trainer to graduate): piece
  * scores are quantized to the 1e-6 integer grid BEFORE the Viterbi DP
  * (see [[scoreMicro]]), so path scores are exact integer sums and the
  * segmentation argmax is engine-portable; the DuckDB twin replays the
  * 3 hard-EM rounds UNROLLED with the per-word DP unrolled position by
  * position (maxWordLen steps of plain SQL, each an argmax over ≤
  * maxPieceLen predecessors) and the backpointer walk unrolled the same
  * way. UnigramSpec additionally pins the trained table and the
  * encoding against an independent sequential reference.
  */
object Unigram {
  type Q = (SparkSession, String) => DataFrame

  /** Piece score on the 1e-6 integer grid: ⌊(ln c − ln total)·10⁶ + ½⌋.
    * Quantizing the log-prob BEFORE the DP is what makes the Viterbi
    * argmax engine-portable (round 10): path scores become exact
    * integer sums, so a cross-engine 1-ulp ln() difference can flip a
    * comparison only when the log itself sits within ~1e-10 of a grid
    * boundary — the accepted residual risk class of every *_portable
    * tier — instead of on every near-tie path comparison.
    */
  def scoreMicro(c: Long, total: Long): Long =
    math.floor((math.log(c.toDouble) - math.log(total.toDouble))
      * 1000000.0 + 0.5).toLong

  /** Deterministic Viterbi segmentation of `word` under `score`
    * (1e-6-grid integer log-prob per piece; pieces absent score -inf).
    * Ties break to the LONGER last piece (smaller backpointer), then to
    * the recursively tie-broken prefix best — with integer scores exact
    * ties across different prefixes are possible and resolve
    * identically in any engine applying the same two rules. Single-char
    * fallback keeps every word segmentable (chars can leave the score
    * map only by dropping to count 0).
    */
  def viterbi(word: String, score: collection.Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val w = word.length
    val best = new Array[Long](w + 1)
    val back = new Array[Int](w + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var i = 1
    while (i <= w) {
      var j = math.max(0, i - maxPieceLen)
      // iterate j ascending = longer pieces first; strict > keeps the
      // FIRST (longest-piece) argmax on ties
      while (j < i) {
        if (best(j) != Long.MinValue) {
          score.get(word.substring(j, i)).foreach { s =>
            if (best(j) + s > best(i)) { best(i) = best(j) + s; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(w) == Long.MinValue)
      return word.map(_.toString)
    val stack = scala.collection.mutable.Stack[String]()
    var p = w
    while (p > 0) { stack.push(word.substring(back(p), p)); p = back(p) }
    stack.toSeq // top of stack = first piece: already in word order
  }

  /** The sequential trainer on the collected capped vocabulary (driver
    * fast path): the same seed statistics (substring mass computed on
    * code-point boundaries, exactly like Spark's substr/length), the
    * same (count desc, piece asc in binary UTF-8 order) candidate
    * ranking, and the SAME [[viterbi]]/[[scoreMicro]] functions the
    * distributed E-step maps over its rows — the arithmetic is shared,
    * only the scheduling differs. The M-step mirrors the distributed
    * path's driver code verbatim (including its UTF-16 `p.length == 1`
    * char test — char pieces are single code points on this corpus
    * either way, and exactness to the existing path is the contract).
    */
  private def trainLocal(words: Array[(String, Long)], vocabSize: Int,
      rounds: Int, maxPieceLen: Int): Seq[(String, Long)] = {
    val occ = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- words) {
      // code-point alphabet, matching Spark's substr(st+1, ln) walk
      val cps = w.codePoints().toArray
      var st = 0
      while (st < cps.length) {
        val maxLn = math.min(maxPieceLen, cps.length - st)
        var ln = 1
        while (ln <= maxLn) {
          val p = new String(cps, st, ln)
          occ.update(p, occ.getOrElse(p, 0L) + f)
          ln += 1
        }
        st += 1
      }
    }
    def cpLen(p: String): Int = p.codePointCount(0, p.length)
    val chars = occ.iterator.filter(e => cpLen(e._1) == 1).toArray
      .sortBy(_._1)(Bpe.Utf8Order)
    val multi = occ.iterator.filter(e => cpLen(e._1) > 1).toArray
      .sortBy { case (p, c) => (c, p) }(
        Ordering.Tuple2(Ordering.Long.reverse, Bpe.Utf8Order))
      .take(math.max(0, vocabSize - chars.length))
    var table: Seq[(String, Long)] = (chars ++ multi).toSeq
    for (_ <- 1 to rounds) {
      val total = math.max(1L, table.map(_._2).sum)
      val score = table.collect { case (p, c) if c > 0 =>
        p -> scoreMicro(c, total) }.toMap
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- words; p <- viterbi(w, score, maxPieceLen))
        counts.update(p, counts.getOrElse(p, 0L) + f)
      table = table.flatMap { case (p, _) =>
        counts.get(p) match {
          case Some(c) => Some(p -> c)
          case None => if (p.length == 1) Some(p -> 0L) else None
        }
      }
    }
    table
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
    // Size-gated driver fast path (r17, the [[Bpe.learnMerges]] rule):
    // under the gate ONE collect of the length-capped vocabulary feeds
    // the identical seed + hard-EM loop locally — the distributed path
    // paid the words persist/count, two seed collects and one E-step
    // job per round for vocabulary-bounded arithmetic. UnigramSpec
    // pins both paths to the same sequential reference; above the gate
    // the distributed rounds run unchanged.
    Bpe.collectVocab(
      vocab.select(col("w"), col("freq"))
        .filter(length(col("w")).between(1, maxWordLen)),
      Bpe.driverMaxVocab(spark)) match {
      case Some(ws) =>
        return trainLocal(ws, vocabSize, rounds, maxPieceLen)
      case None => ()
    }
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
      val total = math.max(1L, table.map(_._2).sum)
      // zero-count pieces (possible for chars after round 1) carry no
      // probability mass: excluded from scoring, single-char fallback
      // keeps their words segmentable
      val score = table.collect { case (p, c) if c > 0 =>
        p -> scoreMicro(c, total) }.toMap
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
    val total = math.max(1L, table.map(_._2).sum)
    val score = table.collect { case (p, c) if c > 0 =>
      p -> scoreMicro(c, total) }.toMap
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
    // trained piece table, top 50 by final usage — ORACLE-BACKED since
    // round 10: integer-grid piece scores make the Viterbi argmax
    // engine-portable, and the DuckDB twin replays the 3 hard-EM
    // rounds with the per-word DP and backpointer walk unrolled
    "t_unigram_train" -> { (s, d) =>
      val table = train(Bpe.vocabulary(
        Tables.spread(Tables.documents(s, d))))
      s.createDataFrame(
          table.sortBy { case (p, c) => (-c, p) }.take(50))
        .toDF("piece", "cnt")
    },
    // same replay plus one more (score → DP → walk) pass under the
    // final table over the full distinct-word set
    "t_unigram_encode" -> { (s, d) =>
      val docs = Tables.spread(Tables.documents(s, d))
      val table = train(Bpe.vocabulary(docs))
      encode(docs, table).orderBy("doc_id")
    })

  private val MaxPiece = 6
  private val MaxWord = 20

  /** DP unroll depth for the ENCODE oracle pass: encode() segments
    * words of ANY length (no maxWordLen cap, unlike training), so its
    * SQL twin unrolls deeper than the trainer's 20. Words longer than
    * this bound would char-fallback in the oracle while the engine
    * segments them — a LOUD red row, not a silent wrong answer — and
    * 64 covers any natural-language token by a wide margin (fixture
    * max is 8).
    */
  private val MaxEncodeWord = 64

  /** One Viterbi pass in plain SQL over word set CTE `ws`(w) under
    * score CTE `sc`(p, s): the position DP unrolls as `steps`
    * cumulative CTEs (each position's argmax = rank-1 by score desc
    * then smallest backpointer — the engine's ascending-j strict-> tie
    * rule), then the backpointer walk unrolls the same way, emitting
    * one piece per step. Produces `${tag}pieces`(w, p) — one row per
    * segmented piece occurrence, char fallback for unreachable words.
    */
  private def viterbiCtes(tag: String, ws: String, sc: String,
      steps: Int): String = {
    val dp0 =
      s"""${tag}dp0 AS (
         |  SELECT w, 0 AS i, CAST(0 AS BIGINT) AS best, 0 AS bk
         |  FROM $ws)""".stripMargin
    val dps = (1 to steps).map { k =>
      s"""${tag}dp$k AS MATERIALIZED (
         |  SELECT * FROM ${tag}dp${k - 1}
         |  UNION ALL
         |  SELECT w, i, best, bk FROM (
         |    SELECT d.w, $k AS i, d.best + sc.s AS best, d.i AS bk,
         |      row_number() OVER (PARTITION BY d.w
         |        ORDER BY d.best + sc.s DESC, d.i ASC) AS rn
         |    FROM ${tag}dp${k - 1} d
         |    JOIN $sc sc ON sc.p = substr(d.w, d.i + 1, $k - d.i)
         |    WHERE d.i >= $k - $MaxPiece AND d.i < $k
         |      AND len(d.w) >= $k) t
         |  WHERE rn = 1)""".stripMargin
    }
    val wk0 =
      s"""${tag}wk0 AS (
         |  SELECT w, i, bk FROM ${tag}dp$steps WHERE i = len(w))""".stripMargin
    val wks = (1 to steps - 1).map { s =>
      s"""${tag}wk$s AS MATERIALIZED (
         |  SELECT d.w, d.i, d.bk
         |  FROM ${tag}wk${s - 1} c JOIN ${tag}dp$steps d
         |    ON d.w = c.w AND d.i = c.bk
         |  WHERE c.bk > 0)""".stripMargin
    }
    val pieceUnion = (0 until steps).map(s =>
      s"    SELECT w, substr(w, bk + 1, i - bk) AS p FROM ${tag}wk$s")
      .mkString("\n    UNION ALL\n")
    val pieces =
      s"""${tag}pieces AS MATERIALIZED (
         |  SELECT w, p FROM (
         |$pieceUnion
         |    UNION ALL
         |    SELECT f.w, substr(f.w, CAST(u.i AS INT), 1) AS p
         |    FROM (SELECT w FROM $ws x WHERE NOT EXISTS (
         |            SELECT 1 FROM ${tag}dp$steps d
         |            WHERE d.w = x.w AND d.i = len(x.w))) f,
         |         unnest(range(1, len(f.w) + 1)) u(i)) t)""".stripMargin
    (Seq(dp0) ++ dps ++ Seq(wk0) ++ wks ++ Seq(pieces)).mkString(",\n")
  }

  /** One hard-EM round: integer-grid scores from the previous table,
    * Viterbi over the capped word set, frequency-weighted usage counts,
    * then the M-step (used pieces re-counted, unused chars kept at 0,
    * unused multi-char pieces pruned).
    */
  private def emRound(r: Int): String = {
    val v = viterbiCtes(s"r$r", "wv", s"sc$r", MaxWord)
    s"""tot$r AS (
       |  SELECT greatest(CAST(sum(cnt) AS BIGINT), 1) AS tt
       |  FROM t${r - 1}),
       |sc$r AS MATERIALIZED (
       |  SELECT p, CAST(floor((ln(CAST(cnt AS DOUBLE))
       |    - ln(CAST((SELECT tt FROM tot$r) AS DOUBLE)))
       |    * 1000000.0 + 0.5) AS BIGINT) AS s
       |  FROM t${r - 1} WHERE cnt > 0),
       |$v,
       |used$r AS MATERIALIZED (
       |  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM r${r}pieces JOIN wv USING (w) GROUP BY p),
       |t$r AS MATERIALIZED (
       |  SELECT t.p,
       |    CASE WHEN u.cnt IS NOT NULL THEN u.cnt ELSE 0 END AS cnt
       |  FROM t${r - 1} t LEFT JOIN used$r u ON u.p = t.p
       |  WHERE u.cnt IS NOT NULL OR len(t.p) = 1)""".stripMargin
  }

  /** Shared base + 3 EM rounds: word vocabulary, substring-occurrence
    * seeding (chars + top multi-char by (count desc, piece)), then
    * [[emRound]] ×3 producing the final table `t3`(p, cnt).
    */
  private def trainCtes: String =
    s"""w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w
       |        FROM documents WHERE text IS NOT NULL) t
       |  WHERE len(w) > 0 GROUP BY w),
       |wv AS MATERIALIZED (
       |  SELECT w, freq FROM w0 WHERE len(w) BETWEEN 1 AND $MaxWord),
       |occ AS MATERIALIZED (
       |  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, substr(w, CAST(st AS INT), CAST(ln AS INT)) AS p
       |    FROM wv,
       |      unnest(range(1, len(w) + 1)) u(st),
       |      unnest(range(1, least($MaxPiece, len(w) - st + 1) + 1)) v(ln)
       |  ) t GROUP BY p),
       |chars AS MATERIALIZED (SELECT p, cnt FROM occ WHERE len(p) = 1),
       |nchars AS (SELECT count(*) AS c FROM chars),
       |multi AS MATERIALIZED (
       |  SELECT p, cnt FROM (
       |    SELECT p, cnt, row_number() OVER (ORDER BY cnt DESC, p) AS rn
       |    FROM occ WHERE len(p) > 1) t
       |  WHERE rn <= 512 - (SELECT c FROM nchars)),
       |t0 AS MATERIALIZED (
       |  SELECT p, cnt FROM chars UNION ALL SELECT p, cnt FROM multi),
       |${emRound(1)},
       |${emRound(2)},
       |${emRound(3)}""".stripMargin

  val oracles: Map[String, String] = Map(
    "t_unigram_train" ->
      s"""WITH $trainCtes
         |SELECT p AS piece, CAST(cnt AS BIGINT) AS cnt FROM t3
         |ORDER BY cnt DESC, p LIMIT 50""".stripMargin,
    // one more (score → DP → walk) pass under t3, over the FULL
    // distinct-word set (encode does not cap word length), joined back
    // to per-doc word occurrences
    "t_unigram_encode" ->
      s"""WITH $trainCtes,
         |tot4 AS (
         |  SELECT greatest(CAST(sum(cnt) AS BIGINT), 1) AS tt FROM t3),
         |sc4 AS MATERIALIZED (
         |  SELECT p, CAST(floor((ln(CAST(cnt AS DOUBLE))
         |    - ln(CAST((SELECT tt FROM tot4) AS DOUBLE)))
         |    * 1000000.0 + 0.5) AS BIGINT) AS s
         |  FROM t3 WHERE cnt > 0),
         |dw AS MATERIALIZED (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE text IS NOT NULL) t
         |  WHERE len(w) > 0),
         |wall AS MATERIALIZED (SELECT DISTINCT w FROM dw),
         |${viterbiCtes("e", "wall", "sc4", MaxEncodeWord)},
         |ns AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n
         |  FROM epieces GROUP BY w)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n) AS BIGINT) AS n_pieces
         |FROM dw JOIN ns USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
