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
  * non-overlapping, the classic BPE application order. The base symbol
  * state is persisted ONCE and each round's vocabulary view composes
  * the accepted merges as a fold-chain expression over it (the
  * [[encode]] shape) — r16 replaced the earlier per-round eager
  * localCheckpoint, whose materialization job per round dominated the
  * trainer's wall at fixture scale; the fold's |vocab|·|merges| CPU is
  * the fixed cost class encode already pays.
  *
  * Oracle-backed since round 10 (the doremi unrolled-CTE discipline):
  * the DuckDB twin replays the training loop one merge per round —
  * weighted pair count, argmax (count desc, pair lexicographic), and
  * the greedy non-overlapping merge application expressed as an
  * island-parity window (in every maximal run of consecutive matching
  * positions, greedy left-to-right selects exactly the odd ranks) —
  * and the engine's BATCHED rounds are provably sequential-equivalent
  * (see [[learnMerges]]), so the two meet on the identical merge
  * table. BpeSpec additionally pins the result against an independent
  * in-memory sequential reference.
  */
object Bpe {
  type Q = (SparkSession, String) => DataFrame

  /** Binary string order for driver-side tie-breaks: unsigned UTF-8
    * byte comparison — the order Spark's UTF8String comparisons (and
    * DuckDB varchar ORDER BY) use. `String.compareTo` is UTF-16
    * code-unit order, which diverges on supplementary characters; the
    * driver fast paths must rank pair/piece literals exactly as the
    * distributed argmax would.
    */
  private[pipeline] object Utf8Order extends Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Driver fast-path gate shared by the three tokenizer trainers: a
    * vocabulary at or under this many distinct words is collected once
    * and the merge/EM loop runs locally (the [[GraphRank.pageRank]] /
    * [[Dedup.dupClusters]] size-gate rule applied to trainer loops —
    * every statistic the loops compute is vocabulary-sized by design,
    * so each driver round was paying multiple whole Spark jobs of pure
    * scheduling/planning overhead for alphabet-bounded arithmetic).
    * 2²⁰ rows ≈ tens of MB of (word, freq) — the broadcast size class.
    * Above the gate the distributed rounds run unchanged.
    */
  private[pipeline] def driverMaxVocab(spark: SparkSession): Int =
    math.min(spark.conf.getOption("graft.tokenizer.driverMaxVocab")
      .map(_.toLong).getOrElse(1L << 20), (Int.MaxValue - 2).toLong).toInt

  /** Collect `vocab0` (w, freq) when it is at or under `gate` rows;
    * None when it exceeds the gate (one truncated collect wasted — the
    * fallback is the rare case, and at real scale the gate conf is an
    * explicit dial). Null words are dropped: the distributed pair
    * counts ignore them (null symbol arrays explode to nothing).
    */
  private[pipeline] def collectVocab(vocab0: DataFrame,
      gate: Int): Option[Array[(String, Long)]] = {
    import org.apache.spark.sql.functions.col
    val rows = vocab0
      .select(col("w").cast("string"), col("freq").cast("long"))
      .limit(gate + 1).collect()
    if (rows.length > gate) None
    else Some(rows.iterator.filter(!_.isNullAt(0))
      .map(r => (r.getString(0), r.getLong(1))).toArray)
  }

  /** The sequential trainer on the collected vocabulary — the same
    * greedy algorithm as the distributed rounds (BpeSpec's independent
    * reference, promoted): per rank one frequency-weighted adjacent
    * pair count, argmax (count desc, then pair in binary UTF-8 order —
    * the distributed tie-break), then the greedy non-overlapping merge
    * application. Identical output by the [[learnMerges]] batching
    * proof run at batch size 1.
    */
  private def learnMergesLocal(vocab: Array[(String, Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    var syms: Map[Vector[String], Long] = vocab.iterator
      .map { case (w, f) => (w.split("").toVector, f) }
      .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= nMerges) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((s, f) <- syms) {
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) return out.toSeq
      var bA: String = null; var bB: String = null; var bC = 0L
      for (((a, b), c) <- counts) {
        val better = bA == null || c > bC || (c == bC && {
          val ca = Utf8Order.compare(a, bA)
          ca < 0 || (ca == 0 && Utf8Order.compare(b, bB) < 0)
        })
        if (better) { bA = a; bB = b; bC = c }
      }
      out += ((rank, bA, bB, bC))
      val (a, b) = (bA, bB)
      def apply1(s: Vector[String]): Vector[String] = {
        val r = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            r += (a + b); i += 2
          } else { r += s(i); i += 1 }
        }
        r.result()
      }
      syms = syms.toSeq.groupMapReduce { case (s, _) => apply1(s) }(_._2)(_ + _)
      rank += 1
    }
    out.toSeq
  }

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
    *
    * BATCHED rounds: each driver round costs a full Spark job (pair
    * count + argmax), so instead of one merge per round the round
    * accepts a PROVABLY-SEQUENTIAL-EQUIVALENT batch from one sorted
    * top-(k+1) collect. The batch is the maximal prefix of the sorted
    * pair list that is mutually symbol-disjoint, truncated to pairs
    * whose count strictly exceeds the first non-accepted pair's count.
    * Why that reproduces the one-at-a-time table exactly:
    *
    *  - a pair sharing no symbol with any earlier accepted pair (where
    *    "symbols" includes the merged concatenation — merging creates
    *    instances of that string, which can feed pre-existing pairs
    *    that mention it) has its count untouched by those merges, so
    *    its recorded count IS its count at its own sequential round;
    *  - pairs CREATED by an accepted merge (x·ab / ab·y / ab·ab) are
    *    count-bounded by the old pairs overlapping the merge (x·a,
    *    b·y, b·a), all of which rank below the accepted prefix — so
    *    the strict `cnt > cNext` bound guarantees no new pair can
    *    outrank (or tie, which lexicographic tie-break could flip) a
    *    later accepted pair.
    *
    * Worst case (every top pair overlapping) the batch is 1 — the old
    * behavior; near-dup-free prose typically accepts 3-8 per round
    * (measured 10 merges in 3 rounds on the fixture corpus).
    */
  def learnMerges(vocab0: DataFrame, nMerges: Int): Seq[(Int, String,
      String, Long)] = {
    // Size-gated driver fast path (r17): the whole merge loop is
    // vocabulary-sized arithmetic, so under the gate ONE collect
    // replaces ~a Spark job per batch round (pair count + argmax each
    // round, plus the persisted base materialization). Sequential
    // application is output-identical to the batched rounds by the
    // batching proof below (the batch is constructed to reproduce the
    // one-at-a-time table); BpeSpec pins both paths to the same
    // reference. Above the gate the distributed rounds run unchanged.
    collectVocab(vocab0, driverMaxVocab(vocab0.sparkSession)) match {
      case Some(v) => return learnMergesLocal(v, nMerges)
      case None => ()
    }
    // ONE persisted base state; each round folds the accepted merges so
    // far as a composed expression over it (the [[encode]] shape) —
    // r16: the per-round eager localCheckpoint materialization cost a
    // full vocabulary job + AQE stages per round for a frame that the
    // next round's pair count can fold through in-stream; the re-applied
    // fold is the fixed |vocab|·|merges| CPU class encode already pays.
    val base = vocab0
      .select(col("freq"), split(col("w"), "").as("sym"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    while (merges.size < nMerges) {
      val batchCap = math.min(nMerges - merges.size, 16)
      val symNow = graft.functions.SubwordFold.subword_fold(col("sym"),
        merges.toSeq.map { case (_, a, b, _) => (a, b, a + b) })
      val vocab = base.select(col("freq"), symNow.as("sym"))
      val pairs = vocab.select(col("freq"), explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      // top-(cap+1) — a TakeOrderedAndProject of ≤ 17 rows, the same
      // driver-size class as a broadcast threshold; the +1 row is the
      // strict-bound sentinel (its count caps every pair outside the
      // prefix, collected or not, because the sort is global)
      val top = pairs
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchCap + 1).collect()
      if (top.isEmpty) {
        base.unpersist(); return merges.toSeq
      }
      // maximal mutually-disjoint prefix; S carries {a, b, a+b} per
      // accepted pair so later candidates reject both shared symbols
      // and merged-concat collisions
      val seen = scala.collection.mutable.Set.empty[String]
      val prefix = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      var i = 0
      var open = true
      while (open && i < math.min(batchCap, top.length)) {
        val (a, b, c) =
          (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
        if (seen.contains(a) || seen.contains(b)) open = false
        else { prefix += ((a, b, c)); seen ++= Seq(a, b, a + b); i += 1 }
      }
      // strict bound: count of the first non-accepted pair, or -inf
      // when the collect exhausted the whole pair table
      val cNext = if (i < top.length) top(i).getLong(2) else Long.MinValue
      val accepted = prefix.head +:
        prefix.tail.takeWhile { case (_, _, c) => c > cNext }
      accepted.foreach { case (a, b, c) =>
        merges += ((merges.size + 1, a, b, c))
      }
      // the accepted merges enter `merges`, so the NEXT round's symNow
      // fold applies them in rank order — exactly the sequential
      // application, composed instead of checkpointed
    }
    base.unpersist()
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
    // r17 (guide §4): the merge table applies as ONE native codegen
    // expression instead of a |merges|-deep fold of interpreted
    // ArrayAggregate HOFs — identical greedy non-overlapping semantics
    // (SubwordFoldSpec pins the two against each other on the fixture
    // vocabulary), one imperative pass per merge, zero per-element
    // array reallocation.
    val sym = graft.functions.SubwordFold.subword_fold(
      split(col("w"), ""),
      merges.sortBy(_._1).map { case (_, a, b, _) => (a, b, a + b) })
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
    // encode the same corpus with them. The oracle rides the SAME
    // unrolled training replay as t_bpe_merges: the round-10 vocabulary
    // IS every word's encoding (training folds each word through the
    // merges in rank order — exactly what encode() does), so n_sub is
    // just len(sym) of the final state
    "t_bpe_encode" -> { (s, d) =>
      val docs = Tables.spread(Tables.documents(s, d))
      val merges = learnMerges(vocabulary(docs), 10)
      encode(docs, merges).orderBy("doc_id")
    })

  /** One unrolled training round for the DuckDB twin: pair counts over
    * the previous vocabulary state, a 1-row argmax (count desc, pair
    * lexicographic — the engine's tie-break), then the greedy
    * non-overlapping merge application. Greedy-left-to-right on a
    * single (a, b) within one scan never cascades (the merged symbol
    * a·b can't equal a), so it selects, in every maximal run of
    * CONSECUTIVE matching positions, exactly the 1st, 3rd, … — the
    * island-parity rule the `sel` CTE implements with two windows.
    * Rebuild drops positions whose predecessor was selected (they were
    * consumed) and rewrites selected positions to the merged symbol.
    */
  private def bpeRound(r: Int): String =
    s"""p$r AS MATERIALIZED (
       |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, sym[i] AS a, sym[i + 1] AS b
       |    FROM v${r - 1}, unnest(range(1, len(sym))) u(i)) t
       |  GROUP BY 1, 2),
       |m$r AS MATERIALIZED (
       |  SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
       |pos$r AS MATERIALIZED (
       |  SELECT w, freq, i, sym[i] AS s,
       |    coalesce(sym[i] = (SELECT a FROM m$r)
       |      AND sym[i + 1] = (SELECT b FROM m$r), FALSE) AS m
       |  FROM v${r - 1}, unnest(range(1, len(sym) + 1)) u(i)),
       |sel$r AS MATERIALIZED (
       |  SELECT w, i FROM (
       |    SELECT w, i,
       |      row_number() OVER (PARTITION BY w, g ORDER BY i) AS rn
       |    FROM (
       |      SELECT w, i,
       |        i - row_number() OVER (PARTITION BY w ORDER BY i) AS g
       |      FROM pos$r WHERE m))
       |  WHERE rn % 2 = 1),
       |v$r AS MATERIALIZED (
       |  SELECT p.w, min(p.freq) AS freq,
       |    list(CASE WHEN s.i IS NOT NULL
       |      THEN (SELECT a FROM m$r) || (SELECT b FROM m$r)
       |      ELSE p.s END ORDER BY p.i) AS sym
       |  FROM pos$r p
       |  LEFT JOIN sel$r s ON s.w = p.w AND s.i = p.i
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM sel$r s2 WHERE s2.w = p.w AND s2.i = p.i - 1)
       |  GROUP BY p.w)""".stripMargin

  /** The shared 10-round replay: initial state = per-word character
    * lists over the nonempty-word vocabulary, then [[bpeRound]] ×10.
    */
  private def bpeTrainCtes(n: Int): String =
    s"""v0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |    list_transform(range(1, len(w) + 1), i -> w[i]) AS sym
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w
       |        FROM documents WHERE text IS NOT NULL) t
       |  WHERE len(w) > 0
       |  GROUP BY w),
       |""".stripMargin +
      (1 to n).map(bpeRound).mkString(",\n")

  val oracles: Map[String, String] = Map(
    "t_bpe_merges" -> {
      val union = (1 to 10).map(r =>
        s"""SELECT CAST($r AS INTEGER) AS rank, a AS "left",
           |  b AS "right", cnt AS pair_count FROM m$r""".stripMargin)
        .mkString("\n  UNION ALL\n  ")
      s"""WITH ${bpeTrainCtes(10)}
         |SELECT * FROM (
         |  $union)
         |ORDER BY rank""".stripMargin
    },
    "t_bpe_encode" ->
      s"""WITH ${bpeTrainCtes(10)},
         |enc AS MATERIALIZED (
         |  SELECT w, CAST(len(sym) AS BIGINT) AS n_sub FROM v10),
         |dw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_subwords
         |FROM (SELECT * FROM dw WHERE len(w) > 0) JOIN enc USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
