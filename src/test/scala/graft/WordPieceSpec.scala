package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.WordPiece

/** WordPiece trainer against an independent sequential reference (the
  * BpeSpec discipline): likelihood-scored argmax on the 1e-9 integer
  * grid, the `##` continuation convention, and the merged-name rule,
  * plus hand fixtures for the scoring and naming edge cases.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Sequential reference: WordPiece on a (word → freq) map — unigram
    * and pair counts per round, score = cnt·Grid / (ca·cb) integer
    * division, argmax by (score desc, cnt desc, pair lexicographic),
    * greedy non-overlapping application with `a + b.stripPrefix("##")`.
    */
  private def referenceMerges(vocab: Map[String, Long],
      n: Int): Seq[(Int, String, String, Long, Long)] = {
    def init(w: String): Vector[String] =
      w.split("").toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c else "##" + c
      }
    var syms: Map[Vector[String], Long] = vocab.map { case (w, f) =>
      init(w) -> f }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    for (rank <- 1 to n) {
      val uni = scala.collection.mutable.Map.empty[String, Long]
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((s, f) <- syms) {
        s.foreach(x => uni(x) = uni.getOrElse(x, 0L) + f)
        for (i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) =
            counts.getOrElse((s(i), s(i + 1)), 0L) + f
      }
      if (counts.isEmpty) return out.toSeq
      val scored = counts.toSeq.map { case ((a, b), c) =>
        (a, b, c, c * WordPiece.Grid / (uni(a) * uni(b)))
      }
      val (a, b, c, sc) = scored
        .sortBy { case (x, y, cnt, s) => (-s, -cnt, x, y) }.head
      out += ((rank, a, b, c, sc))
      val merged = a + b.stripPrefix("##")
      def apply1(s: Vector[String]): Vector[String] = {
        val r = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            r += merged; i += 2
          } else { r += s(i); i += 1 }
        }
        r.result()
      }
      syms = syms.groupMapReduce { case (s, _) => apply1(s) }(_._2)(_ + _)
    }
    out.toSeq
  }

  test("initialSymbols: first char plain, rest ##-prefixed") {
    val got = Seq("abc").toDF("w")
      .select(WordPiece.initialSymbols(col("w")))
      .head().getSeq[String](0)
    assert(got == Seq("a", "##b", "##c"))
    val one = Seq("x").toDF("w")
      .select(WordPiece.initialSymbols(col("w")))
      .head().getSeq[String](0)
    assert(one == Seq("x"))
  }

  test("applyMergeAs: merged name replaces the pair, non-overlapping") {
    def run(syms: Seq[String], a: String, b: String,
        m: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("sym")
        .select(WordPiece.applyMergeAs(col("sym"), a, b, m))
        .head().getSeq[String](0)
    assert(run(Seq("a", "##b", "##c"), "a", "##b", "ab") ==
      Seq("ab", "##c"))
    assert(run(Seq("##l", "##l", "##l", "##l", "##l"),
      "##l", "##l", "##ll") == Seq("##ll", "##ll", "##l"))
    assert(run(Seq("x", "##y"), "q", "##z", "qz") == Seq("x", "##y"))
  }

  test("likelihood scoring beats raw count: rare-symbol pair wins") {
    // "zq" appears 3× (z and ##q occur ONLY there: score 3G/9 = G/3);
    // the raw-count winner is (b, ##a) at count 8 but ##a is everywhere
    // (score 8G/(8·16) = G/16) — BPE would pick the count-8 pair,
    // WordPiece must pick (z, ##q).
    val vocab = Map("zq" -> 3L, "aaa" -> 4L, "ba" -> 8L)
    // reference cross-check of the hand argument
    val ref = referenceMerges(vocab, 1)
    assert(ref.head._2 == "z" && ref.head._3 == "##q")
    val got = WordPiece.learnMerges(
      vocab.toSeq.toDF("w", "freq"), 1)
    assert(got.head._2 == "z" && got.head._3 == "##q")
  }

  test("learnMerges equals the sequential reference on a prose corpus") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox was quick and the dog was lazy",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump",
      "the five boxing wizards jump quickly",
      "sphinx of black quartz judge my vow",
      "the jay pig fox zebra and my wolves quack")
    val words = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
    val vocab = words.groupBy(identity).map { case (w, g) =>
      w -> g.size.toLong }
    val ref = referenceMerges(vocab, 10)
    val got = WordPiece.learnMerges(
      vocab.toSeq.toDF("w", "freq"), 10)
    assert(got == ref)
  }

  test("learnMerges is partitioning-independent") {
    val vocab = Seq(("hello", 5L), ("help", 3L), ("hollow", 2L),
      ("lolly", 4L), ("pole", 1L))
    val one = WordPiece.learnMerges(
      vocab.toDF("w", "freq").coalesce(1), 6)
    val many = WordPiece.learnMerges(
      vocab.toDF("w", "freq").repartition(7), 6)
    assert(one == many)
    assert(one == referenceMerges(vocab.toMap, 6))
  }

  test("pair-table exhaustion stops early with the learned prefix") {
    // single 2-char word: exactly one merge possible
    val got = WordPiece.learnMerges(
      Seq(("ab", 4L)).toDF("w", "freq"), 10)
    assert(got.map(m => (m._1, m._2, m._3)) == Seq((1, "a", "##b")))
  }

  test("encode: the trained vocabulary state IS every word's encoding") {
    val docs = Seq((1L, "hello help hello"), (2L, "lolly pole"))
      .toDF("doc_id", "text")
    val vocab = Map("hello" -> 2L, "help" -> 1L, "lolly" -> 1L,
      "pole" -> 1L)
    val merges = WordPiece.learnMerges(vocab.toSeq.toDF("w", "freq"), 4)
    val got = WordPiece.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference: fold each word through the merges sequentially
    def foldWord(w: String): Int = {
      var s = w.split("").toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c else "##" + c }
      for ((_, a, b, _, _) <- merges.sortBy(_._1)) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            out += (a + b.stripPrefix("##")); i += 2
          } else { out += s(i); i += 1 }
        }
        s = out.result()
      }
      s.length
    }
    assert(got(1L) == ((3L, (2 * foldWord("hello") + foldWord("help"))
      .toLong)))
    assert(got(2L) == ((2L, (foldWord("lolly") + foldWord("pole"))
      .toLong)))
  }

  test("symbol-mass guard fails loud past the grid contract") {
    val e = intercept[IllegalArgumentException] {
      WordPiece.learnMerges(
        Seq(("ab", 2000000000L)).toDF("w", "freq"), 1)
    }
    assert(e.getMessage.contains("weighted symbols"))
  }

  test("driver fast path equals the distributed rounds (gate forced)") {
    // r17: same both-paths pin as BpeSpec — ties included (hello/help
    // share prefixes; aaa exercises overlap parity)
    val vocab = Seq(("hello", 5L), ("help", 3L), ("hollow", 2L),
      ("lolly", 4L), ("pole", 1L), ("aaa", 4L), ("zq", 3L))
    val df = vocab.toDF("w", "freq")
    val local = WordPiece.learnMerges(df, 8)
    spark.conf.set("graft.tokenizer.driverMaxVocab", "0")
    try {
      val dist = WordPiece.learnMerges(df, 8)
      assert(local == dist, s"\nlocal $local\ndist  $dist")
    } finally spark.conf.unset("graft.tokenizer.driverMaxVocab")
  }

}
