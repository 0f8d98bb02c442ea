package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Bpe

/** BPE merge learning against an independent sequential reference: the
  * same greedy algorithm written as plain Scala collections over the
  * collected vocabulary, plus hand fixtures for the merge-application
  * edge cases (overlap, cascade, ties).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Sequential reference: classic BPE on a (word → freq) map. */
  private def referenceMerges(vocab: Map[String, Long],
      n: Int): Seq[(Int, String, String, Long)] = {
    var syms: Map[Vector[String], Long] = vocab.map { case (w, f) =>
      w.split("").toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (rank <- 1 to n) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) =
          counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) return out.toSeq
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), cnt) => (-cnt, x, y) }.head
      out += ((rank, a, b, c))
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
      syms = syms.groupMapReduce { case (s, _) => apply1(s) }(_._2)(_ + _)
    }
    out.toSeq
  }

  test("applyMerge: greedy non-overlapping, cascade-safe") {
    def run(word: String, a: String, b: String): Seq[String] =
      Seq(word).toDF("w")
        .select(Bpe.applyMerge(split(col("w"), ""), a, b))
        .head().getSeq[String](0)
    assert(run("hello", "l", "l") == Seq("h", "e", "ll", "o"))
    assert(run("llll", "l", "l") == Seq("ll", "ll"))
    assert(run("lllll", "l", "l") == Seq("ll", "ll", "l"))
    assert(run("ab", "a", "b") == Seq("ab"))
    assert(run("xyz", "a", "b") == Seq("x", "y", "z"))
  }

  test("applyMerge equals the sequential single-merge on random words " +
      "(property)") {
    def seqApply(s: Vector[String], a: String, b: String): Vector[String] = {
      val r = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          r += (a + b); i += 2
        } else { r += s(i); i += 1 }
      }
      r.result()
    }
    // seeded (deterministic) random words over a 3-char alphabet — small
    // alphabet makes pair hits and overlap runs dense
    val rnd = new scala.util.Random(42)
    val abc = Vector("x", "y", "z")
    val cases = (1 to 60).map { _ =>
      val w = Vector.fill(1 + rnd.nextInt(12))(abc(rnd.nextInt(3)))
        .mkString
      (w, abc(rnd.nextInt(3)), abc(rnd.nextInt(3)))
    }
    cases.foreach { case (w, a, b) =>
      val out = Seq(w).toDF("w")
        .select(Bpe.applyMerge(split(col("w"), ""), a, b))
        .head().getSeq[String](0).toVector
      val want = seqApply(w.split("").toVector, a, b)
      assert(out == want, s"word=$w merge=($a,$b): $out != $want")
    }
  }

  test("distributed merge table equals the sequential reference " +
      "(hand vocabulary with ties)") {
    val vocab = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val got = Bpe.learnMerges(vocab.toDF("w", "freq"), 8)
    val want = referenceMerges(vocab.toMap, 8)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("encode equals the sequential reference encode (sf0.001 corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocabDf = Bpe.vocabulary(docs)
    val merges = Bpe.learnMerges(vocabDf, 10)
    // sequential reference: apply each merge rank in order per word
    def seqEncode(w: String): Int = {
      var s = w.split("").toVector
      for ((_, a, b, _) <- merges.sortBy(_._1)) {
        val r = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            r += (a + b); i += 2
          } else { r += s(i); i += 1 }
        }
        s = r.result()
      }
      s.length
    }
    val want = docs.select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1))
      .map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), ws.length.toLong, ws.map(seqEncode(_).toLong).sum)
      }.filter(_._2 > 0).sortBy(_._1).toSeq
    val got = Bpe.encode(docs, merges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // compression invariant: 10 merges can only shrink or keep the
    // token stream vs raw characters — and on this corpus must shrink
    val totalSub = want.map(_._3).sum
    val totalChars = docs.select(sum(length(regexp_replace(col("text"),
      " ", "")))).first().getLong(0)
    assert(totalSub < totalChars,
      s"subwords $totalSub not below chars $totalChars — merges never fired")
  }

  test("distributed merge table equals the sequential reference " +
      "(sf0.001 corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocabDf = Bpe.vocabulary(docs)
    val got = Bpe.learnMerges(vocabDf, 10)
    val vocab = vocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceMerges(vocab, 10)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("driver fast path equals the distributed rounds (gate forced)") {
    // r17: learnMerges collects the vocabulary and trains locally when
    // it fits the graft.tokenizer.driverMaxVocab gate; forcing the gate
    // to 0 exercises the distributed rounds on the same input
    val vocab = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("lowest", 1L), ("wide", 4L))
    val df = vocab.toDF("w", "freq")
    val local = Bpe.learnMerges(df, 8)
    spark.conf.set("graft.tokenizer.driverMaxVocab", "0")
    try {
      val dist = Bpe.learnMerges(df, 8)
      assert(local == dist, s"\nlocal $local\ndist  $dist")
    } finally spark.conf.unset("graft.tokenizer.driverMaxVocab")
  }

}
