package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BleuEval

/** BLEU sufficient statistics: the textbook clipping example, the
  * identity and disjoint boundaries, and n-gram windowing edge cases.
  */
class BleuSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def stats(cand: String, ref: String): Map[Int, (Long, Long,
      Long, Long, Long, Long)] = {
    val pairs = Seq((1L, cand.split(" ").toSeq.filter(_.nonEmpty),
      ref.split(" ").toSeq.filter(_.nonEmpty)))
      .toDF("pair_id", "cand", "ref")
    BleuEval.bleuStats(pairs).collect().map { r =>
      r.getAs[Long]("n").toInt ->
        ((r.getAs[Long]("cand_len"), r.getAs[Long]("ref_len"),
          r.getAs[Long]("len_ratio_micro"), r.getAs[Long]("matches"),
          r.getAs[Long]("total"), r.getAs[Long]("p_micro")))
    }.toMap
  }

  test("Papineni clipping: 'the the the…' vs 'the cat is on the mat'") {
    val s = stats("the the the the the the the",
      "the cat is on the mat")
    // p1 is CLIPPED at the reference count of "the" (2), not 7/7
    assert(s(1) == ((7L, 6L, 7000000L / 6L, 2L, 7L,
      2L * 1000000L / 7L)))
    // no candidate bigram appears in the reference
    assert(s(2)._4 == 0L && s(2)._5 == 6L && s(2)._6 == 0L)
  }

  test("identity: candidate == reference gives p_n = 1e6 for all n") {
    val s = stats("a b c d e", "a b c d e")
    (1 to 4).foreach { n =>
      assert(s(n)._6 == 1000000L, s"n=$n")
      assert(s(n)._5 == (5 - n + 1).toLong)
      assert(s(n)._3 == 1000000L)
    }
  }

  test("disjoint tokens: zero matches, totals intact") {
    val s = stats("x y z", "a b c")
    (1 to 3).foreach(n => assert(s(n)._4 == 0L && s(n)._6 == 0L))
  }

  test("candidate shorter than n: empty gram window, row still present") {
    val s = stats("a b", "a b")
    assert(s(3) == ((2L, 2L, 1000000L, 0L, 0L, 0L)))
    assert(s(4)._5 == 0L)
  }

  test("repeated gram clipping counts multiplicity, not distinct grams") {
    // cand has "a a" twice as a bigram ("a a a"), ref has it once
    val s = stats("a a a", "a a b")
    assert(s(2)._4 == 1L && s(2)._5 == 2L)
    // unigrams: cand a×3, ref a×2 → clipped 2 of 3
    assert(s(1)._4 == 2L && s(1)._5 == 3L)
  }

  private def chrf(cand: String, ref: String): Map[Int, (Long, Long,
      Long, Long, Long)] =
    BleuEval.chrfStats(Seq((1L, cand, ref)).toDF("pair_id", "cand", "ref"))
      .collect().map { r =>
        r.getAs[Long]("n").toInt ->
          ((r.getAs[Long]("matches"), r.getAs[Long]("cand_total"),
            r.getAs[Long]("ref_total"), r.getAs[Long]("p_micro"),
            r.getAs[Long]("r_micro")))
      }.toMap

  test("chrF identity: equal sides give p = r = 1e6 for n <= len") {
    val s = chrf("abcdef", "abcdef")
    (1 to 6).foreach { n =>
      assert(s(n)._2 == (6 - n + 1).toLong, s"n=$n")
      assert(s(n)._4 == 1000000L && s(n)._5 == 1000000L, s"n=$n")
    }
  }

  test("chrF clips by multiplicity and keeps both denominators") {
    // cand 'aaa': bigram 'aa' ×2; ref 'aab': 'aa' ×1 → clipped 1
    val s = chrf("aaa", "aab")
    assert(s(2) == ((1L, 2L, 2L, 500000L, 500000L)))
    // unigrams: cand a×3; ref a×2,b×1 → clipped 2; p=2/3, r=2/3
    assert(s(1) == ((2L, 3L, 3L, 666666L, 666666L)))
  }

  test("chrF precision/recall diverge with unequal lengths") {
    // cand 'ab' ⊂ ref 'abcd': p1 = 1, r1 = 2/4
    val s = chrf("ab", "abcd")
    assert(s(1) == ((2L, 2L, 4L, 1000000L, 500000L)))
    assert(s(2)._1 == 1L && s(2)._2 == 1L && s(2)._3 == 3L)
    // rows exist for n beyond the short side with zero totals
    assert(s(5) == ((0L, 0L, 0L, 0L, 0L)))
    assert(s(6)._3 == 0L)
  }

  test("a_chrf fixture: deterministic, complete, in-range") {
    val rows = SparkEntry.queries("a_chrf")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500 * 6)
    rows.foreach { r =>
      val (m, ct, rt) = (r.getAs[Long]("matches"),
        r.getAs[Long]("cand_total"), r.getAs[Long]("ref_total"))
      assert(m <= math.min(ct, rt), s"clip bound broken at ${r.get(0)}")
      assert(r.getAs[Long]("p_micro") <= 1000000L)
      assert(r.getAs[Long]("r_micro") <= 1000000L)
    }
  }

  test("corruptedCandidate is a deterministic subsequence") {
    val ref = (1 to 200).map(i => s"w$i")
    val df = Seq((42L, ref)).toDF("doc_id", "ref")
      .select(BleuEval.corruptedCandidate(col("doc_id"), col("ref"))
        .as("cand"))
    val c1 = df.head().getSeq[String](0)
    val c2 = df.head().getSeq[String](0)
    assert(c1 == c2)
    // a subsequence: order preserved, strictly from ref
    assert(c1.forall(ref.contains))
    val idx = c1.map(ref.indexOf(_))
    assert(idx == idx.sorted)
    // ~1/16 dropped — loose band
    assert(c1.length < 200 && c1.length > 150)
  }

  test("pass@k: engine rows equal the exact binomial estimator for " +
      "every observed c; edges and monotonicity hold") {
    def choose(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    def ref(c: Int, k: Int): Long =
      (BigInt(1000000) -
        choose(10 - c, k) * 1000000 / choose(10, k)).toLong
    val rows = SparkEntry.queries("a_pass_at_k")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val cs = rows.map(_.getAs[Long]("c").toInt).toSet
    // the per-problem rate draw must actually spread c around
    assert(cs.size >= 4, s"degenerate c distribution: $cs")
    for (r <- rows) {
      val c = r.getAs[Long]("c").toInt
      assert(c >= 0 && c <= 10)
      val (p1, p5, p10) = (r.getAs[Long]("pass1_micro"),
        r.getAs[Long]("pass5_micro"), r.getAs[Long]("pass10_micro"))
      // exact agreement with the C(n-c,k)/C(n,k) form: the telescoped
      // clamped product is the same rational, so the floors agree
      assert(p1 == ref(c, 1) && p5 == ref(c, 5) && p10 == ref(c, 10),
        s"c=$c: ($p1,$p5,$p10) vs (${ref(c, 1)},${ref(c, 5)},${ref(c, 10)})")
      // more draws can only help; any pass makes pass@10 certain
      assert(p1 <= p5 && p5 <= p10)
      if (c > 0) assert(p10 == 1000000L) else assert(p10 == 0L)
    }
  }

  test("distinct-n: hand fixture pins the unique/total ratios; " +
      "degenerate repetition collapses distinct-2") {
    val docs = Seq(
      (1L, "a b c d"),        // all unique: d1 = 1, d2 = 1
      (2L, "a a a a"),        // one type: d1 = 1/4; bigrams all 'a a'
      (3L, "a b a b"),        // d1 = 2/4; bigrams ab/ba/ab -> 2/3
      (4L, "solo"),           // no bigram window
      (5L, ""))               // empty after tokenization
      .toDF("doc_id", "text")
    val got = graft.pipeline.BleuEval.queries("a_distinct_n")
    // drive the same operator body over the hand corpus via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("dn").toString
    docs.withColumn("source", lit("s")).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = got(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows(1L) == ((4L, 4L, 1000000L, 3L, 1000000L)))
    assert(rows(2L) == ((4L, 1L, 250000L, 1L, 333333L)))
    assert(rows(3L) == ((4L, 2L, 500000L, 2L, 666666L)))
    assert(rows(4L) == ((1L, 1L, 1000000L, 0L, 0L)))
    assert(rows(5L) == ((0L, 0L, 0L, 0L, 0L)))
  }
}
