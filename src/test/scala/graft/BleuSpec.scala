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
}
