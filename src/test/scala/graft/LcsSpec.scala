package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LcsLength

/** The custom LCS Expression against an independent reference recursion,
  * plus the ROUGE-L registry query's arithmetic invariants.
  */
class LcsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Textbook exponential recursion with memoization — deliberately a
    * DIFFERENT formulation from the Expression's two-row DP.
    */
  private def refLcs(a: Seq[String], b: Seq[String]): Int = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def go(i: Int, j: Int): Int =
      if (i == 0 || j == 0) 0
      else memo.getOrElseUpdate((i, j),
        if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
        else math.max(go(i - 1, j), go(i, j - 1)))
    go(a.length, b.length)
  }

  private def viaExpr(a: Seq[String], b: Seq[String]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(LcsLength.lcs_length(col("a"), col("b"))).head().getInt(0)

  test("expression equals the reference recursion on hand cases") {
    val cases = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "b", "c"), Seq("c", "b", "a")),
      (Seq("x", "y"), Seq("y", "x")),
      (Seq("the", "the", "the"), Seq("the", "the")),
      (Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")),
      (Seq("q", "q", "w", "q"), Seq("w", "q", "q", "q")))
    for ((a, b) <- cases) {
      assert(viaExpr(a, b) == refLcs(a, b), s"case ($a, $b)")
      assert(viaExpr(b, a) == refLcs(b, a), s"case ($b, $a)")
    }
  }

  test("expression equals the reference on deterministic pseudo-random arrays") {
    // small vocab forces repeats (the DP's hard case); xxhash-free
    // deterministic generation so the spec never flakes
    def gen(seed: Int, n: Int): Seq[String] =
      (0 until n).map(i => "t" + (((seed * 31 + i) * 2654435761L >>> 7) % 5))
    val arrays = for {
      s <- 1 to 6; n <- Seq(0, 1, 3, 8, 17)
    } yield gen(s * 7 + n, n)
    for (a <- arrays; b <- arrays)
      assert(viaExpr(a, b) == refLcs(a, b),
        s"mismatch on ${a.take(5)}... vs ${b.take(5)}...")
  }

  test("null arrays yield null; null elements never match") {
    val n = Seq((null.asInstanceOf[Seq[String]], Seq("a")))
      .toDF("a", "b").select(LcsLength.lcs_length(col("a"), col("b")))
      .head()
    assert(n.isNullAt(0))
    val withNullElems = Seq((Seq[String]("a", null, "b"),
        Seq[String](null, "a", "b")))
      .toDF("a", "b").select(LcsLength.lcs_length(col("a"), col("b")))
      .head().getInt(0)
    assert(withNullElems == 2, "null elements must not pair, a/b must")
  }

  test("type error is caught at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b")
        .select(LcsLength.lcs_length(col("a"), col("b"))).collect()
    }
  }

  test("d_lcs_verify separates same-order dups from shuffled-block dups") {
    // Two planted pairs, both over the trigram-Jaccard 0.8 bar:
    //  - (1, 2): identical text → lcs_micro = 1e6
    //  - (3, 4): the SAME two 30-token blocks in swapped order — trigram
    //    overlap stays high (only the junction trigrams differ) but the
    //    token LCS collapses to one block
    val blockX = (1 to 30).map(i => s"x$i").mkString(" ")
    val blockY = (1 to 30).map(i => s"y$i").mkString(" ")
    val filler = (1 to 40).map(i => s"f$i").mkString(" ")
    val rows = Seq(
      (1L, s"$blockX $blockY"), (2L, s"$blockX $blockY"),
      (3L, s"$blockX $blockY"), (4L, s"$blockY $blockX"),
      (5L, filler))
    val dir = java.nio.file.Files.createTempDirectory("lcsver").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d_lcs_verify")(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Long]("lcs_micro")).toMap
    assert(got((1L, 2L)) == 1000000L)
    // doc 3/4 prefixes are 60 tokens; the swapped pair keeps one 30-token
    // block plus nothing contiguous across the junction → ratio ≈ 1/2
    assert(got((3L, 4L)) <= 520000L && got((3L, 4L)) >= 480000L,
      s"shuffled-block pair not separated: ${got((3L, 4L))}")
    // same-order identical pair (3 with 1/2's text) also present & high
    assert(got.keySet.contains((1L, 3L)) && got((1L, 3L)) == 1000000L)
  }

  test("a_rouge_l fixture invariants: bounds, harmonic-mean order, determinism") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("a_rouge_l")(spark, d).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (cl, rl, lcs) = (r.getAs[Long]("cand_len"),
        r.getAs[Long]("ref_len"), r.getAs[Long]("lcs"))
      val (p, rc, f) = (r.getAs[Long]("p_micro"),
        r.getAs[Long]("r_micro"), r.getAs[Long]("f_micro"))
      assert(lcs <= math.min(cl, rl) && lcs >= 0)
      // both sides drop ~1/16 from the SAME 40-token base: the surviving
      // intersection is a common subsequence, so lcs is well above zero
      // on real prose
      assert(cl == 0 || lcs > 0, s"pair ${r.get(0)}: zero lcs at cand_len=$cl")
      assert(p <= 1000000L && rc <= 1000000L)
      // the harmonic mean sits between min and max; f = floor(H), and
      // H >= min with min an integer keeps the floor above it too
      assert(f <= math.max(p, rc))
      if (p > 0 && rc > 0) assert(f >= math.min(p, rc) && f > 0)
    }
    val again = SparkEntry.queries("a_rouge_l")(spark, d).collect()
    assert(rows.toSeq == again.toSeq)
  }
}
