package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusOps

/** DoReMi-style reweighting: a single full-sample round must match an
  * independently-coded in-memory reference exactly (uniform start ⇒
  * every rate saturates at 1.0, so the hash sampler is out of the
  * picture and the LM + multiplicative-weights math is isolated);
  * multi-round runs are pinned by invariants — mixture sums to one,
  * the badly-modeled domain gains weight, a symmetric corpus stays
  * uniform, and the loop is deterministic.
  */
class DoremiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference twin of [[CorpusOps.bigramCrossEntropyAgainst]]. */
  private def refCe(target: Seq[(Long, String)],
      docs: Seq[(Long, String)]): Map[Long, Double] = {
    def bigr(s: String): Seq[(String, String)] = {
      val t = s.split(" ").toSeq
      t.zip(t.drop(1)).map { case (a, b) => (a, a + " " + b) }
    }
    val c1 = target.flatMap(_._2.split(" ").toSeq)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c2 = target.flatMap(x => bigr(x._2))
      .groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val vsz = c1.size.toLong
    docs.flatMap { case (id, txt) =>
      val bs = bigr(txt)
      if (bs.isEmpty) None
      else {
        val logs = bs.map { case (w1, b) =>
          -math.log((c2.getOrElse(b, 0L) + 1.0) /
            (c1.getOrElse(w1, 0L) + vsz)) / math.log(2.0) }
        Some(id -> round4(logs.sum / logs.size))
      }
    }.toMap
  }

  // three domains; "hard" uses words the others never produce, so the
  // pooled LM models it worst and DoReMi must boost it
  private val corpus = Seq(
    (1L, "the cat sat on the mat", "easy"),
    (2L, "the cat sat on the rug", "easy"),
    (3L, "the dog sat on the mat", "mid"),
    (4L, "the dog ran to the rug", "mid"),
    (5L, "zx qv wk jj pf zx qv", "hard"),
    (6L, "qv zx pf wk jj pf wk", "hard"))

  test("one full-sample round matches the in-memory reference exactly") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val got = CorpusOps.doremiWeights(docs, rounds = 1, eta = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // reference: uniform start, full sample, one multiplicative update
    val pairs = corpus.map(x => (x._1, x._2))
    val ce = refCe(pairs, pairs)
    val byDom = corpus.groupBy(_._3).map { case (dm, xs) =>
      val cs = xs.map(x => ce(x._1))
      dm -> cs.sum / cs.size
    }
    val domains = byDom.keys.toSeq.sorted
    val base = domains.map(byDom).sum / domains.size
    val boosted = domains.map(d =>
      d -> (1.0 / domains.size) * math.exp(0.5 * (byDom(d) - base)))
    val z = boosted.map(_._2).sum
    val want = boosted.map { case (d, v) =>
      d -> BigDecimal(v / z).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (d, v) =>
      assert(math.abs(v - want(d)) <= 1e-6, s"$d: got $v want ${want(d)}")
    }
  }

  test("one round boosts the badly-modeled domain; three rounds stay a " +
      "valid deterministic mixture (the feedback loop EQUILIBRATES — " +
      "once boosted, a domain dominates the sample, models itself, and " +
      "stops looking hard, which is the group-DRO intent)") {
    val docs = corpus.toDF("doc_id", "text", "source")
    // which domain round 1 boosts is pinned EXACTLY by the reference
    // test above (add-one smoothing penalizes frequent contexts, so
    // "hard vocabulary" is not automatically "high CE" — the reference
    // is the truth, not intuition); here: the multi-round loop
    val run1 = CorpusOps.doremiWeights(docs, rounds = 3, eta = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val run2 = CorpusOps.doremiWeights(docs, rounds = 3, eta = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run1 == run2, "reweighting must be deterministic")
    assert(math.abs(run1.values.sum - 1.0) < 1e-4)
    assert(run1.values.forall(v => v > 0.1 && v < 0.9),
      s"no domain should collapse or take over: $run1")
  }

  test("a symmetric corpus stays exactly uniform") {
    val sym = Seq(
      (1L, "aa bb cc dd", "s1"), (2L, "aa bb cc dd", "s2"),
      (3L, "aa bb cc dd", "s3")).toDF("doc_id", "text", "source")
    val got = CorpusOps.doremiWeights(sym).collect()
      .map(r => r.getDouble(1))
    assert(got.forall(v => math.abs(v - 1.0 / 3) <= 1e-6))
  }

  test("registered query: weights over the real fixture sum to one") {
    val got = SparkEntry.queries("p_doremi_weights")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_.getDouble(1)).sum - 1.0) < 1e-4)
  }
}
