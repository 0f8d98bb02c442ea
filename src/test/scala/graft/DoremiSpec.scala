package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusOps

/** DoReMi-style reweighting on the integer micro grid: a single
  * full-sample round must match an independently-coded in-memory
  * reference exactly (the ceil-uniform start saturates every rate at
  * 1.0, so the hash sampler is out of the picture and the LM +
  * multiplicative-weights integer arithmetic is isolated); multi-round
  * runs are pinned by invariants — mixture sums to one, weights stay on
  * the grid, a symmetric corpus stays uniform, and the loop is
  * deterministic. Cross-engine equality of the full 3-round loop is the
  * `p_doremi_weights` oracle's job (unrolled DuckDB replay).
  */
class DoremiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Reference twin of the per-doc CE on the 1e-4 integer grid. */
  private def refCe4(target: Seq[(Long, String)],
      docs: Seq[(Long, String)]): Map[Long, Long] = {
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
        Some(id ->
          math.floor(logs.sum / logs.size * 10000 + 0.5).toLong)
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

  test("one full-sample round matches the in-memory integer reference " +
      "exactly (ceil-uniform start saturates the sampler)") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val got = CorpusOps.doremiWeights(docs, rounds = 1, eta = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference: ceil-uniform start, full sample, one integer update
    val pairs = corpus.map(x => (x._1, x._2))
    val ce4 = refCe4(pairs, pairs)
    val domains = corpus.map(_._3).distinct.sorted
    val ndom = domains.length.toLong
    val byDom = corpus.groupBy(_._3).map { case (dm, xs) =>
      val cs = xs.map(x => ce4(x._1))
      dm -> (cs.sum * 100L) / cs.length // 1e-6-grid domain mean
    }
    val baseU = domains.map(byDom).sum / ndom
    val w0 = (1000000L + ndom - 1L) / ndom
    val f = domains.map { d =>
      val x = math.min(2.0, math.max(-2.0,
        ((byDom(d) - baseU).toDouble * 0.5) / 1000000.0))
      d -> math.floor(math.exp(x) * 1000000.0 + 0.5).toLong
    }.toMap
    val boosted = domains.map(d => d -> w0 * f(d)).toMap
    val z = boosted.values.sum
    val want = domains.map(d => d -> boosted(d) * 1000000L / z).toMap
    assert(got.keySet == want.keySet)
    assert(got == want, s"got $got want $want")
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
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val run2 = CorpusOps.doremiWeights(docs, rounds = 3, eta = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(run1 == run2, "reweighting must be deterministic")
    assert(math.abs(run1.values.sum - 1.0) < 1e-4)
    assert(run1.values.forall(v => v > 0.1 && v < 0.9),
      s"no domain should collapse or take over: $run1")
  }

  test("weight_micro and weight agree on the 1e-6 grid") {
    val docs = corpus.toDF("doc_id", "text", "source")
    CorpusOps.doremiWeights(docs).collect().foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / 1000000.0)
    }
  }

  test("a symmetric corpus stays exactly uniform") {
    val sym = Seq(
      (1L, "aa bb cc dd", "s1"), (2L, "aa bb cc dd", "s2"),
      (3L, "aa bb cc dd", "s3")).toDF("doc_id", "text", "source")
    val got = CorpusOps.doremiWeights(sym).collect()
      .map(r => r.getDouble(2))
    assert(got.forall(v => math.abs(v - 1.0 / 3) <= 1e-6))
  }

  test("registered query: weights over the real fixture sum to one") {
    val got = SparkEntry.queries("p_doremi_weights")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }
}
