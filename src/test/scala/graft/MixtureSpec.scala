package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{TextAnalysis, TrainingSet}

/** Operator-level invariants of the round-5 corpus-assembly additions
  * that the DuckDB hash-match can't pin by itself: budget respect and
  * greedy-fill shape for the token mixture, split determinism and
  * disjointness for the hash split, and the classifier's integer/label
  * contract.
  */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def docs = Seq(
    // (doc_id, source, text) — token counts 4, 3, 2, 1 per doc below
    (1L, "src0", "a b c d"), (2L, "src0", "e f g"),
    (3L, "src0", "h i"), (4L, "src0", "j"),
    (10L, "src1", "k l m n"), (11L, "src1", "o p q"),
    (12L, "src2", "r s t u")
  ).toDF("doc_id", "source", "text")
    .withColumn("lang", lit("en"))

  test("tokenMixture: every source stays within budget + one crossing doc") {
    // src0 budget 4 (base), src1 budget 6 (base + 1*base/2), src2 budget 8
    val out = TrainingSet.tokenMixture(docs, 4L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val bySource = out.groupBy(_._2)
    // greedy fill: tokens BEFORE each kept doc are < budget, so the total
    // overshoot is bounded by the last doc's length — verify per source
    val budgets = Map("src0" -> 4L, "src1" -> 6L, "src2" -> 8L)
    bySource.foreach { case (src, rows) =>
      val maxCum = rows.map(_._4).max
      val lastTok = rows.maxBy(_._4)._3
      assert(maxCum - lastTok < budgets(src),
        s"$src: pre-crossing mass ${maxCum - lastTok} >= ${budgets(src)}")
    }
    // src2 has 4 tokens total against budget 8: everything kept
    assert(bySource("src2").map(_._1).toSet == Set(12L))
  }

  test("tokenMixture selection is independent of input partitioning") {
    val a = TrainingSet.tokenMixture(docs.repartition(1), 4L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TrainingSet.tokenMixture(docs.repartition(7), 4L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("hashSplit: buckets are disjoint, exhaustive, and deterministic") {
    val ids = spark.range(0, 2000).select(col("id").as("doc_id"),
      lit("en").as("lang"), lit("x y z").as("text"))
    val out = TrainingSet.hashSplit(ids).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out.keySet == Set("train", "val", "test"))
    assert(out.values.sum == 2000L)
    // 90/5/5 split within a loose tolerance — the hash is uniform-ish,
    // not exactly proportional on 2k ids
    assert(out("train") > 1600L && out("val") < 250L && out("test") < 250L)
    // determinism: same ids → same counts on a different partitioning
    val again = TrainingSet.hashSplit(ids.repartition(13)).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(again == out)
  }

  test("weightedSample equals an independent driver recompute of the " +
      "Efraimidis-Spirakis keys, and favors heavier docs") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("p_weighted_sample")(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // independent recompute: same formula, plain Scala on collected rows
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.toSeq.map { case (id, _, w) =>
        val u = (((id * 2654435761L) % 4294967296L) + 1L).toDouble /
          4294967296.0
        (math.pow(u, 1.0 / w), id)
      }.sortBy { case (k, id) => (-k, id) }.take(20)
        .map { case (_, id) => (lang, id) }
    }.toSet
    assert(got == want)
    // weighting bites: the selected docs are heavier on average than the
    // stratum mean (deterministic on this fixture)
    val byLang = docs.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val sel = got.collect { case (l, id) if l == lang => id }
      val wOf = rows.map(r => r._1 -> r._3).toMap
      if (sel.size >= 10 && rows.size > 30) {
        val selAvg = sel.toSeq.map(wOf).sum.toDouble / sel.size
        val allAvg = rows.map(_._3).sum.toDouble / rows.size
        assert(selAvg > allAvg,
          s"$lang: selected avg weight $selAvg <= corpus avg $allAvg")
      }
    }
  }

  test("weightedSample rank-20/21 key gap is wide enough that the DuckDB " +
      "oracle cannot flake on pow ulps (boundary guard per stratum)") {
    // cross-engine pow differs by <=2 ulps (~4e-16 on keys in (0,1]);
    // demand 4 orders of magnitude of margin at every selection
    // boundary so a fixture regeneration that lands two keys close
    // together fails HERE, loudly, not as an oracle hash flake
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables.documents(spark, sf)
        .select("doc_id", "lang", "n_chars").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      docs.groupBy(_._2).foreach { case (lang, rows) =>
        val keys = rows.toSeq.map { case (id, _, w) =>
          val u = (((id * 2654435761L) % 4294967296L) + 1L).toDouble /
            4294967296.0
          math.pow(u, 1.0 / w)
        }.sorted(Ordering[Double].reverse)
        if (keys.size > 20) {
          val gap = keys(19) - keys(20)
          assert(gap > 1e-12,
            s"$sf $lang: rank-20/21 key gap $gap <= 1e-12 — " +
              "p_weighted_sample oracle is at ulp risk on this fixture")
        }
      }
    }
  }

  test("count-min estimates never undercount and respect the eps bound") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("t_cms_freq")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20)
    val n = graft.Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val maxOver = math.ceil(0.001 * n).toLong
    out.foreach { case (w, exact, est) =>
      assert(est >= exact, s"CMS undercounted '$w': $est < $exact")
      assert(est <= exact + maxOver,
        s"CMS overcount for '$w' beyond eps·N: $est > $exact + $maxOver")
    }
  }

  test("portable count-min: never undercounts, respects the width " +
      "bound, and the estimate is partition-independent") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("t_cms_portable")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20)
    val n = graft.Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    // eps = e / width = e / 65536; overcount ≤ eps·N w.h.p. — use the
    // deterministic hard bound instead: est ≤ exact + N (trivial) and
    // the probabilistic one as a fixture regression tripwire
    val maxOver = math.ceil(math.E / 65536.0 * n * 8).toLong.max(1L)
    out.foreach { case (w, exact, est) =>
      assert(est >= exact, s"portable CMS undercounted '$w': $est")
      assert(est <= exact + maxOver,
        s"portable CMS overcount for '$w': $est > $exact + $maxOver")
    }
    // rerunning yields identical rows (pure integer arithmetic, no
    // sketch object, no seed state)
    val again = SparkEntry.queries("t_cms_portable")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("hashClassifier: label matches the sign of the exact weight sum") {
    val d = Seq((1L, "alpha beta"), (2L, "gg"), (3L, "zz qq ww"))
      .toDF("doc_id", "text")
    val rows = d.select(col("doc_id"),
      TextAnalysis.hashClassifierWeightSum(col("text")).as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (_, ws) =>
      assert(ws >= -2000L && ws <= 2000L) // ≤2 tokens·1000 per doc here
    }
    // reference recompute of one word's weight: "gg" → feat = 2*31 +
    // g*7 + g = 62 + 103*8 = 886; bucket = 886*2654435761 % 2^20;
    // weight = bucket*40503 % 2001 - 1000
    val feat = 2L * 31 + 'g'.toLong * 7 + 'g'.toLong
    val bucket = (feat * 2654435761L) % 1048576L
    val w = (bucket * 40503L) % 2001L - 1000L
    assert(rows.find(_._1 == 2L).get._2 == w)
  }

  test("contrastive triplets: negative is a third doc, assignment is " +
      "partition-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      TrainingSet.contrastiveTriplets(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    val t = run(docs)
    assert(t.nonEmpty, "fixture near-dup pairs must yield triplets")
    t.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"negative $n collides in ($a, $p)")
    }
    // identical triplets from a different physical layout
    assert(run(docs.repartition(7)) == t)
  }

  test("contrastive triplets: a negative bucket that can only offer the " +
      "pair's own endpoints drops the triplet, not the invariant") {
    // one bucket (nb = 1): candidates are the 3 smallest ids overall.
    // With exactly the pair's docs in the corpus, no third doc exists —
    // the triplet must drop rather than emit a degenerate negative.
    val two = Seq((1L, "x y z w v u t s r q"), (2L, "x y z w v u t s r q"))
      .toDF("doc_id", "text")
    assert(TrainingSet.contrastiveTriplets(two, nb = 1).count() == 0)
    // add a third doc: the same pair now carries it as the negative
    val three = two.union(Seq((3L, "totally different words here now"))
      .toDF("doc_id", "text"))
    val t = TrainingSet.contrastiveTriplets(three, nb = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.toSeq == Seq((1L, 2L, 3L)), s"got ${t.toSeq}")
  }

  private def annealFixture = {
    import spark.implicits._
    // 12 docs, one source: 6 low-quality repeats (q low: all-same
    // tokens) and 6 high-quality (all-distinct tokens), 4-6 tokens each
    (0 until 12).map { i =>
      val text =
        if (i < 6) Seq.fill(4 + i % 3)("dup").mkString(" ")
        else (0 until (4 + i % 3)).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, "srcA", text)
    }.toDF("doc_id", "source", "text")
  }

  test("anneal: phase-1 is the per-source greedy hash-order fill with " +
      "the crossing doc kept; phase-2 full epochs are exact copies of " +
      "the quality-elite set and the remainder is its hash-order prefix") {
    val rows = TrainingSet.annealMix(annealFixture,
        b1 = 20L, b2 = 23L, topDiv = 6L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val p1 = rows.filter(_._2 == 1L).sortBy(_._4)
    // greedy fill: every proper prefix before the last doc is < b1,
    // and the fill stops exactly at the crossing doc
    val cums = p1.map(_._6).scanLeft(0L)(_ + _).tail
    assert(cums.init.forall(_ < 20L) && cums.last >= 20L,
      s"crossing-doc fill violated: $cums")
    // eligibility: top 12/6 = 2 docs by (q desc, doc_id) — the two
    // all-distinct 4-token docs (highest TTR·length mix), smallest ids
    // on ties: docs 6 and 9 (4 tokens, q equal) beat the 5/6-token ones
    // only if their q is higher — recompute the claim from the engine
    // by checking phase-2 doc sets directly
    val p2 = rows.filter(_._2 == 2L)
    val byEpoch = p2.groupBy(_._3).view.mapValues(
      _.map(x => (x._4, x._5)).toSet).toMap
    assert(byEpoch(0L).size == 2, s"elite set must hold 2 docs: $byEpoch")
    // all full epochs identical
    val e = p2.map(_._3).max
    (0L until e).foreach(ep => assert(byEpoch(ep) == byEpoch(0L),
      s"epoch $ep differs: $byEpoch"))
    // remainder epoch: hash-order prefix of the elite set (positions
    // are a 1..k prefix), crossing-doc convention
    val remPos = p2.filter(_._3 == e).map(_._4).sorted.toList
    assert(remPos == (1L to remPos.length.toLong).toList,
      s"not a prefix: $remPos")
    // budget law: e·t2 <= b2 (full epochs never overshoot)
    val t2 = byEpoch(0L).toSeq.map(_._2).sum
    assert(e * t2 <= 23L && (e + 1) * t2 > 23L, s"e=$e t2=$t2")
  }

  test("anneal: a budget cycling the elite set past the epoch cap " +
      "fails loud instead of looping") {
    val e = intercept[Exception] {
      TrainingSet.annealMix(annealFixture,
        b1 = 10L, b2 = 100000L, topDiv = 6L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("annealMix")))
  }
}
