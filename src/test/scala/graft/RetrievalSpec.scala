package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CorpusOps, Retrieval}

/** Ranking semantics the oracle hash can't explain on its own: BM25
  * orders by term coverage and saturates on term spam, ubiquitous
  * terms carry ~zero idf, and temperature sampling hits its per-language
  * rates while actually flattening the mix.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("BM25: full-coverage doc outranks term spam; ubiquitous term " +
      "contributes ~zero") {
    val docs = Seq(
      (1L, "table scan merge common"),        // all 3 query terms, once
      (2L, "table table table table common"), // one term, spammed
      (3L, "scan merge common pad pad"),      // two terms
      (4L, "common pad pad pad pad"))         // only the ubiquitous term
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs,
      Seq(1 -> Seq("table", "scan", "merge"), 2 -> Seq("common")), 10)
      .collect().groupBy(_.getInt(0))
    val q1 = got(1).sortBy(-_.getDouble(2)).map(_.getLong(1)).toSeq
    assert(q1.head == 1L,
      s"3-term coverage must beat 4x one-term spam, got order $q1")
    assert(q1.take(2).toSet == Set(1L, 3L),
      s"coverage must dominate repetition, got order $q1")
    // 'common' occurs in every doc: idf = ln((N-df+.5)/(df+.5)+1) =
    // ln(4.5/4.5 · … ) = ln(1 + 1/9) for N=df=4 — nearly nothing
    val q2max = got(2).map(_.getDouble(2)).max
    assert(q2max < 0.2,
      s"ubiquitous-term score should be ~0, got $q2max")
  }

  test("QL: scores equal a driver recompute of the Dirichlet formula; " +
      "length normalization and rare-term weighting hold") {
    val fixture = Seq(
      (1L, "table scan"),                           // both terms, short
      (2L, "table scan pad pad pad pad pad pad"),   // both terms, padded
      (3L, "table table table table scan"),         // spammed term
      (4L, "rare pad"),                             // rare term (cf=1)
      (5L, "pad pad table"))                        // common term only
    val docs = fixture.toDF("doc_id", "text")
    val qs = Seq(1 -> Seq("table", "scan"), 2 -> Seq("rare"),
      3 -> Seq("table"))
    val got = Retrieval.qlTopK(docs, qs, 10).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // independent sequential recompute of
    //   Σ_present ln(1 + tf/(μ·cf/|C|)) − |q|·ln(dl + μ),  μ = 100
    val toks = fixture.map { case (id, t) => id -> t.split(" ").toSeq }
    val ctoks = toks.map(_._2.size).sum.toDouble
    val cf = toks.flatMap(_._2).groupBy(identity).map {
      case (w, os) => w -> os.size.toDouble }
    val want = (for {
      (qid, ws) <- qs; (id, ts) <- toks
      tfs = ws.distinct.map(w => ts.count(_ == w)).filter(_ > 0)
      if tfs.nonEmpty
    } yield {
      val s = ws.distinct.map { w =>
        val tf = ts.count(_ == w).toDouble
        if (tf > 0) math.log(1.0 + tf / (100.0 * (cf(w) / ctoks))) else 0.0
      }.sum - ws.distinct.size * math.log(ts.size + 100.0)
      (qid, id) -> (math.floor(s * 10000 + 0.5) / 10000.0)
    }).toMap
    assert(got == want, s"\ngot  $got\nwant $want")
    // identical term content at 4x the length must score lower (the
    // ln(dl+μ) length prior), and a cf=1 term must carry more evidence
    // than a cf=6 one at comparable dl
    assert(got((1, 1L)) > got((1, 2L)), "length prior must penalize pad")
    assert(got((2, 4L)) > got((3, 5L)), "rare term must outweigh common")
  }

  test("RRF: consensus doc beats single-leg winners; contributions are " +
      "the exact 1e12 DIV (60+rank) integers") {
    // leg A ranks (10, 11, 12); leg B ranks (10, 12, 13): doc 10 is the
    // consensus #1, docs 11/13 appear in one leg only
    val legA = Seq((1, 10L, 3.0), (1, 11L, 2.0), (1, 12L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val legB = Seq((1, 10L, 9.0), (1, 12L, 8.0), (1, 13L, 7.0))
      .toDF("query_id", "doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(legA, legB), 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val c = (r: Int) => 1000000000000L / (60L + r)
    assert(got(10L) == 2 * c(1), s"rank-1 consensus: ${got(10L)}")
    assert(got(12L) == c(3) + c(2))
    assert(got(11L) == c(2) && got(13L) == c(3),
      "single-leg docs carry exactly one contribution")
    val order = Retrieval.rrfFuse(Seq(legA, legB), 10)
      .collect().sortBy(r => -r.getLong(2)).map(_.getLong(1)).toSeq
    assert(order.head == 10L, s"consensus doc must fuse to #1, got $order")
  }

  test("temperature sampling: per-language keep counts land on n·rate " +
      "within binomial noise, and the mix flattens vs proportional") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val kept = CorpusOps.temperatureSample(docs, 0.5, "temp")
    val keptPerLang = kept.groupBy("lang").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val nPerLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val z = nPerLang.values.map(n => math.sqrt(n.toDouble)).sum
    val nTotal = nPerLang.values.sum.toDouble
    nPerLang.foreach { case (lang, n) =>
      val rate =
        math.min(1.0, 0.25 * nTotal / (math.sqrt(n.toDouble) * z))
      val expect = n * rate
      val sd = math.sqrt(n * rate * (1 - rate))
      val k = keptPerLang.getOrElse(lang, 0L).toDouble
      assert(math.abs(k - expect) <= 4 * sd + 1,
        s"$lang kept $k, expected $expect ± ${4 * sd}")
    }
    // the point of α<1: the dominant language's share of the SAMPLE is
    // smaller than its share of the corpus
    val nTot = nTotal
    val kTot = keptPerLang.values.sum.toDouble
    val big = nPerLang.maxBy(_._2)._1
    assert(keptPerLang(big) / kTot < nPerLang(big) / nTot,
      "temperature sampling must shrink the dominant language's share")
    // deterministic: same seed, same selection
    val again = CorpusOps.temperatureSample(docs, 0.5, "temp")
      .collect().map(_.getLong(0)).toSet
    assert(again == kept.collect().map(_.getLong(0)).toSet)
  }

  test("nDCG: a coverage-aligned ranking scores exactly 1; bounds hold " +
      "on the real fixture") {
    // equal-length docs whose BM25 order IS the coverage order → the
    // actual top-10 equals the ideal top-10 and nDCG must be exactly 1
    val docs = Seq(
      (1L, "table scan merge"),  // rel 3
      (2L, "table scan zz1"),    // rel 2
      (3L, "table zz2 zz3"),     // rel 1
      (4L, "aa1 aa2 aa3"),       // rel 0 — never ranked
      (5L, "bb1 bb2 bb3")).toDF("doc_id", "text")
    val one = Retrieval.ndcgAt10(docs, Seq(1 -> Seq("table", "scan",
      "merge"))).collect()
    assert(one.length == 1)
    assert(one(0).getDouble(3) == 1.0,
      s"coverage-aligned ranking must be ideal, got ${one(0)}")
    assert(one(0).getDouble(1) == one(0).getDouble(2))
    // real fixture: ideal dominates actual, ratio in (0, 1]
    val rows = SparkEntry.queries("a_retrieval_ndcg")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.length == Retrieval.FixtureQueries.length)
    for (r <- rows) {
      val (dcg, idcg, ndcg) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(dcg > 0.0 && idcg >= dcg,
        s"ideal must dominate the actual ranking: $r")
      assert(ndcg > 0.0 && ndcg <= 1.0, s"nDCG out of range: $r")
    }
  }

  test("MRR/P@10/R@10: hand fixture pins first-hit rank, cutoff " +
      "precision, and recall; fixture rows stay in range") {
    // q1: doc 1 (rel 3) and doc 2 (rel 2) are relevant (rel >= 2); the
    // coverage order ranks them 1 and 2 → rr = 1e6, hits = 2 of 2.
    // q2's single term can never reach rel >= 2 → zero row.
    val docs = Seq(
      (1L, "table scan merge"),
      (2L, "table scan zz1"),
      (3L, "table zz2 zz3"),
      (4L, "aa1 aa2 aa3")).toDF("doc_id", "text")
    val got = Retrieval.mrrAt10(docs,
      Seq(1 -> Seq("table", "scan", "merge"), 2 -> Seq("table")))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1) == ((1L, 1000000L, 200000L, 1000000L)), s"q1: ${got(1)}")
    assert(got(2) == ((0L, 0L, 0L, 0L)), s"q2: ${got(2)}")
    // real fixture: every query answered, all metrics in [0, 1e6],
    // and rr is exactly 1e6 DIV first_rel_rank when a hit exists
    val rows = SparkEntry.queries("a_retrieval_mrr")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.length == Retrieval.FixtureQueries.length)
    for (r <- rows) {
      val (fr, rr, p, rec) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(fr >= 0 && rr >= 0 && rr <= 1000000L)
      assert(p >= 0 && p <= 1000000L && rec >= 0 && rec <= 1000000L)
      if (fr > 0) assert(rr == 1000000L / fr, s"rr law: $r")
      else assert(rr == 0L)
    }
    // the fixture corpus shares vocabulary — at least one query should
    // actually find a relevant doc, or the metric is vacuous here
    assert(rows.exists(_.getLong(2) > 0L), "all-zero MRR on the fixture")
  }
}
