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
}
