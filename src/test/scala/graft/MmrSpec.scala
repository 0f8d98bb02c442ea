package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Retrieval

/** MMR diversification: the redundancy-demotion property that motivates
  * the operator, the integer scoring law, and edge semantics.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("a redundant twin of the top doc is demoted below a diverse doc") {
    // doc 1 and doc 2: same token set (sim = 1e6), both highly relevant.
    // doc 3: relevant via one term, disjoint otherwise. Pure relevance
    // ranks 1,2,3; MMR must pick the diverse doc 3 at rank 2: the twin's
    // score 9e6 - 1e6 < doc3's 8e6 - tiny.
    val rows = Seq(
      (1L, "table scan merge table scan merge"),
      (2L, "table scan merge table scan merge"),
      (3L, "table window filter group sort order"))
    val q = Seq(1 -> Seq("table", "scan", "merge"))
    val got = Retrieval.mmrDiversify(docsDf(rows), q).collect()
      .map(r => (r.getAs[Int]("mmr_rank"), r.getAs[Long]("doc_id")))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected diverse doc at rank 2, got $got")
  }

  test("rank 1 is always the relevance-rank-1 doc") {
    val rows = Seq(
      (1L, "table scan merge extra words here"),
      (2L, "table scan other content words here"),
      (3L, "completely unrelated text goes here now"))
    val q = Seq(1 -> Seq("table", "scan", "merge"))
    val got = Retrieval.mmrDiversify(docsDf(rows), q).collect()
      .sortBy(_.getAs[Int]("mmr_rank"))
    assert(got.head.getAs[Long]("doc_id") == 1L)
  }

  test("fewer candidates than m emits exactly that many ranks") {
    val rows = Seq(
      (1L, "table alpha beta gamma delta eps"),
      (2L, "scan zeta eta theta iota kappa"))
    val q = Seq(7 -> Seq("table", "scan"))
    val got = Retrieval.mmrDiversify(docsDf(rows), q).collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Int]("mmr_rank")).sorted.toSeq == Seq(1, 2))
  }

  test("fixture run: 5 ranks per query, subset of the bm25 top-10") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("s_mmr_diversify")(spark, d).collect()
    val byQ = got.groupBy(_.getAs[Int]("query_id"))
    assert(byQ.keySet == Set(1, 2, 3))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("mmr_rank")).sorted.toSeq == (1 to 5))
    }
    val bm25 = SparkEntry.queries("s_bm25")(spark, d).collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("doc_id"))).toSet
    assert(got.forall(r =>
      bm25((r.getAs[Int]("query_id"), r.getAs[Long]("doc_id")))))
    // (the sf0.001 corpus is diverse enough that MMR happens to agree
    // with pure relevance order there — the redundancy-demotion property
    // itself is pinned by the crafted-twin test above, where the flip is
    // forced by construction)
  }
}
