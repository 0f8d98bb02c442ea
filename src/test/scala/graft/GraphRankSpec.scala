package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.GraphRank

/** Contract checks for the source-graph PageRank that the SQL oracle
  * can't express: agreement with an independent in-memory reference on a
  * hand graph, the dangling-mass variant's sum contract, and edge
  * derivation semantics (cap, directionality).
  */
class GraphRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Reference PageRank: plain Scala maps, same variant (synchronous
    * rounds, dangling mass dropped, not redistributed).
    */
  private def refRank(nodes: Seq[String], edges: Seq[(String, String, Long)],
      iters: Int, d: Double): Map[String, Double] = {
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / outW(s) }.sum).toMap
      r = nodes.map(x => x -> ((1 - d) / n + d * in.getOrElse(x, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the in-memory reference on a weighted graph " +
      "with a dangling node") {
    val nodes = Seq("a", "b", "c", "d")
    // d is dangling (no out-edges); a→b is twice the weight of a→c
    val edges = Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("b", "d", 1L))
    val got = GraphRank.pageRank(
        nodes.toDF("node"), edges.toDF("src", "dst", "w"), 10, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = refRank(nodes, edges, 10, 0.85)
    nodes.foreach { x =>
      assert(math.abs(got(x) - want(x)) < 1e-12, s"$x: ${got(x)} vs ${want(x)}")
    }
    // dangling mass is dropped, so total rank sits strictly below 1
    assert(got.values.sum < 1.0)
  }

  test("sourceEdges: symmetric directed pairs, over-cap spans dropped") {
    // srcA/srcB share one 8-gram; the "tmpl" 8-gram spans all three
    // sources and must be dropped at maxSources = 2
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val tmpl = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (1L, "srcA", s"$shared ua1 $tmpl"),
      (2L, "srcB", s"$shared ub1 $tmpl"),
      (3L, "srcC", s"uc1 uc2 uc3 $tmpl")).toDF("doc_id", "source", "text")
    val edges = GraphRank.sourceEdges(docs, n = 8, maxSources = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(edges == Set(("srcA", "srcB", 1L), ("srcB", "srcA", 1L)),
      s"got $edges")
  }

  test("p_source_rank is deterministic across runs") {
    val q = graft.SparkEntry.queries("p_source_rank")
    val a = q(spark, "/root/testdata/sf0.001").collect().toSeq
    val b = q(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(a == b)
  }
}
