package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** The portable HLL's two contracts: the MERGE law (registers of a
  * union are the element-wise max of the parts' registers — the
  * property that lets cardinality sketches combine across
  * engines/executors/days without re-scanning tokens) and estimate
  * accuracy against the exact distinct count the frame carries.
  */
class TextSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("register MERGE law: max-merge of two halves equals the " +
      "whole-corpus register table exactly") {
    def regs(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.hllRegisters(df)
    val whole = regs(docs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    val a = regs(docs.filter(col("doc_id") % 2 === 0))
    val b = regs(docs.filter(col("doc_id") % 2 === 1))
    val merged = a.union(b).groupBy("lang", "j")
      .agg(max(col("mj")).as("mj"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    assert(merged == whole)
    assert(whole.nonEmpty)
  }

  test("registers are well-formed: j in [0, 256), rho in [1, 53]") {
    val rows = TextAnalysis.hllRegisters(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, mj) = (r.getInt(1), r.getInt(2))
      assert(j >= 0 && j < 256, s"register $j out of range")
      assert(mj >= 1 && mj <= 53, s"rho $mj out of range")
    }
  }

  test("estimate tracks the exact distinct count within 15% per " +
      "language (small-range regime is linear counting)") {
    val rows = SparkEntry.queries("t_hll_portable")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      assert(est > 0.0)
      assert(math.abs(est - exact) / exact <= 0.15,
        s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
  }
}
