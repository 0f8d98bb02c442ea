package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Quality-ensemble gate: the vote-composition law, per-family
  * non-vacuity, and consistency with the standalone signal operators.
  */
class EnsembleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private lazy val rows = SparkEntry.queries("p_quality_ensemble")(spark,
    "/root/testdata/sf0.001").collect()

  test("votes is the exact sum of the four family booleans; keep at 3") {
    assert(rows.length == 500)
    rows.foreach { r =>
      val vs = Seq("v_structural", "v_model", "v_repetition",
        "v_informative").map(c => if (r.getAs[Boolean](c)) 1 else 0).sum
      assert(r.getAs[Int]("votes") == vs)
      assert(r.getAs[Boolean]("keep") == (vs >= 3))
    }
  }

  test("every vote family and the gate itself are non-vacuous") {
    for (c <- Seq("v_structural", "v_model", "v_repetition",
        "v_informative", "keep")) {
      val t = rows.count(_.getAs[Boolean](c))
      assert(t > 0 && t < rows.length,
        s"$c must split the fixture, got $t/${rows.length}")
    }
  }

  test("v_structural equals the Gopher battery's length/shape core") {
    val gopher = TextAnalysis.gopherRules(
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("ok_word_count") &&
          r.getAs[Boolean]("ok_mean_word_len") &&
          r.getAs[Boolean]("ok_alpha_words"))).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("v_structural") ==
        gopher(r.getAs[Long]("doc_id")))
    }
  }

  test("no single family decides: keep differs from at least one family") {
    // the ensemble is not a pass-through of any one vote column
    for (c <- Seq("v_structural", "v_model", "v_repetition",
        "v_informative")) {
      assert(rows.exists(r =>
        r.getAs[Boolean](c) != r.getAs[Boolean]("keep")),
        s"keep must not equal $c everywhere")
    }
  }
}
