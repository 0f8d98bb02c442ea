package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Boundary semantics of the C4 line-level rule battery (Raffel et al.
  * 2020 §2.2) that the oracle hash can't localize: each line rule and
  * each page rule pinned at its exact boundary with crafted fixtures.
  */
class C4RulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def row(text: String): Row = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    TextAnalysis.c4Rules(df).head()
  }

  private val keepable = "this line has five words."

  test("line kept only with terminal punctuation (. ! ? \")") {
    assert(row(keepable).getAs[Int]("n_kept") == 1)
    assert(row("this line has five words!").getAs[Int]("n_kept") == 1)
    assert(row("does this line have five?").getAs[Int]("n_kept") == 1)
    assert(row("he said \"five words right here\"").getAs[Int]("n_kept") == 1)
    assert(row("this line has five words").getAs[Int]("n_kept") == 0)
    assert(row("this line has five words,").getAs[Int]("n_kept") == 0)
  }

  test("line word-count boundary: 4 words dropped, 5 kept") {
    assert(row("line has four words.").getAs[Int]("n_kept") == 0)
    assert(row(keepable).getAs[Int]("n_kept") == 1)
  }

  test("a javascript mention drops the line but not the page by itself") {
    val r = row(Seq(keepable, keepable, keepable,
      "please enable javascript to view.").mkString("\n"))
    assert(r.getAs[Int]("n_lines") == 4)
    assert(r.getAs[Int]("n_kept") == 3)
    assert(r.getAs[Boolean]("keep_page"))
    assert(!r.getAs[String]("text_clean").contains("javascript"))
  }

  test("page dropped on lorem ipsum, curly brace, or < 3 kept lines") {
    val three = Seq.fill(3)(keepable).mkString("\n")
    assert(row(three).getAs[Boolean]("keep_page"))
    assert(!row(three + "\nfiller lorem ipsum text here.")
      .getAs[Boolean]("keep_page"))
    assert(!row(three + "\nvar x = { a }.").getAs[Boolean]("keep_page"))
    assert(!row(Seq.fill(2)(keepable).mkString("\n"))
      .getAs[Boolean]("keep_page"))
  }

  test("text_clean is the kept lines joined; empty kept yields ''") {
    val r = row(keepable + "\nshort line\n" + keepable)
    assert(r.getAs[String]("text_clean") == keepable + "\n" + keepable)
    assert(row("no punctuation here").getAs[String]("text_clean") == "")
  }

  test("empty line segments never count toward n_lines") {
    val r = row(keepable + "\n\n" + keepable)
    assert(r.getAs[Int]("n_lines") == 2)
  }

  test("the registered query plan stays exchange-free (per-row codegen)") {
    val q = SparkEntry.queries("t_c4_rules")(spark, "/root/testdata/sf0.001")
    val nonSortExchanges = q.queryExecution.executedPlan.toString()
      .linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("rangepartitioning"))
    assert(nonSortExchanges == 0,
      "c4 rules must not shuffle (final ORDER BY excepted)")
    // non-vacuity at the fixture: both page outcomes occur
    val rows = q.collect()
    assert(rows.count(_.getAs[Boolean]("keep_page")) > 0)
    assert(rows.count(r => !r.getAs[Boolean]("keep_page")) > 0)
    assert(rows.exists(_.getAs[Int]("n_kept") > 0))
  }
}
