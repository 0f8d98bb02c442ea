package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Boundary semantics of the Gopher rule battery that the oracle hash
  * can't localize: each flag is pinned at its exact integer threshold
  * with crafted one-off fixtures (the cross-multiplied ratio tests make
  * every boundary a precise integer, so "just passes" and "just fails"
  * differ by one token/line/symbol).
  */
class GopherRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def flags(text: String): Row = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    TextAnalysis.gopherRules(df).head()
  }
  private def flag(text: String, name: String): Boolean =
    flags(text).getAs[Boolean](name)

  test("word count bounds: 49 words fail, 50 pass") {
    val w49 = Seq.fill(49)("word").mkString(" ")
    val w50 = Seq.fill(50)("word").mkString(" ")
    assert(!flag(w49, "ok_word_count"))
    assert(flag(w50, "ok_word_count"))
  }

  test("mean word length band [3,10] at exact integer boundaries") {
    assert(flag("abc abc abc", "ok_mean_word_len")) // mean exactly 3
    assert(!flag("ab ab ab", "ok_mean_word_len")) // mean 2
    assert(flag(("abcdefghij " * 3).trim, "ok_mean_word_len")) // mean 10
    assert(!flag("abcdefghijk abcdefghijk", "ok_mean_word_len")) // mean 11
  }

  test("symbol ratio ≤ 0.1: one '#' needs ten words (the '#' counts as one)") {
    val w9 = Seq.fill(8)("w").mkString(" ") + " #" // 9 words, 1 '#'
    val w10 = Seq.fill(9)("w").mkString(" ") + " #" // 10 words, 1 '#'
    assert(!flag(w9, "ok_symbol_ratio")) // 10·1 > 9
    assert(flag(w10, "ok_symbol_ratio")) // 10·1 ≤ 10
  }

  test("ellipsis occurrences count toward the symbol ratio") {
    val base = Seq.fill(20)("w").mkString(" ")
    assert(flag(base + " ...", "ok_symbol_ratio")) // 1 sym / 21 words
    assert(!flag(base + " ... ... ...", "ok_symbol_ratio")) // 3 / 23
  }

  test("bullet-line fraction ≤ 0.9 on non-empty lines") {
    val bullets9 = Seq.fill(9)("- item").mkString("\n")
    assert(flag(bullets9 + "\nplain", "ok_bullet_lines")) // 9/10
    assert(!flag(bullets9 + "\n- item", "ok_bullet_lines")) // 10/10
  }

  test("ellipsis-line fraction ≤ 0.3") {
    val plain7 = Seq.fill(7)("text line").mkString("\n")
    val ell3 = Seq.fill(3)("trails off...").mkString("\n")
    assert(flag(plain7 + "\n" + ell3, "ok_ellipsis_lines")) // 3/10
    val ell4 = Seq.fill(4)("trails off...").mkString("\n")
    assert(!flag(Seq.fill(6)("text line").mkString("\n") + "\n" + ell4,
      "ok_ellipsis_lines")) // 4/10
  }

  test("alphabetic-word fraction ≥ 0.8") {
    val alpha8 = Seq.fill(8)("word").mkString(" ")
    assert(flag(alpha8 + " 42 99", "ok_alpha_words")) // 8/10
    assert(!flag(alpha8 + " 42 99 7", "ok_alpha_words")) // 8/11
  }

  test("stopword rule needs two DISTINCT Gopher stopwords") {
    assert(!flag("the cat sat on mats", "ok_stopwords")) // only 'the'
    assert(!flag("the cat the dog the", "ok_stopwords")) // 'the' twice
    assert(flag("the cat sat with dog", "ok_stopwords")) // the + with
  }

  test("keep is the conjunction of all seven flags") {
    val good = (Seq.fill(60)("word").mkString(" ")) + " the with"
    val r = flags(good)
    val all = Seq("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
      "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
      "ok_stopwords").forall(r.getAs[Boolean])
    assert(all && r.getAs[Boolean]("keep"))
    // one failing rule (word count) drops keep even with the rest green
    val short = (Seq.fill(20)("word").mkString(" ")) + " the with"
    val s = flags(short)
    assert(!s.getAs[Boolean]("ok_word_count") && !s.getAs[Boolean]("keep"))
    assert(s.getAs[Boolean]("ok_stopwords"))
  }

  test("single-line doc counts one line; empty segments never count") {
    val r = flags("just one line of text here")
    assert(r.getAs[Long]("n_lines") == 1L)
    val r2 = flags("a\n\nb") // empty middle segment filtered
    assert(r2.getAs[Long]("n_lines") == 2L)
    assert(r2.getAs[Long]("n_words") == 2L)
  }

  test("the registered query plan stays exchange-free (per-row codegen)") {
    val q = SparkEntry.queries("t_gopher_rules")(spark,
      "/root/testdata/sf0.001")
    val nonSortExchanges = q.queryExecution.executedPlan.toString()
      .linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("rangepartitioning"))
    assert(nonSortExchanges == 0,
      "gopher rules must not shuffle (final ORDER BY excepted)")
  }
}
