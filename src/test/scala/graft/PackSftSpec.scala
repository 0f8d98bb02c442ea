package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingSet

/** packEfficiency: hand-computed window/straddle accounting on a tiny
  * budget; sftPairs: the JSON-roundtrip pairing against hand-derived
  * turn windows, partial-turn and no-pair edges included.
  */
class PackSftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def doc(id: Long, lang: String, n: Int) =
    (id, lang, (1 to n).map(j => s"w${id}t$j").mkString(" "))

  test("pack efficiency: hand-computed packs, straddles and utilization " +
      "at budget 10") {
    // en: n = 4, 5, 8 → cum 4, 9, 17; doc 3 starts in window 0 and ends
    // in window 1 (the only straddler); 2 windows, 17 tokens → util
    // 17e6 DIV 20 = 850000. fr: n = 10 exactly → one full window,
    // util 1e6, no straddle.
    val docs = Seq(doc(1, "en", 4), doc(2, "en", 5), doc(3, "en", 8),
      doc(4, "fr", 10)).toDF("doc_id", "lang", "text")
    val got = TrainingSet.packEfficiency(docs, 10).orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("en", 3L, 17L, 2L, 1L, 850000L),
      ("fr", 1L, 10L, 1L, 0L, 1000000L)), got.toSeq)
    intercept[IllegalArgumentException] {
      TrainingSet.packEfficiency(docs, 0)
    }
  }

  test("mix report: shares are DIV-exact, a configured-but-absent " +
      "source and an unconfigured leak both surface, guards fire") {
    val docs = Seq(
      (1L, "sA", "a b c d"),          // 4 tokens
      (2L, "sA", "e f"),              // 2 tokens → sA: 6
      (3L, "sLEAK", "x y z w")        // 4 tokens, not in targets
    ).toDF("doc_id", "source", "text")
    val got = TrainingSet.mixReport(docs,
        Seq(("sA", 3L), ("sGHOST", 1L))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // N = 10; sA achieved 600000, target 750000, dev 150000;
    // sGHOST achieved 0, target 250000; sLEAK achieved 400000, target 0
    assert(got == Seq(
      ("sA", 6L, 600000L, 750000L, 150000L),
      ("sGHOST", 0L, 0L, 250000L, 250000L),
      ("sLEAK", 4L, 400000L, 0L, 400000L)), got)
    intercept[IllegalArgumentException] {
      TrainingSet.mixReport(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TrainingSet.mixReport(docs, Seq(("sA", 0L)))
    }
    intercept[IllegalArgumentException] {
      TrainingSet.mixReport(docs, Seq(("sA", 1L), ("sA", 2L)))
    }
  }

  test("subword fertility: micro-ratio matches a hand computation and " +
      "is bounded below by 1 (every token is at least one subword)") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("t_subword_fertility")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, sw, w, f) =>
      assert(f == 1000000L * sw / w, s"$lang DIV law")
      assert(f >= 1000000L, s"$lang fertility below 1: $f")
    }
    // ceil(4/4)+ceil(2/4)+ceil(10/4) = 1+1+3 = 5 subwords over 3 words
    val row = Seq((9L, "en", "abcd ef ghijklmnop"))
      .toDF("doc_id", "lang", "text")
      .select(graft.pipeline.TextAnalysis.subwordEstimate(col("text")))
      .head()
    assert(row.getLong(0) == 5L)
  }

  test("sft pairs: turn windows pair user->assistant, partial responses " +
      "kept, unanswered prompts and short docs dropped, system turn " +
      "never surfaces") {
    // 35 tokens → 2 pairs (second response partial: tokens 31..35);
    // 25 tokens → 1 pair (second round has prompt but no response);
    // 10 tokens → 0 pairs
    val docs = Seq(doc(1, "en", 35), doc(2, "en", 25), doc(3, "en", 10))
      .toDF("doc_id", "lang", "text")
    def words(id: Long, a: Int, b: Int) =
      (a to b).map(j => s"w${id}t$j").mkString(" ")
    val got = TrainingSet.sftPairs(docs).orderBy("doc_id", "pair_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 1, words(1, 1, 10), words(1, 11, 20)),
      (1L, 2, words(1, 21, 30), words(1, 31, 35)),
      (2L, 1, words(2, 1, 10), words(2, 11, 20))), got.toSeq)
    assert(!got.exists(r => r._3.contains("assistant") ||
      r._4.contains("assistant")), "system content must never surface")
  }
}
