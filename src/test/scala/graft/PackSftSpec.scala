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
