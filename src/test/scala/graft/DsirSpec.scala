package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingSet

/** DSIR importance weighting: the selection semantics the
  * p_dsir_weights hash-match can't isolate — that scores actually
  * ENRICH for the target distribution, that they are partition-
  * independent (pure integer arithmetic end to end), and the
  * feature/edge contracts.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("target-language docs score higher on average (enrichment)") {
    val docs = Tables.documents(spark, sf)
    val scored = TrainingSet.dsirWeights(docs, col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val Array(en, other) = scored
      .groupBy(col("lang") === "en").agg(avg("score_micro"))
      .orderBy(col("(lang = en)").desc).collect().map(_.getDouble(1))
    assert(en > other,
      s"en mean $en not above non-target mean $other — selection is " +
        "not enriching for the target distribution")
  }

  test("scores are partition-independent and repeatable") {
    val docs = Tables.documents(spark, sf)
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      TrainingSet.dsirWeights(d, col("lang") === "en")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b, "score drift across partitionings — the integer " +
      "micro-unit contract is broken")
  }

  test("a target-composed doc outranks a disjoint doc on a hand fixture") {
    // target corpus says "alpha beta"; candidate 10 repeats target
    // features, candidate 11 shares none — the λ log-ratio must order
    // them regardless of hashing details
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "alpha beta gamma", "en"),
      (10L, "alpha beta alpha", "xx"),
      (11L, "delta epsilon zeta", "xx")
    ).toDF("doc_id", "text", "lang")
    val s = TrainingSet.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(10L) > s(11L),
      s"target-like doc ${s(10L)} not above disjoint doc ${s(11L)}")
  }

  test("null-text docs are excluded; nibble bounds enforced") {
    val docs = Seq((1L, "a b c", "en"), (2L, null, "en"))
      .toDF("doc_id", "text", "lang")
    val out = TrainingSet.dsirWeights(docs, col("lang") === "en")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      TrainingSet.dsirWeights(docs, col("lang") === "en", nibbles = 0)
    }
  }
}
