package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Prefix-filtered exact Jaccard: the properties the d_jaccard_prefix
  * oracle hash-match can't isolate on its own — equality with the
  * posting-list ground truth at MULTIPLE thresholds (the oracle pins
  * only t = 0.8), the candidate-reduction claim the operator exists
  * for, and the argument/edge guards.
  */
class PrefixJaccardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("da"), col("db"), round(col("jaccard"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix filtering equals the posting-list exact tier at t=0.8, 0.5, 0.3") {
    val docs = Tables.documents(spark, sf)
    for (t <- Seq(0.8, 0.5, 0.3)) {
      val exact = pairSet(Dedup.jaccardPairs(docs, t))
      val pref = pairSet(Dedup.prefixJaccardPairs(docs, t))
      assert(pref == exact,
        s"t=$t: prefix ${pref.size} pairs vs exact ${exact.size}; " +
          s"missing=${(exact -- pref).take(3)} extra=${(pref -- exact).take(3)}")
      assert(exact.nonEmpty || t > 0.8, s"t=$t: vacuous fixture (no pairs)")
    }
  }

  test("prefix explodes a strict subset of the shingle rows") {
    // the candidate-generation input must actually shrink — ~(1-t) of
    // the full shingle stream at t=0.8 — or the operator is pointless
    val docs = Tables.documents(spark, sf)
    val full = docs
      .select(explode(Dedup.shingleHashes(col("text"))).as("s")).count()
    val t = 0.8
    val prefix = docs
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("sh"))
      .select(size(col("sh")).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(sum(col("n") - ceil(lit(t) * col("n") - lit(1e-9)) + 1)
        .cast("long"))
      .first().getLong(0)
    assert(prefix < full / 2,
      s"prefix rows $prefix not < half of full $full at t=$t")
  }

  test("docs without shingles never pair; threshold bounds enforced") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "x y z w x y z w"),
      (4L, "x y z w x y z w")).toDF("doc_id", "text")
    // docs 1,2 have <3 tokens -> no shingles -> absent even though equal
    val out = Dedup.prefixJaccardPairs(docs, 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 4L)))
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(docs, 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(docs, 1.5)
    }
  }

  test("the ordered-arrays subplan executes once for its three consumers") {
    // prefixes(a), prefixes(b), and the two verification fetches all
    // hang off the same per-doc ordered-shingle aggregation; without
    // reuse the explode + df join would run three times — the constant
    // factor that would erase the prefix win at scale. Since round 12
    // the operator PERSISTS the exploded + ordered frames
    // (Dedup.prefixJaccardPairs), so reuse evidence is cache-backed
    // reads (InMemoryTableScan / TableCacheQueryStage) rather than the
    // pre-persist ReusedExchange shape — accept either, mirroring the
    // auditDiamond("d_jaccard_prefix", 4) gate in ExplainAudit.
    spark.catalog.clearCache()
    val q = Dedup.prefixJaccardPairs(Tables.documents(spark, sf), 0.8)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val reused = "ReusedExchange".r.findAllIn(plan).size
    val cached = "InMemoryTableScan|TableCacheQueryStage".r
      .findAllIn(plan).size
    assert(reused + cached >= 3,
      s"expected >=3 reuse reads (ReusedExchange=$reused cached=$cached):\n" +
        plan.linesIterator.take(5).mkString("\n"))
    spark.catalog.clearCache()
  }

  test("identical docs survive at t=1.0 (prefix length clamps to 1)") {
    val docs = Seq((1L, "p q r s t u"), (2L, "p q r s t u"),
      (3L, "p q r s t x")).toDF("doc_id", "text")
    val out = Dedup.prefixJaccardPairs(docs, 1.0)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }
}
