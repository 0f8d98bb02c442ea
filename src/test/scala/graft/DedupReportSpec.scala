package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cascade-report semantics: the funnel is monotone, every stage's cut
  * is non-vacuous (the planted enrichment guarantees work for each
  * tier), the exact stage cuts exactly the planted copies, and the
  * report is deterministic.
  */
class DedupReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("monotone funnel with a non-vacuous cut at every stage") {
    val rows = SparkEntry.queries("p_dedup_report")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val seq = Seq("0_raw", "1_exact", "2_near", "3_containment").map(rows)
    assert(seq == seq.sorted.reverse, s"funnel must be monotone: $seq")
    seq.sliding(2).foreach { case Seq(a, b) =>
      assert(a > b, s"every stage must cut something: $seq")
    }
    // the planted exact copies (docs < 50 re-ingested) are exactly the
    // stage-1 cut: identical text keeps the min id
    assert(seq(0) - seq(1) == 50, s"exact cut: ${seq(0) - seq(1)}")
    assert(seq.last > 0)
    val again = SparkEntry.queries("p_dedup_report")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == again)
  }

  test("releases every cache it creates, incl. the seam-internal ones") {
    // the report persists its own stage frames AND the frames
    // jaccardPairsFrom/containmentPairsFrom persist inside the seam
    // (drop-adjusted sizes, the semi-joined shingle frame) — all must
    // be gone once the result is materialized, or a long-lived user
    // session accumulates executor memory per report (the harness's
    // per-query clearCache masked the leak; this pins the fix)
    spark.catalog.clearCache()
    graft.pipeline.Dedup.dedupReport(Tables.documents(spark, sf)).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "dedupReport left persisted frames behind after materialization")
  }
}
