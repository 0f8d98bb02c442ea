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
}
