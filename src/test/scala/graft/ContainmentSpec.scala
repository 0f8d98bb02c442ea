package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Asymmetric containment dedup: direction, the integer threshold
  * boundary, the short-doc guard, and the wire-story case Jaccard
  * structurally misses.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  private def pairs(rows: Seq[(Long, String)], pct: Int = 90) =
    Dedup.containmentPairs(docsDf(rows), pct).collect()
      .map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"),
        r.getAs[Long]("containment_micro"))).toSet

  // 12 distinct tokens → 10 distinct trigram shingles
  private val a12 = (1 to 12).map(i => s"w$i").mkString(" ")

  test("a doc embedded verbatim in a wrapper is contained, not vice versa") {
    val wrapper = a12 + " " + (1 to 12).map(i => s"x$i").mkString(" ")
    val got = pairs(Seq((1L, a12), (2L, wrapper)))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1000000L),
      s"original must be fully contained in wrapper: $got")
    assert(!got.exists(p => p._1 == 2L && p._2 == 1L),
      "the wrapper is NOT contained in the original")
    // and Jaccard at 0.8 misses this pair entirely (union dilution):
    // 10 shared / (10 + 23 - 10) ≈ 0.43
    val jac = Dedup.jaccardPairs(docsDf(Seq((1L, a12), (2L, wrapper))), 0.8)
      .collect()
    assert(jac.isEmpty, "jaccard must miss the embedded-doc pair")
  }

  test("threshold boundary at exactly 90 percent, integer cross-multiply") {
    // container with A's first 11 tokens → 9 of A's 10 shingles: kept
    val b9 = (1 to 11).map(i => s"w$i").mkString(" ")
    assert(pairs(Seq((1L, a12), (2L, b9)))
      .exists(p => p._1 == 1L && p._3 == 900000L))
    // container with A's first 10 tokens → 8 of 10: dropped
    val b8 = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(!pairs(Seq((1L, a12), (2L, b8))).exists(_._1 == 1L))
  }

  test("docs under the minimum shingle count never register as contained") {
    val tiny = "w1 w2 w3 w4 w5 w6" // 4 shingles < 5
    val wrapper = tiny + " plus some other trailing words here"
    assert(!pairs(Seq((1L, tiny), (2L, wrapper))).exists(_._1 == 1L))
  }

  test("fixture run: every planted wrapper contains its original fully") {
    val q = SparkEntry.queries("d_containment_dup")(spark,
      "/root/testdata/sf0.001")
    val got = q.collect().map(r => (r.getAs[Long]("contained"),
      r.getAs[Long]("container"), r.getAs[Long]("containment_micro")))
    val planted = got.filter(p => p._2 == p._1 + 1000000L)
    // every original with >= 5 surviving shingles maps into its wrapper
    assert(planted.length >= 40, s"expected ~50 planted, ${planted.length}")
    assert(planted.forall(_._3 == 1000000L))
    // reverse direction: under the df CAP the 50-fold identical tail is
    // chrome (df 50 > 20) and drops out of the wrapper's shingle set, so
    // the wrapper IS nearly contained in its original — but its two
    // doc-unique CROSSING trigrams (last-of-original × first-of-tail)
    // survive the cap, so reverse containment stays strictly below 10⁶
    val reverse = got.filter(p =>
      p._1 >= 1000000L && p._2 == p._1 - 1000000L)
    assert(reverse.forall(_._3 < 1000000L),
      "crossing shingles must keep reverse containment partial")
  }
}
