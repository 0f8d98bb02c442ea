package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows

/** Multi-touch attribution: hand fixtures for the lookback boundary,
  * the last-touch rank and its microsecond/id tie-breaks, and the
  * exact-10⁶ linear credit invariant.
  */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def ev(id: Long, user: Long, ms: Long, tpe: String) =
    (id, new Timestamp(ms), user, tpe, 1.0)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    EventWindows.attribution(toDf(rows), Seq("view", "click"),
      "purchase").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap

  test("hand fixture: lookback window, last touch, exact linear split") {
    val day = 86400000L
    val got = run(Seq(
      // user 1: view, click, click inside the 7-day lookback; one view
      // 8 days before the purchase must NOT be credited
      ev(1, 1, 0, "view"),
      ev(2, 1, 8L * day, "view"),
      ev(3, 1, 9L * day, "click"),
      ev(4, 1, 10L * day, "click"),
      ev(5, 1, 12L * day, "purchase")))
    // k=3 touches: each gets 333333, the LAST touch (click id=4) takes
    // the remainder: 1000000 - 2*333333 = 333334. U-shaped: first
    // (view id=2) 400000, middle (click id=3) 200000, last (click
    // id=4) 400000 + zero remainder
    assert(got("view") == ((1L, 0L, 333333L, 400000L)))
    assert(got("click") == ((2L, 1L, 333333L + 333334L, 600000L)))
    // both credit models sum to exactly one conversion
    assert(got.values.map(_._3).sum == 1000000L)
    assert(got.values.map(_._4).sum == 1000000L)
  }

  test("a touch at the conversion instant counts; ties rank by id") {
    val got = run(Seq(
      ev(1, 1, 1000, "view"),
      ev(2, 1, 1000, "click"), // same ts as the view AND the purchase
      ev(3, 1, 1000, "purchase")))
    // both touches at tus == cus are inside (<=); the tie resolves to
    // the larger event_id (2, the click) as last touch
    // k=2: linear and U-shaped both split 50/50
    assert(got("view") == ((1L, 0L, 500000L, 500000L)))
    assert(got("click") == ((1L, 1L, 500000L, 500000L)))
  }

  test("per-conversion credit always sums to 10^6 on the fixture corpus") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val got = EventWindows.attribution(events, Seq("view", "click"),
      "purchase").collect()
    val totalLinear = got.map(_.getLong(3)).sum
    val totalU = got.map(_.getLong(4)).sum
    val conversions = got.map(_.getLong(2)).sum // each conv has 1 last
    assert(conversions > 0)
    assert(totalLinear == conversions * 1000000L,
      s"linear credit $totalLinear != $conversions conversions")
    assert(totalU == conversions * 1000000L,
      s"U credit $totalU != $conversions conversions")
  }

  test("an untouched conversion earns no row; zero-touch corpus is empty") {
    val got = run(Seq(ev(1, 1, 1000, "purchase")))
    assert(got.isEmpty)
  }
}
