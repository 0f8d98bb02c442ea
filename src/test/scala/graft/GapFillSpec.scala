package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows

/** Gap-fill semantics the oracle hash can't explain alone: a planted
  * empty hour yields an explicit zero row, the grid is exactly
  * |types| × |hours| with bounds from the data itself, per-type totals
  * survive densification, and a type with events only at the edges gets
  * zeros across the whole interior.
  */
class GapFillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("planted gap hour becomes a zero row; grid is types × hours; " +
      "totals preserved") {
    // hours 10..13; "click" misses hour 11 entirely, "view" only exists
    // at the two edge hours
    val ev = Seq(
      ("click", ts(10, 5)), ("click", ts(10, 50)), ("click", ts(12, 1)),
      ("click", ts(13, 30)),
      ("view", ts(10, 0)), ("view", ts(13, 59))
    ).toDF("event_type", "ts")
    val got = EventWindows.gapFillHourly(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 2 * 4, s"grid must be 2 types × 4 hours: $got")
    val m = got.map(x => (x._1, x._2) -> x._3).toMap
    assert(m(("click", "2024-03-01 11:00:00")) == 0L)
    assert(m(("click", "2024-03-01 10:00:00")) == 2L)
    assert(m(("view", "2024-03-01 11:00:00")) == 0L)
    assert(m(("view", "2024-03-01 12:00:00")) == 0L)
    assert(got.filter(_._1 == "click").map(_._3).sum == 4L)
    assert(got.filter(_._1 == "view").map(_._3).sum == 2L)
  }

  test("registered query: complete grid on the real fixture with " +
      "genuine zero rows present") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("w_gapfill")(spark, d).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val hours = rows.map(_.getString(1)).distinct.length
    assert(rows.length == types * hours, "grid must be complete")
    assert(rows.exists(_.getLong(2) == 0L),
      "sf0.001 (≈0.28 events/type-hour) must contain empty hours")
    val total = rows.map(_.getLong(2)).sum
    val raw = Tables.events(spark, d).count()
    assert(total == raw, s"densification must not change totals")
  }
}
