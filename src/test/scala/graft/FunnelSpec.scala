package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows

/** Ordered-progression semantics the w_funnel oracle hash can't explain
  * on its own: stages must happen in order (an out-of-order event never
  * counts), progression is strict (same-timestamp events don't chain),
  * and fallout is monotone.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("funnel counts only in-order progressions; fallout is monotone") {
    val events = Seq(
      // user 1: clean signup → view → click (no purchase)
      (1L, "signup", ts(0)), (1L, "view", ts(1)), (1L, "click", ts(2)),
      // user 2: purchase BEFORE signup must not count; view after does
      (2L, "purchase", ts(0)), (2L, "signup", ts(5)), (2L, "view", ts(6)),
      // user 3: view before signup only — falls out at stage 2
      (3L, "view", ts(0)), (3L, "signup", ts(1)),
      // user 4: full funnel, with a decoy early click before the view
      (4L, "signup", ts(0)), (4L, "click", ts(1)), (4L, "view", ts(2)),
      (4L, "click", ts(3)), (4L, "purchase", ts(9)),
      // user 5: never signs up — not in the funnel at all
      (5L, "view", ts(0)), (5L, "click", ts(1)), (5L, "purchase", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val got = EventWindows
      .funnel(events, Seq("signup", "view", "click", "purchase"))
      .orderBy("stage").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("signup", 4L, 0L),    // users 1-4
      ("view", 3L, 4 * 60L), // users 1, 2, 4 (user 3 viewed too early)
      ("click", 2L, 2 * 60L), // users 1, 4 — user 4's ts(3) click, not
      // the pre-view decoy at ts(1)
      ("purchase", 1L, 6 * 60L))) // user 4 only: ts(9) - click ts(3)
  }

  test("retention: pre-signup weeks are excluded; same-week signup " +
      "activity lands at offset 0") {
    def wts(w: Int, s: Int = 0) =
      new Timestamp((w * 604800L + s) * 1000L)
    val events = Seq(
      // u1: signs up wk10, active wk10 and wk12
      (1L, "signup", wts(10)), (1L, "click", wts(12)),
      // u2: active wk9 BEFORE signing up wk10 — wk9 must not count
      (2L, "view", wts(9)), (2L, "signup", wts(10, 60)),
      // u3: never signs up — not in any cohort
      (3L, "view", wts(10)))
      .toDF("user_id", "event_type", "ts")
    val got = EventWindows.cohortRetention(events, "signup")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 0L, 2L), (10L, 2L, 1L)))
  }

  test("transitions: ts ties order by event_id; last events emit nothing") {
    val events = Seq(
      // u1: view and click share a timestamp — event_id breaks the tie
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(0)),
      (3L, 1L, "purchase", ts(1)),
      // u2: a single event has no successor
      (4L, 2L, "view", ts(0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventWindows.transitions(events)
      .orderBy("event_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("click", "purchase", 1L), ("view", "click", 1L)))
  }

  test("strict progression: a same-timestamp next stage does not chain") {
    val events = Seq(
      (1L, "signup", ts(0)), (1L, "view", ts(0)),  // simultaneous
      (2L, "signup", ts(0)), (2L, "view", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = EventWindows.funnel(events, Seq("signup", "view"))
      .orderBy("stage").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("signup", 2L), ("view", 1L)))
  }

  test("rolling active users: trailing-window membership, distinct " +
      "users, only observed days reported") {
    def dts(d: Int, i: Int = 0) =
      new Timestamp(d * 86400000L + i * 1000L)
    val events = Seq(
      (1L, "view", dts(0)), (1L, "view", dts(3)),
      // user 2 active twice the same day — counts once
      (2L, "click", dts(0)), (2L, "view", dts(0, 5)),
      (3L, "view", dts(8)))
      .toDF("user_id", "event_type", "ts")
    val got = EventWindows.rollingActiveUsers(events, 7)
      .orderBy("report_day").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      (0L, 2L),  // day 0: users 1, 2
      (3L, 2L),  // days -3..3: user 1 (again) + user 2 — still distinct 2
      (8L, 2L))) // days 2..8: user 1 (day 3) + user 3; day 0 aged out
    // days 1, 2, 4... had no events: not report rows even though users
    // were still "active" in their trailing windows
  }

  test("hourly anomalies: integer two-sigma test, incomplete baseline " +
      "never flags, zero-variance baseline flags any deviation") {
    def hts(h: Int, i: Int) =
      new Timestamp(h * 3600000L + i * 1000L)
    val events = (
      // hours 0-2: 2 events each (constant baseline), hour 3: 6 (spike),
      // hour 4: back to 2 — inside 2σ of the now-noisy baseline
      (0 to 2).flatMap(h => Seq.tabulate(2)(i => ("click", hts(h, i)))) ++
        Seq.tabulate(6)(i => ("click", hts(3, i))) ++
        Seq.tabulate(2)(i => ("click", hts(4, i))))
      .toDF("event_type", "ts")
    val got = EventWindows.hourlyAnomalies(events, baseline = 3)
      .orderBy("hour_bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, -1L, false),  // no baseline at all
      (1L, 2L, -1L, false),  // 1 of 3 baseline hours
      (2L, 2L, -1L, false),  // 2 of 3
      // hour 3: S=6 S2=12 → variance 0, any deviation flags: (3·6−6)²=144 > 0
      (3L, 6L, 6L, true),
      // hour 4: S=10 S2=44 → (3·2−10)²=16 ≤ 4·(132−100)=128: not flagged
      (4L, 2L, 10L, false)))
  }
}
