package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Preference

/** Pairwise-preference aggregation: hand fixtures for the match
  * derivation (winner rule, tie rule, per-group cap) and structural
  * invariants of the registered queries the oracle hash can't explain
  * on its own.
  */
class PreferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ev(id: Long, user: Long, sec: Long, tpe: String,
      value: Double) =
    (id, new Timestamp(sec * 1000L), user, tpe, value)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("pair matrix and rank match a hand-computed fixture") {
    // one user, one day: A(3) B(1) C(2) → A beats B and C; C beats B
    val events = toDf(Seq(
      ev(1, 1, 100, "A", 3.0), ev(2, 1, 200, "B", 1.0),
      ev(3, 1, 300, "C", 2.0)))
    val m = Preference.pairMatrix(events).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m == Map(
      ("A", "B") -> ((1L, 1L, 1000000L)),
      ("A", "C") -> ((1L, 1L, 1000000L)),
      ("B", "C") -> ((1L, 0L, 0L))), s"got $m")
    val rk = Preference.typeRank(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rk.sortBy(_._5).toSeq == Seq(
      ("A", 2L, 2L, 1000000L, 1L),
      ("C", 2L, 1L, 500000L, 2L),
      ("B", 2L, 0L, 0L, 3L)), s"got ${rk.toSeq}")
  }

  test("equal values: the lexicographically smaller type wins") {
    val events = toDf(Seq(
      ev(1, 1, 100, "X", 5.0), ev(2, 1, 200, "Y", 5.0)))
    val m = Preference.pairMatrix(events).collect()
    assert(m.length == 1)
    assert(m(0).getString(0) == "X" && m(0).getLong(3) == 1L,
      "tie must go to the smaller type")
  }

  test("events in different days or users never pair") {
    val events = toDf(Seq(
      ev(1, 1, 100, "A", 1.0),
      ev(2, 1, 100 + 86400, "B", 2.0), // same user, next day
      ev(3, 2, 100, "C", 3.0))) // same day, other user
    assert(Preference.pairMatrix(events).count() == 0)
  }

  test("per-(user, day) cap keeps the first `cap` events by (ts, id)") {
    // 20 distinct-type events in one user-day; cap 16 → C(16,2) = 120
    // matches, and none involve the 4 latest-ts types
    val events = toDf((1 to 20).map(i =>
      ev(i.toLong, 1, 100 + i, f"T$i%02d", 1.0)))
    val m = Preference.pairMatrix(events, cap = 16).collect()
    assert(m.map(_.getLong(2)).sum == 120L, "pair mass must be C(16,2)")
    val types = m.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(types == (1 to 16).map(i => f"T$i%02d").toSet,
      "capped-out events must not appear in any match")
  }

  test("Bradley–Terry MM: dominant type ranks first, symmetric data " +
      "stays uniform, the fit is deterministic, and one round matches " +
      "an independent integer recompute") {
    // A beats everyone, C loses to everyone: BT must order A > B > C
    val events = toDf(Seq(
      ev(1, 1, 100, "A", 3.0), ev(2, 1, 200, "B", 2.0),
      ev(3, 1, 300, "C", 1.0),
      ev(4, 2, 100, "A", 9.0), ev(5, 2, 200, "B", 5.0),
      ev(6, 2, 300, "C", 2.0)))
    val bt = Preference.bradleyTerry(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bt.sortBy(_._3).map(_._1).toSeq == Seq("A", "B", "C"),
      s"got ${bt.toSeq}")
    // perfectly balanced: X and Y trade wins 1-1 → equal strengths
    val even = toDf(Seq(
      ev(1, 1, 100, "X", 2.0), ev(2, 1, 200, "Y", 1.0),
      ev(3, 2, 100, "X", 1.0), ev(4, 2, 200, "Y", 2.0)))
    val be = Preference.bradleyTerry(even).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(be("X") == be("Y"), s"balanced data must fit equal: $be")
    // determinism
    val again = Preference.bradleyTerry(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == bt.toSeq)
    // one MM round, recomputed independently with the same integer
    // floor arithmetic (A beats B 2-0, A beats C 2-0, B beats C 2-0)
    val one = Preference.bradleyTerry(events, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w0 = 1000000L / 3
    def d(wi: Long) = 2L * ((2L * 1000000L) / (w0 + wi))
    val raws = Map("A" -> (4L * 1000000L) / d(w0),
      "B" -> (2L * 1000000L) / d(w0), "C" -> 0L)
    val z = raws.values.sum
    // the 1-micro floor keeps the all-losses type's weight positive so
    // later rounds never divide by a zero-zero head-to-head
    val want = raws.map { case (t, r) =>
      t -> math.max(1L, (r * 1000000L) / z) }
    assert(one == want, s"got $one want $want")
  }

  test("Bradley–Terry: empty match set yields an empty frame, not a " +
      "crash, matching the oracle's empty result") {
    val empty = toDf(Seq(ev(1, 1, 100, "A", 1.0))) // one event: no pairs
    assert(Preference.bradleyTerry(empty).collect().isEmpty)
  }

  test("registered queries: consistent totals, win rates on the grid, " +
      "leaderboard ordered by win rate") {
    val pairs = SparkEntry.queries("p_preference_pairs")(spark, sf)
      .collect()
    assert(pairs.nonEmpty)
    for (r <- pairs) {
      assert(r.getLong(3) <= r.getLong(2)) // wa ≤ n
      assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2))
    }
    val rank = SparkEntry.queries("p_preference_rank")(spark, sf)
      .collect()
    // every type's matches = Σ n over its pairs; total wins across the
    // leaderboard = total matches (each match has exactly one winner)
    val totalN = pairs.map(_.getLong(2)).sum
    assert(rank.map(_.getLong(2)).sum == totalN)
    assert(rank.map(_.getLong(1)).sum == 2 * totalN)
    // rnk is the (winrate desc, type asc) order, 1-based and dense
    val byRnk = rank.sortBy(_.getLong(4))
    assert(byRnk.map(_.getLong(4)).toSeq == (1L to rank.length).toSeq)
    assert(byRnk.map(_.getLong(3)).toSeq ==
      byRnk.map(_.getLong(3)).sortBy(-_).toSeq)
  }

  test("a_preference_ci: exact agreement with the leaderboard on the " +
      "shared columns, and the CI brackets each true win rate") {
    val rank = SparkEntry.queries("p_preference_rank")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val ci = SparkEntry.queries("a_preference_ci")(spark, sf).collect()
    assert(ci.length == rank.size)
    for (r <- ci) {
      val (matches, winrate, rnk) = rank(r.getString(0))
      assert(r.getLong(1) == matches, s"matches drift for $r")
      assert(r.getLong(2) == winrate, s"winrate drift for $r")
      assert(r.getLong(5) == rnk, s"rank drift for $r")
      val (lo, hi) = (r.getLong(3), r.getLong(4))
      assert(lo <= hi)
      // deterministic fixture: the 5-95% band holds the true rate
      assert(lo <= winrate && winrate <= hi,
        s"true rate $winrate outside [$lo, $hi] for ${r.getString(0)}")
    }
  }

  test("dpoDataset: winner orientation, floored micro margin, tie rule") {
    // one user, one day: A(3.25) B(1.0) C(2.0), plus D(2.0) tying C
    val events = toDf(Seq(
      ev(1, 1, 100, "A", 3.25), ev(2, 1, 200, "B", 1.0),
      ev(3, 1, 300, "C", 2.0), ev(4, 1, 400, "D", 2.0)))
    val rows = Preference.dpoDataset(events).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // every cell holds exactly one example here (6 pairs, all distinct)
    assert(rows.size == 6)
    assert(rows(("A", "B")) == ((1L, 2L, 2250000L)))
    assert(rows(("A", "C")) == ((1L, 3L, 1250000L)))
    assert(rows(("A", "D")) == ((1L, 4L, 1250000L)))
    assert(rows(("C", "B")) == ((3L, 2L, 1000000L)))
    assert(rows(("D", "B")) == ((4L, 2L, 1000000L)))
    // the C-D tie orients to the lexicographically smaller type, margin 0
    assert(rows(("C", "D")) == ((3L, 4L, 0L)))
  }

  test("dpoDataset: per-cell balance cap binds on a hot cell") {
    // 20 (user, day) groups each produce one A-beats-B match; an
    // unbalanced build would emit 20 rows for the (A, B) cell
    val events = toDf((1 to 20).flatMap { u =>
      Seq(ev(u * 2L, u.toLong, 100, "A", 2.0),
        ev(u * 2L + 1, u.toLong, 200, "B", 1.0))
    })
    val got = Preference.dpoDataset(events, perCell = 8).collect()
    assert(got.length == 8)
    assert(got.forall(r =>
      r.getString(0) == "A" && r.getString(1) == "B"))
    // deterministic: the same 8 examples under any partitioning
    val again = Preference.dpoDataset(
      events.repartition(13), perCell = 8).collect()
    assert(got.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }
}
