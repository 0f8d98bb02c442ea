package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BandJoin

/** Band-join semantics the oracle hash can't explain on its own:
  * bucketed matching is EXACTLY the naive |Δt| <= δ cross-filter (no
  * pair missed across bucket boundaries, no pair doubled by the 3-way
  * replication), boundary equality is inclusive, left_outer keeps
  * unmatched lefts exactly once, and pre-epoch timestamps bucket by
  * floor division rather than truncation toward zero.
  */
class BandJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def naive(l: Seq[(Long, Long)], r: Seq[(Long, Long)],
      delta: Long): Set[(Long, Long)] =
    (for ((lid, lus) <- l; (rid, rus) <- r
      if math.abs(lus - rus) <= delta) yield (lid, rid)).toSet

  test("bucketed pairs == naive cross-filter pairs, each exactly once") {
    // timestamps straddle bucket boundaries on both sides of zero
    val l = Seq((1L, -150L), (2L, -100L), (3L, -1L), (4L, 0L),
      (5L, 99L), (6L, 100L), (7L, 101L), (8L, 250L))
    val r = Seq((10L, -200L), (11L, -101L), (12L, -50L), (13L, 1L),
      (14L, 100L), (15L, 199L), (16L, 201L), (17L, 350L))
    val delta = 100L
    val rows = BandJoin.bandJoin(
        l.toDF("lid", "lus"), r.toDF("rid", "rus"), "lus", "rus", delta)
      .select("lid", "rid").collect()
    val got = rows.map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    assert(got.toSet == naive(l, r, delta))
  }

  test("boundary |Δt| == δ is inclusive; |Δt| == δ+1 is out") {
    val l = Seq((1L, 1000L)).toDF("lid", "lus")
    val r = Seq((10L, 1060L), (11L, 1061L), (12L, 940L), (13L, 939L))
      .toDF("rid", "rus")
    val got = BandJoin.bandJoin(l, r, "lus", "rus", 60L)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(10L, 12L))
  }

  test("left_outer keeps an unmatched left exactly once with null right") {
    val l = Seq((1L, 0L), (2L, 1000000L)).toDF("lid", "lus")
    val r = Seq((10L, 10L)).toDF("rid", "rus")
    val rows = BandJoin.bandJoin(l, r, "lus", "rus", 100L, "left_outer")
      .select("lid", "rid").collect()
    assert(rows.length == 2)
    val byLid = rows.groupBy(_.getLong(0))
    assert(byLid(1L).map(_.getLong(1)).toSeq == Seq(10L))
    assert(byLid(2L).head.isNullAt(1))
  }

  test("differential property: 30 random (timestamps, delta) configs " +
      "all agree with the naive cross-filter, pairs exactly once") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 30) {
      val delta = Seq(1L, 7L, 100L, 3600L)(rnd.nextInt(4))
      def ts(): Long = {
        // mix boundary multiples of delta, near-boundary values, and
        // raw draws across both signs
        val base = (rnd.nextLong() % (delta * 20))
        rnd.nextInt(3) match {
          case 0 => base - base % delta          // exact bucket edge
          case 1 => base - base % delta + delta  // next edge
          case _ => base
        }
      }
      val l = Seq.tabulate(12)(i => (i.toLong, ts()))
      val r = Seq.tabulate(12)(i => (100L + i, ts()))
      val got = BandJoin.bandJoin(
          l.toDF("lid", "lus"), r.toDF("rid", "rus"), "lus", "rus", delta)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size,
        s"trial $trial (δ=$delta): duplicated pair")
      assert(got.toSet == naive(l, r, delta),
        s"trial $trial (δ=$delta): pair sets diverge")
    }
  }

  test("registered query: zero-click purchases appear with count 0 and " +
      "counts match a naive recompute") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("r_join_band")(spark, d)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val ev = Tables.events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
    val p = ev.filter(_.getString(2) == "purchase")
      .map(x => (x.getLong(0), x.getLong(1)))
    val c = ev.filter(_.getString(2) == "click")
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = p.map { case (pid, pus) =>
      pid -> c.count { case (_, cus) =>
        math.abs(pus - cus) <= 60L * 1000000L }.toLong
    }.toMap
    assert(got == want)
    assert(got.valuesIterator.contains(0L),
      "fixture should include at least one zero-click purchase")
  }
}
