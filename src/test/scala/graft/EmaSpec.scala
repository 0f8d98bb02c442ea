package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows

/** EMA semantics the oracle hash can't explain alone: hand-computed
  * values through the integer recurrence (including partial windows at
  * the series head), zero-filled gap hours genuinely decaying the
  * average, and the full-window steady state.
  */
class EmaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("hand-computed adjusted-EMA values, partial windows included") {
    // type "c": hours 10..13, counts [2, 0, 1, 0] — the grid's right
    // edge (hour 13) comes from the OTHER type's event, so c's trailing
    // hour is a genuine zero-filled gap decaying the average
    val ev = Seq(
      ("c", "2024-03-01 10:05:00"), ("c", "2024-03-01 10:55:00"),
      ("c", "2024-03-01 12:30:00"), ("d", "2024-03-01 13:30:00"))
      .toDF("event_type", "ts0")
      .select($"event_type", $"ts0".cast("timestamp").as("ts"))
    val got = EventWindows.emaHourly(ev)
      .filter($"event_type" === "c").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // recurrence (N, D, p) <- (7N + p·x, 7D + p, 10p), oldest first:
    // t=10: N=2,   D=1    -> 2.0
    // t=11: N=14,  D=17   -> 0.8235
    // t=12: N=198, D=219  -> 0.9041
    // t=13: N=1386,D=2533 -> 0.5472
    assert(got("2024-03-01 10:00:00") == ((2L, 2.0)))
    assert(got("2024-03-01 11:00:00") == ((0L, 0.8235)))
    assert(got("2024-03-01 12:00:00") == ((1L, 0.9041)))
    assert(got("2024-03-01 13:00:00") == ((0L, 0.5472)))
  }

  test("constant series is a fixed point at any window fill level") {
    val ev = (0 until 12).flatMap(h => Seq.tabulate(3)(m =>
        ("c", f"2024-03-01 $h%02d:${m * 7}%02d:00")))
      .toDF("event_type", "ts0")
      .select($"event_type", $"ts0".cast("timestamp").as("ts"))
    val got = EventWindows.emaHourly(ev).collect().map(_.getDouble(3))
    assert(got.forall(_ == 3.0), s"constant 3/hour must give ema 3: " +
      got.mkString(","))
  }

  test("ema anomaly: a 20x spike against a steady baseline flags, the " +
      "first grid hour never flags, and the post-spike return to " +
      "baseline does not flag") {
    val ev = ((0 until 10).map(h => Seq.tabulate(if (h == 8) 20 else 1)(
        m => ("c", f"2024-03-01 $h%02d:${m % 60}%02d:30")))).flatten
      .toDF("event_type", "ts0")
      .select($"event_type", $"ts0".cast("timestamp").as("ts"))
    val got = SparkEntry.queries("w_ema_anomaly")(spark,
      "/root/testdata/sf0.001") // registered query runs the fixture…
    // …the planted-spike law is checked on the synthetic frame directly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("hour")
    val flags = EventWindows.emaHourly(ev)
      .withColumn("ema_prev", lag($"ema", 1).over(w))
      .select($"hour",
        ($"ema_prev".isNotNull &&
          $"n".cast("double") > lit(3.0) * $"ema_prev" + lit(3.0))
          .as("flagged"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!flags("2024-03-01 00:00:00"), "first hour has no baseline")
    assert(flags("2024-03-01 08:00:00"), "the 20x spike must flag")
    assert(!flags("2024-03-01 09:00:00"),
      "return to baseline must not flag")
    assert(flags.values.count(identity) == 1, s"only the spike: $flags")
    assert(got.columns.toSeq ==
      Seq("event_type", "hour", "n", "flagged"))
  }

  test("cusum: a sustained rate shift accumulates to a flag with the " +
      "expected lag, the baseline stays at zero, and quiet hours drain") {
    // 20 hours at 1/hour, then 10 hours at 10/hour: μ = 4e6 micro,
    // slack k = 2e6 ⇒ baseline drift 1e6−6e6 < 0 (S pinned at 0),
    // shift drift +4e6/hour vs threshold 5μ = 2e7 ⇒ first flag at
    // shift hour +5 (index 25)
    def hts(h: Int, m: Int): String =
      f"2024-03-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00"
    val ev = ((0 until 20).map(h => Seq(("c", hts(h, 30))))
      ++ (20 until 30).map(h => Seq.tabulate(10)(m =>
        ("c", hts(h, m * 5))))).flatten
      .toDF("event_type", "ts0")
      .select($"event_type", $"ts0".cast("timestamp").as("ts"))
    val rows = EventWindows.cusumHourly(ev)
      .orderBy("hour").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getBoolean(4)))
    assert(rows.take(20).forall(x => x._2 == 0L && !x._3),
      s"baseline must pin S at 0: ${rows.take(20).toSeq}")
    val flagIdx = rows.indexWhere(_._3)
    assert(flagIdx == 25, s"first flag at shift+5, got index $flagIdx")
    assert(rows.drop(25).forall(_._3), "flags persist while shift holds")
    // exact recurrence check on the shifted region: S grows 4e6/hour
    (20 until 30).foreach { i =>
      assert(rows(i)._2 == 4000000L * (i - 19),
        s"S at $i: ${rows(i)._2}")
    }
  }

  test("two-sided cusum: a sustained rate DROP accumulates on the low " +
      "side with the expected lag, and (k, h) are honored") {
    // 20 hours at 10/hour then 10 hours at 0/hour: μ = (1e6·200) DIV 30
    // = 6666666 micro; k = μ DIV 4 = 1666666. During the outage the
    // low side grows μ−k = 5000000/hour vs threshold 4μ = 26666664 ⇒
    // first low flag at outage hour +6 (index 25), and the low side is
    // pinned at 0 while traffic is healthy (10e6 > μ−k). The high side
    // drifts +1666668/hour during the dense stretch (flags 15..19) and
    // drains −8333332/hour once the outage starts — so the two sides
    // flag disjoint hour sets.
    def hts(h: Int, m: Int): String =
      f"2024-03-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00"
    // the gap-fill grid spans the data's own min/max hour, so a
    // sentinel "quiet" type holds the grid open through the outage
    val ev2 = (((0 until 20).map(h => Seq.tabulate(10)(m =>
        ("c", hts(h, m * 5)))))
      ++ (20 until 30).map(h => Seq(("quiet", hts(h, 0))))).flatten
      .toDF("event_type", "ts0")
      .select($"event_type", $"ts0".cast("timestamp").as("ts"))
    val r2 = EventWindows.cusumFromCounts(
        EventWindows.hourlyCounts(ev2),
        slackDiv = 4L, hMult = 4L, twoSided = true)
      .filter($"event_type" === "c")
      .orderBy("hour").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getBoolean(4),
        r.getLong(5), r.getBoolean(6)))
    assert(r2.length == 30, s"grid must span all 30 hours: ${r2.length}")
    // μ = (1e6·200) DIV 30 = 6666666, k = 1666666, 4μ = 26666664
    assert(r2.take(20).forall(_._4 == 0L),
      "low side pinned at 0 during healthy traffic")
    (20 until 30).foreach { i =>
      assert(r2(i)._4 == 5000000L * (i - 19),
        s"low S at $i: ${r2(i)._4}")
    }
    val loFlagIdx = r2.indexWhere(_._5)
    assert(loFlagIdx == 25, s"first low flag at outage+6, got $loFlagIdx")
    assert(r2.drop(25).forall(_._5), "low flags persist")
    assert(!r2.exists(x => x._3 && x._5),
      "no hour flags both directions")
  }

  test("registered query: one ema row per grid cell, smoothing bounded " +
      "by the window's min/max") {
    val d = "/root/testdata/sf0.001"
    val gf = SparkEntry.queries("w_gapfill")(spark, d).count()
    val rows = SparkEntry.queries("w_ema")(spark, d).collect()
    assert(rows.length.toLong == gf, "ema must cover the full grid")
    assert(rows.forall { r =>
      val ema = r.getDouble(3)
      ema >= 0.0 && ema <= 60.0
    })
  }

  private def seasonalOf(rows: Seq[(String, String)]) =
    EventWindows.seasonalAnomalies(rows
        .toDF("event_type", "ts0")
        .select($"event_type", $"ts0".cast("timestamp").as("ts")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(6)).toMap

  test("seasonal: a perfect weekly rhythm never flags — the case the " +
      "trailing-window tests cannot help flagging") {
    // 2 events at 10:00 every week for 3 weeks; all other grid hours
    // are honest zeros forming equal-valued slots themselves
    val ev = Seq("2024-03-01", "2024-03-08", "2024-03-15").flatMap(d =>
      Seq(("a", s"$d 10:00:00"), ("a", s"$d 10:30:00")))
    assert(seasonalOf(ev).values.forall(!_), "no hour may flag")
  }

  test("seasonal: a deviation from the weekly slot flags exactly once, " +
      "at the deviating hour") {
    // slot 10:00: counts 2, 2, 9 across weeks — the 9 breaks the
    // rhythm (9·2 > 2·(2+2) + 3·2); the 2s and every zero slot hold
    val base = Seq("2024-03-01", "2024-03-08").flatMap(d =>
      Seq(("a", s"$d 10:00:00"), ("a", s"$d 10:30:00")))
    val spike = (0 until 9).map(m => ("a", f"2024-03-15 10:${m * 5}%02d:00"))
    val got = seasonalOf(base ++ spike)
    assert(got(("a", "2024-03-15 10:00:00")))
    assert(got.filter(_._2).keySet == Set(("a", "2024-03-15 10:00:00")))
  }

  test("seasonal: a series shorter than one week never flags — every " +
      "slot is observed once and leave-one-out has no baseline") {
    val ev = Seq(("a", "2024-03-01 10:00:00"), ("a", "2024-03-01 12:00:00")) ++
      (0 until 30).map(m => ("a", f"2024-03-02 09:${m + 10}%02d:00"))
    assert(seasonalOf(ev).values.forall(!_),
      "den = 0 slots must stay unflagged even under a 30x spike")
  }
}
