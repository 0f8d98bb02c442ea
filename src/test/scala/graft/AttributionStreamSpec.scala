package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows
import graft.streaming.AttributionStream

/** The streaming attribution view must equal the batch w_attribution
  * frame over the union of everything ingested under ANY batch split —
  * including a LATE touch retroactively re-crediting an already-seen
  * conversion — replay idempotently, and stay exact across the
  * finalize-then-vacuum compaction.
  */
class AttributionStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val Touch = Seq("view", "click")
  private val Conv = "purchase"

  private def ev(id: Long, user: Long, ms: Long, tpe: String) =
    (id, new Timestamp(ms), user, tpe, 1.0)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def rows(df: DataFrame): Map[String, (Long, Long, Long, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  private def batchAnswer(
      evs: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows(EventWindows.attribution(toDf(evs), Touch, Conv))

  test("split-stream view equals batch, incl. a late touch re-credit") {
    val day = 86400000L
    val all = Seq(
      ev(1, 1, 1 * day, "view"),
      ev(2, 1, 2 * day, "click"),
      ev(3, 1, 3 * day, "purchase"),
      ev(4, 2, 2 * day, "view"),
      ev(5, 2, 4 * day, "purchase"))
    val root = Files.createTempDirectory("attrstream").toString
    // batch 0: everything EXCEPT user 1's click (it arrives late)
    AttributionStream.ingestBatch(
      toDf(all.filterNot(_._1 == 2L)), 0L, root, Touch, Conv)
    val before = rows(AttributionStream.creditView(spark, root))
    // before the late click, the view alone owns user 1's conversion
    assert(before("view") == ((2L, 2L, 2000000L, 2000000L)))
    assert(!before.contains("click"))
    // batch 1: the late click lands INSIDE conversion 3's lookback —
    // k goes 1→2 for that conversion, the last touch flips to the
    // click, and the view must now equal the batch answer on the union
    AttributionStream.ingestBatch(toDf(all.filter(_._1 == 2L)), 1L,
      root, Touch, Conv)
    val after = rows(AttributionStream.creditView(spark, root))
    assert(after == batchAnswer(all), s"got $after")
    assert(after("click") == ((1L, 1L, 500000L, 500000L)))
    assert(after("view") == ((2L, 1L, 1500000L, 1500000L)))
    // at-least-once replay: re-running batch 1 changes nothing
    AttributionStream.ingestBatch(toDf(all.filter(_._1 == 2L)), 1L,
      root, Touch, Conv)
    assert(rows(AttributionStream.creditView(spark, root)) == after)
  }

  test("3-way split of the fixture corpus equals the batch answer") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.attribution(events, Touch, Conv))
    val root = Files.createTempDirectory("attrcorpus").toString
    (0 until 3).foreach(i => AttributionStream.ingestBatch(
      events.filter(col("event_id") % 3 === i), i.toLong, root,
      Touch, Conv))
    assert(rows(AttributionStream.creditView(spark, root)) == want)
  }

  test("vacuum finalizes old conversions exactly; view unchanged") {
    val day = 86400000L
    val all = Seq(
      ev(1, 1, 1 * day, "view"),
      ev(2, 1, 2 * day, "purchase"),       // old: finalized
      ev(3, 1, 30 * day, "click"),
      ev(4, 1, 31 * day, "purchase"),      // recent: stays live
      ev(5, 2, 29 * day, "view"))          // touch for a live window
    val root = Files.createTempDirectory("attrvac").toString
    AttributionStream.ingestBatch(toDf(all), 0L, root, Touch, Conv)
    val want = batchAnswer(all)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
    // horizon at day 20: conversion 2 is final, its rows drop; touch 1
    // (day 1 <= 20d - 7d lookback) drops too
    AttributionStream.vacuum(spark, root, 20 * day * 1000L)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
    // the live tables really shrank: only post-horizon-window rows
    val liveTouches = spark.read.parquet(s"$root/touch/batch=compacted")
      .collect().map(_.getLong(2)).toSet
    assert(liveTouches == Set(3L, 5L))
    // a SECOND vacuum (idempotent horizon rerun) still answers the same
    AttributionStream.vacuum(spark, root, 20 * day * 1000L)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
  }

  test("vacuum survives marksuccessfuljobs=false: sentinels planted " +
      "explicitly for both the finalize gate and the swap arbitration") {
    // same loss class as the TransitionsStream twin test: with the
    // committer's _SUCCESS disabled, a horizon rerun would recompute
    // the finalize from already-compacted live rows (credits lost) and
    // recoverSwap would judge every complete tmp as partial
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prior = hconf.get(key)
    hconf.setBoolean(key, false)
    try {
      val day = 86400000L
      val all = Seq(
        ev(1, 1, 1 * day, "view"),
        ev(2, 1, 2 * day, "purchase"),
        ev(3, 1, 30 * day, "click"),
        ev(4, 1, 31 * day, "purchase"))
      val root = Files.createTempDirectory("attrnosucc").toString
      AttributionStream.ingestBatch(toDf(all), 0L, root, Touch, Conv)
      val want = batchAnswer(all)
      val horizon = 20 * day * 1000L
      AttributionStream.vacuum(spark, root, horizon)
      assert(rows(AttributionStream.creditView(spark, root)) == want)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/final/batch=$horizon/_SUCCESS")),
        "sentinel not planted when the committer's own is disabled")
      AttributionStream.vacuum(spark, root, horizon)
      assert(rows(AttributionStream.creditView(spark, root)) == want,
        "horizon rerun recomputed finalized credits from compacted rows")
    } finally {
      if (prior == null) hconf.unset(key) else hconf.set(key, prior)
    }
  }

  test("crash mid-finalize (partial dir, no _SUCCESS): rerun redoes the " +
      "finalize instead of treating the partial dir as committed") {
    val day = 86400000L
    val all = Seq(
      ev(1, 1, 1 * day, "view"),
      ev(2, 1, 2 * day, "purchase"),       // old: must still finalize
      ev(3, 1, 30 * day, "click"),
      ev(4, 1, 31 * day, "purchase"))
    val root = Files.createTempDirectory("attrpartial").toString
    AttributionStream.ingestBatch(toDf(all), 0L, root, Touch, Conv)
    val want = batchAnswer(all)
    val horizon = 20 * day * 1000L
    // manufacture the crash: the finalize dir for this horizon exists
    // but the writer died mid-parquet-write (no _SUCCESS). The old
    // existence-gate would skip the finalize, then compact away the
    // pre-horizon rows — conversion 2's credits permanently lost.
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$root/final/batch=$horizon/_temporary"))
    AttributionStream.vacuum(spark, root, horizon)
    assert(rows(AttributionStream.creditView(spark, root)) == want,
      "partial finalize dir was treated as committed — credits lost")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/final/batch=$horizon/_SUCCESS")))
    // and a COMPLETE finalize still short-circuits the rerun
    AttributionStream.vacuum(spark, root, horizon)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
  }

  test("vacuum crash between live delete and tmp rename loses nothing") {
    val day = 86400000L
    val all = Seq(
      ev(1, 1, 1 * day, "view"),
      ev(2, 1, 2 * day, "purchase"),       // old: finalized
      ev(3, 1, 30 * day, "click"),
      ev(4, 1, 31 * day, "purchase"),      // recent: must SURVIVE the crash
      ev(5, 2, 29 * day, "view"))
    val root = Files.createTempDirectory("attrcrash").toString
    AttributionStream.ingestBatch(toDf(all), 0L, root, Touch, Conv)
    val want = batchAnswer(all)
    AttributionStream.vacuum(spark, root, 20 * day * 1000L)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
    // Manufacture the exact mid-swap crash state for BOTH tables: the
    // completed compaction (with its _SUCCESS) sits in <name>.tmp, the
    // live dir is already deleted, the rename never ran. Before the
    // recovery rule, a vacuum rerun recomputed kept rows from the empty
    // live dir and overwrote the tmp with an empty frame — permanently
    // losing every live conversion and touch.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    for (name <- Seq("conv", "touch")) {
      val live = new org.apache.hadoop.fs.Path(s"$root/$name")
      fs.rename(new org.apache.hadoop.fs.Path(s"$root/$name/batch=compacted"),
        new org.apache.hadoop.fs.Path(s"$root/$name.tmp"))
      fs.delete(live, true)
    }
    // the rerun must install the leftover tmps instead of recomputing
    AttributionStream.vacuum(spark, root, 20 * day * 1000L)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
    val liveTouches = spark.read.parquet(s"$root/touch/batch=compacted")
      .collect().map(_.getLong(2)).toSet
    assert(liveTouches == Set(3L, 5L), "live touches survived the crash")
    // and a PARTIAL leftover tmp (crash mid-write, no _SUCCESS — live
    // still intact) is discarded, not installed
    val junk = new org.apache.hadoop.fs.Path(s"$root/touch.tmp/part-junk")
    val out = fs.create(junk); out.writeBytes("partial"); out.close()
    AttributionStream.vacuum(spark, root, 20 * day * 1000L)
    assert(rows(AttributionStream.creditView(spark, root)) == want)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/touch.tmp")))
  }

  test("streaming wiring: foreachBatch reaches the same frame") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.attribution(events, Touch, Conv))
    val root = Files.createTempDirectory("attrwire").toString
    val src = s"$root/src"
    events.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = AttributionStream.start(stream, s"$root/state",
      s"$root/ckpt", Touch, Conv)
    try q.processAllAvailable() finally q.stop()
    assert(rows(AttributionStream.creditView(spark, s"$root/state"))
      == want)
  }
}
