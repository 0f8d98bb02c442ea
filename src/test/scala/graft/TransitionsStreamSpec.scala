package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows
import graft.streaming.TransitionsStream

/** The streaming transition-count view must equal the batch
  * w_transitions frame over the union of everything ingested under ANY
  * batch split — including a LATE event inserted between two
  * already-paired events SPLITTING their transition — replay
  * idempotently, and stay exact across the finalize-then-vacuum
  * compaction including the cross-horizon transition.
  */
class TransitionsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def ev(id: Long, user: Long, ms: Long, tpe: String) =
    (id, new Timestamp(ms), user, tpe, 1.0)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def rows(df: DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("late event inserted between a pair splits their transition") {
    val hour = 3600000L
    val all = Seq(
      ev(1, 1, 1 * hour, "view"),
      ev(2, 1, 2 * hour, "click"),    // LATE: arrives in batch 1
      ev(3, 1, 3 * hour, "purchase"),
      ev(4, 2, 1 * hour, "view"),
      ev(5, 2, 2 * hour, "view"))
    val root = Files.createTempDirectory("transtream").toString
    TransitionsStream.ingestBatch(
      toDf(all.filterNot(_._1 == 2L)), 0L, root)
    val before = rows(TransitionsStream.counts(spark, root))
    assert(before((("view", "purchase"))) == 1L, s"got $before")
    // the late click lands BETWEEN view@1h and purchase@3h: the
    // (view → purchase) transition must DISAPPEAR and two new ones
    // appear — per-transition counters could never take one away
    TransitionsStream.ingestBatch(toDf(all.filter(_._1 == 2L)), 1L, root)
    val after = rows(TransitionsStream.counts(spark, root))
    assert(after == rows(EventWindows.transitions(toDf(all))),
      s"got $after")
    assert(!after.contains(("view", "purchase")))
    assert(after((("view", "click"))) == 1L &&
      after((("click", "purchase"))) == 1L)
    // at-least-once replay: re-running batch 1 changes nothing
    TransitionsStream.ingestBatch(toDf(all.filter(_._1 == 2L)), 1L, root)
    assert(rows(TransitionsStream.counts(spark, root)) == after)
  }

  test("3-way split of the fixture corpus equals the batch answer") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.transitions(events))
    val root = Files.createTempDirectory("transcorpus").toString
    (0 until 3).foreach(i => TransitionsStream.ingestBatch(
      events.filter(col("event_id") % 3 === i), i.toLong, root))
    assert(rows(TransitionsStream.counts(spark, root)) == want)
  }

  test("vacuum finalizes intra-horizon pairs; crossing pair stays live") {
    val hour = 3600000L
    val all = Seq(
      ev(1, 1, 1 * hour, "view"),
      ev(2, 1, 2 * hour, "click"),     // (view→click) finalized
      ev(3, 1, 10 * hour, "purchase"), // (click→purchase) CROSSES horizon
      ev(4, 2, 1 * hour, "view"),      // boundary-only user: no live pair
      ev(5, 3, 11 * hour, "view"))     // fully post-horizon user
    val root = Files.createTempDirectory("transvac").toString
    TransitionsStream.ingestBatch(toDf(all), 0L, root)
    val want = rows(EventWindows.transitions(toDf(all)))
    val horizon = 5 * hour * 1000L
    TransitionsStream.vacuum(spark, root, horizon)
    assert(rows(TransitionsStream.counts(spark, root)) == want)
    // the live table physically shrank: post-horizon rows + one
    // boundary row per pre-horizon user (ids 2 and 4), id 1 dropped
    val liveIds = spark.read.parquet(s"$root/ev/batch=compacted")
      .collect().map(_.getLong(2)).toSet
    assert(liveIds == Set(2L, 3L, 4L, 5L), s"got $liveIds")
    // idempotent horizon rerun (write-once finalize + recoverable swap)
    TransitionsStream.vacuum(spark, root, horizon)
    assert(rows(TransitionsStream.counts(spark, root)) == want)
    // post-vacuum ingest still composes: a later event for user 2
    // pairs with their kept boundary row
    TransitionsStream.ingestBatch(
      toDf(Seq(ev(6, 2, 12 * hour, "purchase"))), 1L, root)
    val extended = rows(TransitionsStream.counts(spark, root))
    assert(extended == rows(EventWindows.transitions(
      toDf(all :+ ev(6, 2, 12 * hour, "purchase")))))
  }

  test("sequential vacuums at advancing horizons never double-count") {
    // the subtle law: a transition crossing horizon h1 is NOT finalized
    // at h1 (second endpoint is post-h1, it stays live via the kept
    // boundary row) and IS finalized at h2 once both endpoints predate
    // h2 — exactly once overall. A bug either double-counts it (h1
    // finalize too eager) or loses it (boundary row not kept).
    val hour = 3600000L
    val all = Seq(
      ev(1, 1, 1 * hour, "view"),
      ev(2, 1, 2 * hour, "click"),      // (view→click): finalized at h1
      ev(3, 1, 8 * hour, "purchase"),   // (click→purchase): crosses h1
      ev(4, 1, 14 * hour, "view"))      // (purchase→view): crosses h2
    val root = Files.createTempDirectory("transvac2").toString
    TransitionsStream.ingestBatch(toDf(all), 0L, root)
    val want = rows(EventWindows.transitions(toDf(all)))
    val h1 = 5 * hour * 1000L
    val h2 = 10 * hour * 1000L
    TransitionsStream.vacuum(spark, root, h1)
    assert(rows(TransitionsStream.counts(spark, root)) == want)
    TransitionsStream.vacuum(spark, root, h2)
    assert(rows(TransitionsStream.counts(spark, root)) == want,
      "crossing transition finalized exactly once across horizons")
    // after h2 only the new boundary (purchase@8h) and post-h2 rows live
    val liveIds = spark.read.parquet(s"$root/ev/batch=compacted")
      .collect().map(_.getLong(2)).toSet
    assert(liveIds == Set(3L, 4L), s"got $liveIds")
  }

  test("crash mid-finalize (partial dir, no _SUCCESS): rerun redoes the " +
      "finalize instead of treating the partial dir as committed") {
    val hour = 3600000L
    val all = Seq(
      ev(1, 1, 1 * hour, "view"),
      ev(2, 1, 2 * hour, "click"),     // (view→click) should finalize
      ev(3, 1, 10 * hour, "purchase"))
    val root = Files.createTempDirectory("transpartial").toString
    TransitionsStream.ingestBatch(toDf(all), 0L, root)
    val want = rows(EventWindows.transitions(toDf(all)))
    val horizon = 5 * hour * 1000L
    // manufacture the crash: a finalize dir exists for this horizon but
    // the writer died mid-parquet-write — files present, no _SUCCESS.
    // The old existence-gate would skip the finalize AND compact away
    // the pre-horizon rows: (view→click) permanently lost.
    val finalPart = s"$root/final/batch=$horizon"
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(finalPart, "_temporary"))
    TransitionsStream.vacuum(spark, root, horizon)
    assert(rows(TransitionsStream.counts(spark, root)) == want,
      "partial finalize dir was treated as committed — counts lost")
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(finalPart, "_SUCCESS")))
    // a COMPLETE finalize still short-circuits: rerun is idempotent
    TransitionsStream.vacuum(spark, root, horizon)
    assert(rows(TransitionsStream.counts(spark, root)) == want)
  }

  test("vacuum survives marksuccessfuljobs=false: the sentinel is " +
      "planted explicitly, not inherited from the committer") {
    // with the committer's _SUCCESS disabled (common with cloud
    // committers) the old gate read every finalize as incomplete: a
    // rerun at an already-compacted horizon recomputed the finalize
    // from boundary-only live rows and overwrote the good data —
    // CompactSwap.ensureSuccess plants the sentinel in program order
    // so the gate is committer-independent
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prior = hconf.get(key)
    hconf.setBoolean(key, false)
    try {
      val hour = 3600000L
      val all = Seq(
        ev(1, 1, 1 * hour, "view"),
        ev(2, 1, 2 * hour, "click"),     // (view→click) finalizes
        ev(3, 1, 10 * hour, "purchase"))
      val root = Files.createTempDirectory("transnosucc").toString
      TransitionsStream.ingestBatch(toDf(all), 0L, root)
      val want = rows(EventWindows.transitions(toDf(all)))
      val horizon = 5 * hour * 1000L
      TransitionsStream.vacuum(spark, root, horizon)
      assert(rows(TransitionsStream.counts(spark, root)) == want)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/final/batch=$horizon/_SUCCESS")),
        "sentinel not planted when the committer's own is disabled")
      // the loss scenario: rerun at the compacted horizon must
      // short-circuit, not recompute from boundary-only rows
      TransitionsStream.vacuum(spark, root, horizon)
      assert(rows(TransitionsStream.counts(spark, root)) == want,
        "rerun recomputed the finalize from a compacted live dir")
    } finally {
      if (prior == null) hconf.unset(key) else hconf.set(key, prior)
    }
  }

  test("streaming wiring: foreachBatch reaches the same frame") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.transitions(events))
    val root = Files.createTempDirectory("transwire").toString
    val src = s"$root/src"
    events.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = TransitionsStream.start(stream, s"$root/state", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(rows(TransitionsStream.counts(spark, s"$root/state")) == want)
  }
}
