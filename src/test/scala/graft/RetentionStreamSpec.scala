package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows
import graft.streaming.RetentionStream

/** The streaming retention view must equal the batch w_retention frame
  * over the union of everything ingested under ANY batch split —
  * including a LATE cohort event from an earlier week retroactively
  * re-cohorting a user (moving every one of their matrix contributions
  * at once) — replay idempotently, and reach the same frame through
  * the foreachBatch wiring.
  */
class RetentionStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val Cohort = "signup"
  private val week = 604800000L // ms

  private def ev(id: Long, user: Long, ms: Long, tpe: String) =
    (id, new Timestamp(ms), user, tpe, 1.0)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def rows(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("late cohort event retroactively re-cohorts the user") {
    val all = Seq(
      ev(1, 1, 1 * week, "signup"),    // LATE: arrives in batch 1
      ev(2, 1, 3 * week, "signup"),
      ev(3, 1, 4 * week, "click"),
      ev(4, 2, 3 * week, "signup"),
      ev(5, 2, 4 * week, "view"))
    val root = Files.createTempDirectory("retstream").toString
    // batch 0: everything EXCEPT user 1's week-1 signup
    RetentionStream.ingestBatch(
      toDf(all.filterNot(_._1 == 1L)), 0L, root, Cohort)
    val before = rows(RetentionStream.retention(spark, root))
    // both users cohort at week 3 so far
    assert(before == rows(EventWindows.cohortRetention(
      toDf(all.filterNot(_._1 == 1L)), Cohort)))
    assert(before((3L, 0L)) == 2L && before((3L, 1L)) == 2L)
    // batch 1: the late week-1 signup lowers user 1's cohort week from
    // 3 to 1 — their offsets become 0 (wk1? no activity), 2, 3: every
    // contribution moves, which per-cell counters could not replay
    RetentionStream.ingestBatch(toDf(all.filter(_._1 == 1L)), 1L,
      root, Cohort)
    val after = rows(RetentionStream.retention(spark, root))
    assert(after == rows(EventWindows.cohortRetention(toDf(all), Cohort)),
      s"got $after")
    assert(after((1L, 2L)) == 1L && after((1L, 3L)) == 1L,
      "user 1 re-cohorted to week 1")
    assert(after((3L, 0L)) == 1L && after((3L, 1L)) == 1L,
      "week-3 cohort no longer counts user 1")
    // at-least-once replay: re-running batch 1 changes nothing (the
    // merge statistics are idempotent even without the partition
    // overwrite, but both layers are exercised here)
    RetentionStream.ingestBatch(toDf(all.filter(_._1 == 1L)), 1L,
      root, Cohort)
    assert(rows(RetentionStream.retention(spark, root)) == after)
  }

  test("3-way split of the fixture corpus equals the batch answer") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.cohortRetention(events, Cohort))
    val root = Files.createTempDirectory("retcorpus").toString
    (0 until 3).foreach(i => RetentionStream.ingestBatch(
      events.filter(col("event_id") % 3 === i), i.toLong, root, Cohort))
    assert(rows(RetentionStream.retention(spark, root)) == want)
  }

  test("streaming wiring: foreachBatch reaches the same frame") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.cohortRetention(events, Cohort))
    val root = Files.createTempDirectory("retwire").toString
    val src = s"$root/src"
    events.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = RetentionStream.start(stream, s"$root/state",
      s"$root/ckpt", Cohort)
    try q.processAllAvailable() finally q.stop()
    assert(rows(RetentionStream.retention(spark, s"$root/state")) == want)
  }
}
