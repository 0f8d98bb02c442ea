package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows
import graft.streaming.ActiveUsersStream

/** The streaming active-users view must equal the batch w_active_users
  * frame over the union of everything ingested under ANY batch split —
  * including a late event in an old day retroactively joining earlier
  * trailing windows AND materializing a previously-unobserved report
  * day — replay idempotently, and reach the same frame through the
  * foreachBatch wiring.
  */
class ActiveUsersStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val day = 86400000L

  private def ev(id: Long, user: Long, ms: Long) =
    (id, new Timestamp(ms), user, "view", 1.0)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def rows(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("late event in an old day retroactively fills earlier windows") {
    val all = Seq(
      ev(1, 1, 10 * day),
      ev(2, 2, 12 * day),
      ev(3, 3, 8 * day))   // LATE: arrives in batch 1
    val root = Files.createTempDirectory("daustream").toString
    ActiveUsersStream.ingestBatch(toDf(all.filterNot(_._1 == 3L)), 0L, root)
    val before = rows(ActiveUsersStream.activeUsers(spark, root))
    // only days 10 and 12 observed so far
    assert(before == Map(10L -> 1L, 12L -> 2L), s"got $before")
    // the late day-8 event: (a) report day 8 now EXISTS, (b) user 3
    // joins days 10-14 trailing windows retroactively — day 10's count
    // flips 1 → 2 and day 12's 2 → 3
    ActiveUsersStream.ingestBatch(toDf(all.filter(_._1 == 3L)), 1L, root)
    val after = rows(ActiveUsersStream.activeUsers(spark, root))
    assert(after == rows(EventWindows.rollingActiveUsers(toDf(all), 7)),
      s"got $after")
    assert(after == Map(8L -> 1L, 10L -> 2L, 12L -> 3L))
    // at-least-once replay: the union merge absorbs it
    ActiveUsersStream.ingestBatch(toDf(all.filter(_._1 == 3L)), 1L, root)
    assert(rows(ActiveUsersStream.activeUsers(spark, root)) == after)
  }

  test("3-way split of the fixture corpus equals the batch answer") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.rollingActiveUsers(events, 7))
    val root = Files.createTempDirectory("daucorpus").toString
    (0 until 3).foreach(i => ActiveUsersStream.ingestBatch(
      events.filter(col("event_id") % 3 === i), i.toLong, root))
    assert(rows(ActiveUsersStream.activeUsers(spark, root)) == want)
  }

  test("streaming wiring: foreachBatch reaches the same frame") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = rows(EventWindows.rollingActiveUsers(events, 7))
    val root = Files.createTempDirectory("dauwire").toString
    val src = s"$root/src"
    events.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = ActiveUsersStream.start(stream, s"$root/state", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(rows(ActiveUsersStream.activeUsers(spark, s"$root/state"))
      == want)
  }
}
