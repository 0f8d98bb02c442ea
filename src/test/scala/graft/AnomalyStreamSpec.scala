package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows
import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.{CountEvent, HourFlag}

/** Streaming anomaly flags: exactness under batch splits — including a
  * late event landing in a BASELINE hour that retroactively CLEARS a
  * later hour's flag — and equivalence with the batch operator over the
  * full history.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def run(batches: Seq[Seq[CountEvent]],
      collectAfterEach: Boolean = false): Seq[Map[(String, Long), (Long, Option[Long], Boolean)]] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("sanomaly").toString
    val name = s"sanomaly_${System.nanoTime()}"
    batches.head.toDS().write.mode("append").parquet(dir)
    val ds = spark.readStream.schema(implicitly[
        org.apache.spark.sql.Encoder[CountEvent]].schema)
      .parquet(dir).as[CountEvent]
    val q = AnomalyStream.hourlyFlags(ds, spark, baseline = 3)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    def current(): Map[(String, Long), (Long, Option[Long], Boolean)] =
      // update mode appends each emission; last row per key is current
      spark.table(name).as[HourFlag].collect().zipWithIndex
        .groupBy(r => (r._1.eventType, r._1.hourBucket))
        .map { case (k, rows) =>
          val r = rows.maxBy(_._2)._1
          k -> (r.n, r.baselineSum, r.flagged)
        }
    val snaps = Seq.newBuilder[Map[(String, Long), (Long, Option[Long], Boolean)]]
    try {
      q.processAllAvailable()
      if (collectAfterEach) snaps += current()
      batches.tail.foreach { b =>
        b.toDS().write.mode("append").parquet(dir)
        q.processAllAvailable()
        if (collectAfterEach) snaps += current()
      }
      if (!collectAfterEach) snaps += current()
    } finally q.stop()
    snaps.result()
  }

  private def ev(typ: String, h: Long, k: Int): Seq[CountEvent] =
    Seq.tabulate(k)(i => CountEvent(typ, h * 3600L + i))

  test("late event in a baseline hour retroactively clears a spike flag") {
    // constant baseline 2,2,2 then 4: zero variance → flagged.
    val b1 = ev("click", 0, 2) ++ ev("click", 1, 2) ++ ev("click", 2, 2) ++
      ev("click", 3, 4)
    // two LATE events for hour 1: baseline 2,4,2 now has variance —
    // (3·4−8)²=16 ≤ 4·(3·24−64)=32 → the hour-3 flag must clear.
    val b2 = Seq(CountEvent("click", 3600L + 100), CountEvent("click", 3600L + 200))
    val snaps = run(Seq(b1, b2), collectAfterEach = true)
    assert(snaps(0)(("click", 3L)) == (4L, Some(6L), true))
    assert(snaps(1)(("click", 3L)) == (4L, Some(8L), false))
    assert(snaps(1)(("click", 1L)) == (4L, None, false))
  }

  test("stream over adversarial splits equals the batch operator") {
    import spark.implicits._
    val events =
      ev("click", 0, 2) ++ ev("click", 1, 3) ++ ev("click", 2, 2) ++
        ev("click", 3, 9) ++ ev("click", 4, 2) ++ ev("click", 5, 2) ++
        ev("view", 10, 5) ++ ev("view", 11, 5) ++ ev("view", 12, 5) ++
        ev("view", 13, 5) ++ ev("view", 14, 6)
    // interleave by parity: every hour's count is split across batches
    val (b1, b2) = events.zipWithIndex.partition(_._2 % 2 == 0)
    val got = run(Seq(b1.map(_._1), b2.map(_._1))).head
    val batch = EventWindows.hourlyAnomalies(
      events.map(e => (e.eventType, new Timestamp(e.tsSec * 1000L)))
        .toDF("event_type", "ts"), baseline = 3)
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
            r.getBoolean(4)))
      }.toMap
    assert(got == batch)
    // non-vacuous: the click spike at hour 3 is flagged in both
    assert(got(("click", 3L))._3)
  }
}
