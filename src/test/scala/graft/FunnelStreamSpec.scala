package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FunnelEvent, UserFunnel}

/** Streaming funnel: exactness under batch splits and arrival order —
  * including the late-arriving early event a chain-only state could not
  * recover — and equivalence with the batch funnel over the full
  * history.
  */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val stages = Seq("signup", "view", "click", "purchase")

  private def run(batches: Seq[Seq[FunnelEvent]]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("sfunnel").toString
    val name = s"sfunnel_${System.nanoTime()}"
    batches.head.toDS().write.mode("append").parquet(dir)
    val ds = spark.readStream.schema(implicitly[
        org.apache.spark.sql.Encoder[FunnelEvent]].schema)
      .parquet(dir).as[FunnelEvent]
    val q = FunnelStream.funnelStages(ds, stages, spark)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        b.toDS().write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
    } finally q.stop()
    // update mode appends each emission; last row per user is current
    spark.table(name).as[UserFunnel].collect().zipWithIndex
      .groupBy(_._1.userId)
      .map { case (u, rows) => u -> rows.maxBy(_._2)._1.stageTs }
  }

  test("late-arriving signup re-anchors the chain retroactively") {
    // batch 1 delivers the purchase-side tail; batch 2 the signup that
    // happened FIRST. Chain-only state would have dropped the funnel.
    val b1 = Seq(FunnelEvent(1L, "view", 20L), FunnelEvent(1L, "click", 30L),
      FunnelEvent(1L, "purchase", 40L))
    val b2 = Seq(FunnelEvent(1L, "signup", 10L))
    val got = run(Seq(b1, b2))
    assert(got(1L) == Seq(10L, 20L, 30L, 40L))
    // and the earlier emission (before the signup arrived) was empty
  }

  test("stream over split batches equals the batch funnel per user") {
    val events = Seq(
      (1L, "signup", 0L), (1L, "view", 1L), (1L, "click", 2L),
      (2L, "purchase", 0L), (2L, "signup", 5L), (2L, "view", 6L),
      (3L, "view", 0L), (3L, "signup", 1L),
      (4L, "signup", 0L), (4L, "click", 1L), (4L, "view", 2L),
      (4L, "click", 3L), (4L, "purchase", 9L),
      (5L, "view", 0L), (5L, "click", 1L), (5L, "purchase", 2L))
      .map { case (u, t, ts) => FunnelEvent(u, t, ts) }
    // adversarial split: interleave by index parity, so most users have
    // events in both batches, in neither original order
    val (b1, b2) = events.zipWithIndex.partition(_._2 % 2 == 0)
    val got = run(Seq(b1.map(_._1), b2.map(_._1)))
    // sequential ground truth over the full history
    val want = events.groupBy(_.userId).flatMap { case (u, es) =>
      val lists = stages.map(st =>
        es.filter(_.eventType == st).map(_.tsUs).sorted)
      val c = FunnelStream.chain(lists)
      if (c.nonEmpty) Some(u -> c) else None
    }
    // users who never complete stage 1 emit an empty vector
    assert(got.filter(_._2.nonEmpty) == want.filter(_._2.nonEmpty))
    // stage counts match the batch funnel semantics: users 1-4 signed
    // up, 3 progressed to view, 2 to click, 1 to purchase
    val counts = (0 until stages.size).map(i =>
      got.values.count(_.size > i))
    assert(counts == Seq(4, 3, 2, 1), s"got $counts")
  }
}
