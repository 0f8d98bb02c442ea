package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.KinesisRecord
import graft.streaming.{JsonRecordSource, StatefulSessions}

/** Custom-state sessionization (flatMapGroupsWithState) + the JSON-lines
  * record source.
  */
class StatefulSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def rec(key: String, seq: Long, epochSec: Long): KinesisRecord =
    KinesisRecord(seq.toString.getBytes("UTF-8"), key, seq.toString,
      new Timestamp(epochSec * 1000), "None")

  test("late cross-batch record never rewinds the session clock") {
    val gap = 10000L
    // batch 1: activity at t=100s
    val (s1, c1) = StatefulSessions.foldRecords("k", None,
      Iterator(rec("k", 1, 100)), gap)
    assert(c1.isEmpty && s1.get.lastTs == 100000L)
    // batch 2: a LATE record at t=95s, then t=106s. 106s is 6s after the
    // real last activity (100s) — same session. A fold that rewound
    // lastTs to 95s would see an 11s gap and wrongly split (emitting
    // sessionEnd=95s, BEFORE activity already folded in at 100s).
    val (s2, c2) = StatefulSessions.foldRecords("k", s1,
      Iterator(rec("k", 2, 95), rec("k", 3, 106)), gap)
    assert(c2.isEmpty, s"spurious split: $c2")
    val s = s2.get
    assert(s.lastTs == 106000L && s.start == 95000L && s.n == 3)
  }

  test("flatMapGroupsWithState closes sessions on gap, keeps the open one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess").toString
    val base = 1700000000L
    // key a: 3 events close together, a 1-hour gap, then 2 more
    //   → first session (n=3) closes when the post-gap event arrives;
    //     second session stays OPEN in state (no later event closes it)
    // key b: single burst → stays open, nothing emitted
    val recs = Seq(
      rec("a", 1, base), rec("a", 2, base + 60), rec("a", 3, base + 120),
      rec("a", 4, base + 3720), rec("a", 5, base + 3780),
      rec("b", 6, base), rec("b", 7, base + 30))
    recs.toDS().write.mode("overwrite").parquet(dir)

    val ds = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
      .as[KinesisRecord]
    val q = StatefulSessions.sessionize(ds, gapMillis = 600000L, spark,
        idleTimeout = false)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try q.processAllAvailable() finally q.stop()

    val closed = spark.table("sessions")
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    // only key a's FIRST session closed (by the post-gap record);
    // open sessions await the processing-time timeout
    assert(closed == Seq(("a", 3L)))
  }

  test("transformWithState sessionization agrees with the v1 operator") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sessv2").toString
    val base = 1700000000L
    val recs = Seq(
      rec("a", 1, base), rec("a", 2, base + 60), rec("a", 3, base + 120),
      rec("a", 4, base + 3720), rec("a", 5, base + 3780),
      rec("b", 6, base), rec("b", 7, base + 30),
      rec("b", 8, base + 4000)) // closes b's first session (n=2)
    recs.toDS().write.mode("overwrite").parquet(dir)

    // transformWithState requires the RocksDB state-store provider
    val saved = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      def ds = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
        .as[KinesisRecord]
      val q2 = graft.streaming.StatefulSessionsV2
        .sessionize(ds, gapMillis = 600000L, spark, timers = false)
        .writeStream.outputMode("append").format("memory")
        .queryName("sessions_v2").start()
      try q2.processAllAvailable() finally q2.stop()
      val q1 = StatefulSessions
        .sessionize(ds, gapMillis = 600000L, spark, idleTimeout = false)
        .writeStream.outputMode("append").format("memory")
        .queryName("sessions_v1_same").start()
      try q1.processAllAvailable() finally q1.stop()
      def rows(t: String) = spark.table(t).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      val v2 = rows("sessions_v2")
      // full-row agreement with v1 ON THE SAME INPUT, plus the expected
      // closures: a's first burst (3) and b's first burst (2); the
      // post-gap singletons stay open in state
      assert(v2 == rows("sessions_v1_same"))
      assert(v2.map(r => (r._1, r._4)) == Set(("a", 3L), ("b", 2L)))
    } finally saved match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState timers flush only genuinely idle sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val saved = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[KinesisRecord]
      val gap = 5000L
      val q = graft.streaming.StatefulSessionsV2
        .sessionize(mem.toDS(), gap, spark, timers = true)
        .writeStream.outputMode("append").format("memory")
        .queryName("sessions_timer").start()
      try {
        // three records spread over ~2 s of processing time, all within
        // the event-time gap: stale timers from the first two batches
        // expire DURING the session — a premature close would split it.
        // NO processAllAvailable here: armed timers keep scheduling
        // batches, so it never quiesces — poll the sink instead.
        val base = 1700000000L
        mem.addData(rec("k", 1, base)); Thread.sleep(1000)
        mem.addData(rec("k", 2, base + 1)); Thread.sleep(1000)
        mem.addData(rec("k", 3, base + 2))
        // now idle: the final timer (last activity + gap) must flush ONE
        // session carrying all three records. Generous deadline: under
        // full-suite contention (32 busy threads, RocksDB state store)
        // the timer batch has been observed to take over a minute to
        // fire — the poll returns as soon as the row lands, so the
        // deadline only costs time when the flush is genuinely missing.
        val deadline = System.currentTimeMillis() + 180000
        var rows = Array.empty[(String, Long)]
        while (rows.isEmpty && System.currentTimeMillis() < deadline) {
          Thread.sleep(500)
          rows = spark.table("sessions_timer").collect()
            .map(r => (r.getString(0), r.getLong(3)))
        }
        assert(rows.toSeq == Seq(("k", 3L)),
          s"expected one idle-flushed session of 3, got ${rows.toSeq}")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("JSON-lines source round-trips the envelope") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonsrc").toString
    val recs = Seq(rec("k1", 1, 1700000000L), rec("k2", 2, 1700000100L))
    recs.toDS().write.mode("overwrite").json(dir) // one JSON object per line
    val q = new JsonRecordSource(dir).stream(spark)
      .writeStream.outputMode("append").format("memory")
      .queryName("jsonsrc").start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.table("jsonsrc").collect()
    assert(back.length == 2)
    val keys = back.map(_.getAs[String]("partitionKey")).toSet
    assert(keys == Set("k1", "k2"))
    val bodies = back.map(r =>
      new String(r.getAs[Array[Byte]]("data"), "UTF-8")).toSet
    assert(bodies == Set("1", "2")) // binary survives the base64 round-trip
  }
}
