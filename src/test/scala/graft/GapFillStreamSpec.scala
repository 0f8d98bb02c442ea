package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EventWindows
import graft.streaming.GapFillStream

/** Streaming gap-fill: any split of the event stream into batches must
  * re-derive EXACTLY the batch operator's answer (counts are additive,
  * the densifier is shared code), a late batch carrying older hours
  * extends the grid retroactively, and replaying a batch is a no-op.
  */
class GapFillStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("event_type", "hour", "n").collect()
      .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}")
      .sorted.toSeq

  test("3-way split-stream view == batch w_gapfill on the fixture, " +
      "and the smoothed view == batch w_ema") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val out = java.nio.file.Files
      .createTempDirectory("gapfill_stream").toString
    for (b <- 0 until 3)
      GapFillStream.ingestBatch(
        ev.filter(pmod(col("event_id"), lit(3)) === b), b.toLong, out)
    assert(canon(GapFillStream.view(spark, out)) ==
      canon(EventWindows.gapFillHourly(ev)))
    def canonEma(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("event_type", "hour", "n", "ema").collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|" +
          s"${r.getLong(2)}|${r.getDouble(3)}").sorted.toSeq
    assert(canonEma(GapFillStream.emaView(spark, out)) ==
      canonEma(EventWindows.emaHourly(ev)))
    def canonCusum(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("event_type", "hour", "n", "s_micro", "flagged")
        .collect().map(r => s"${r.getString(0)}|${r.getString(1)}|" +
          s"${r.getLong(2)}|${r.getLong(3)}|${r.getBoolean(4)}")
        .sorted.toSeq
    assert(canonCusum(GapFillStream.cusumView(spark, out)) ==
      canonCusum(EventWindows.cusumHourly(ev)))
    def canonSeasonal(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("event_type", "hour", "n", "how", "others_sum",
          "others_cnt", "flagged")
        .collect().map(r => s"${r.getString(0)}|${r.getString(1)}|" +
          s"${r.getLong(2)}|${r.getLong(3)}|${r.getLong(4)}|" +
          s"${r.getLong(5)}|${r.getBoolean(6)}")
        .sorted.toSeq
    assert(canonSeasonal(GapFillStream.seasonalView(spark, out)) ==
      canonSeasonal(EventWindows.seasonalAnomalies(ev)))
    // adaptive spike flags — the SAME emaAnomalyFromCounts fold
    def canonFlag(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("event_type", "hour", "n", "flagged").collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|" +
          s"${r.getLong(2)}|${r.getBoolean(3)}").sorted.toSeq
    assert(canonFlag(GapFillStream.emaAnomalyView(spark, out)) ==
      canonFlag(SparkEntry.queries("w_ema_anomaly")(spark, d)))
    // two-sided CUSUM — the same (k = μ/4, h = 4μ) parameterization
    def canonTwo(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("event_type", "hour", "n", "s_micro", "flagged",
          "lo_micro", "flagged_lo")
        .collect().map(r => s"${r.getString(0)}|${r.getString(1)}|" +
          s"${r.getLong(2)}|${r.getLong(3)}|${r.getBoolean(4)}|" +
          s"${r.getLong(5)}|${r.getBoolean(6)}").sorted.toSeq
    assert(canonTwo(GapFillStream.cusumTwoSidedView(spark, out)) ==
      canonTwo(SparkEntry.queries("w_cusum_twosided")(spark, d)))
  }

  test("a late batch with OLDER hours extends the grid retroactively; " +
      "replaying a batch changes nothing") {
    import spark.implicits._
    def evDf(rows: Seq[(String, String)]) =
      rows.toDF("event_type", "ts0")
        .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val out = java.nio.file.Files
      .createTempDirectory("gapfill_late").toString
    GapFillStream.ingestBatch(evDf(Seq(
      ("click", "2024-03-01 12:10:00"),
      ("click", "2024-03-01 14:10:00"))), 0L, out)
    val before = canon(GapFillStream.view(spark, out))
    assert(before.length == 3, s"hours 12..14: $before") // 12, 13(0), 14
    // late batch: hour 10 arrives after hour 14 was already current
    GapFillStream.ingestBatch(evDf(Seq(
      ("click", "2024-03-01 10:59:59"))), 1L, out)
    val after = canon(GapFillStream.view(spark, out)) // materialized NOW
    val m = after.map(_.split('|')).map(a => a(1) -> a(2).toLong).toMap
    assert(m.size == 5, s"grid must now span 10..14: $m")
    assert(m("2024-03-01 11:00:00") == 0L, "retroactive interior zero")
    assert(m("2024-03-01 10:00:00") == 1L)
    // replay batch 1 (idempotent overwrite)
    GapFillStream.ingestBatch(evDf(Seq(
      ("click", "2024-03-01 10:59:59"))), 1L, out)
    assert(canon(GapFillStream.view(spark, out)) == after)
  }
}
