package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Preference
import graft.streaming.PreferenceStream

/** The streaming preference twin's views must EQUAL the batch
  * `p_preference_pairs` / `p_preference_rank` over the union of
  * everything ingested, under any batch split and arrival order —
  * including a late-arriving event that retroactively DISPLACES a
  * previously-paired event from its group's 16-smallest capped set —
  * and survive replay and compaction unchanged (the k-smallest
  * semilattice law both rest and motion rely on).
  */
class PreferenceStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def events: DataFrame = Tables.events(spark, sf)

  private def pairRows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq

  private def rankRows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  private lazy val wantPairs = pairRows(Preference.pairMatrix(events))
  private lazy val wantRank = rankRows(Preference.typeRank(events))

  private def ciRows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq

  private lazy val wantCi = ciRows(Preference.rankCi(events))

  test("3-batch stream views equal the batch operators and replay " +
      "idempotently") {
    val root = Files.createTempDirectory("prefstream").toString
    val batches = (0 until 3).map(i =>
      events.filter(col("event_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      PreferenceStream.ingestBatch(b, i.toLong, root)
    }
    assert(pairRows(PreferenceStream.pairsView(spark, root)) == wantPairs)
    assert(rankRows(PreferenceStream.rankView(spark, root)) == wantRank)
    // at-least-once replay: re-running batch 1 must change nothing
    PreferenceStream.ingestBatch(batches(1), 1L, root)
    assert(pairRows(PreferenceStream.pairsView(spark, root)) == wantPairs)
  }

  test("split invariance: 1-batch and 5-batch ingests produce identical " +
      "views; compaction changes nothing") {
    def run(n: Int): String = {
      val root = Files.createTempDirectory(s"prefsplit$n").toString
      (0 until n).foreach(i => PreferenceStream.ingestBatch(
        events.filter(col("event_id") % n === i), i.toLong, root))
      root
    }
    val r1 = run(1)
    val r5 = run(5)
    assert(pairRows(PreferenceStream.pairsView(spark, r1)) == wantPairs)
    assert(pairRows(PreferenceStream.pairsView(spark, r5)) == wantPairs)
    // the CI view inherits the merge law for free (deterministic
    // per-match bootstrap weights over re-derived matches): lo/hi micro
    // bounds equal the batch a_preference_ci under both splits
    assert(ciRows(PreferenceStream.ciView(spark, r1)) == wantCi)
    assert(ciRows(PreferenceStream.ciView(spark, r5)) == wantCi)
    // fold the committed partitions of the 5-batch run; views unchanged
    PreferenceStream.compact(spark, r5)
    assert(pairRows(PreferenceStream.pairsView(spark, r5)) == wantPairs)
    assert(rankRows(PreferenceStream.rankView(spark, r5)) == wantRank)
    assert(ciRows(PreferenceStream.ciView(spark, r5)) == wantCi)
    // compaction really folded: ≤ 2 live partitions remain
    val live = new java.io.File(r5).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(live.length <= 2, s"got ${live.map(_.getName).toSeq}")
  }

  test("a late small-(ts, id) event displaces a capped event " +
      "retroactively — stream equals batch on the union") {
    def ev(id: Long, sec: Long, tpe: String, value: Double) =
      (id, new Timestamp(sec * 1000L), 1L, tpe, value)
    def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    // batch 0 fills the cap: 16 events T01..T16 at seconds 100..115,
    // T16 with the HIGHEST value (it wins every match it is in, so its
    // disappearance is visible in every pair row it touched)
    val first = (1 to 16).map(i =>
      ev(i.toLong, 99L + i, f"T$i%02d", if (i == 16) 99.0 else i.toDouble))
    // batch 1 arrives LATE with an earlier ts — it displaces T16
    // (largest (ts, id) of the current 16) from the capped set, so all
    // of T16's matches must disappear from the cumulative view
    val late = Seq(ev(100L, 50L, "T00", 0.5))
    val root = Files.createTempDirectory("preflate").toString
    PreferenceStream.ingestBatch(toDf(first), 0L, root)
    PreferenceStream.ingestBatch(toDf(late), 1L, root)
    val got = pairRows(PreferenceStream.pairsView(spark, root))
    val want = pairRows(Preference.pairMatrix(toDf(first ++ late)))
    assert(got == want)
    assert(!got.exists(r => r._1 == "T16" || r._2 == "T16"),
      "displaced event still pairing")
    assert(got.exists(r => r._1 == "T00"), "late event not pairing")
  }

  test("streaming wiring: the foreachBatch runner reaches the same " +
      "views as direct ingestBatch calls") {
    val root = Files.createTempDirectory("prefwire").toString
    val src = s"$root/src"
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    events.select(cols.map(col): _*).write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(events.select(cols.map(col): _*).schema).parquet(src)
    val q = PreferenceStream.start(stream, s"$root/state", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(pairRows(PreferenceStream.pairsView(spark, s"$root/state"))
      == wantPairs)
    assert(rankRows(PreferenceStream.rankView(spark, s"$root/state"))
      == wantRank)
  }
}
