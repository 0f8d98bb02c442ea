package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Calibration
import graft.streaming.CalibrationStream

/** The streaming AUC view must equal the batch rankAuc frame over the
  * union of everything ingested under ANY batch split — the midrank
  * statistic is a pure function of the merged (source, score) counts,
  * so no split or arrival order can perturb it — replay idempotently,
  * and preserve the one-class NULL contract.
  */
class CalibrationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Map[String, (Long, Long, Option[Long])] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("3-way split of the fixture corpus equals the batch answer") {
    val docs = Tables.documents(spark, sf)
    val want = rows(Calibration.rankAuc(docs))
    val root = Files.createTempDirectory("calstream").toString
    (0 until 3).foreach(i => CalibrationStream.ingestBatch(
      docs.filter(col("doc_id") % 3 === i), i.toLong, root))
    val got = rows(CalibrationStream.auc(spark, root))
    assert(got == want, s"stream $got\nbatch  $want")
    // at-least-once replay: re-running batch 1 overwrites its own
    // partition and changes nothing
    CalibrationStream.ingestBatch(
      docs.filter(col("doc_id") % 3 === 1), 1L, root)
    assert(rows(CalibrationStream.auc(spark, root)) == want)
  }

  test("one-class sources yield NULL auc_micro, like the batch twin") {
    val docs = Tables.documents(spark, sf)
    // keep only each source's POSITIVE docs — every source becomes
    // one-class, so n_neg = 0 and the AUC is undefined on both twins
    val posIds = Calibration.scoredDocs(docs)
      .filter(col("truth")).select("doc_id")
    val posDocs = docs.join(posIds, "doc_id")
    val root = Files.createTempDirectory("calstream1c").toString
    CalibrationStream.ingestBatch(posDocs, 0L, root)
    val got = rows(CalibrationStream.auc(spark, root))
    assert(got.nonEmpty)
    for ((src, (nPos, nNeg, auc)) <- got) {
      assert(nPos > 0 && nNeg == 0L, s"$src not one-class: $nPos/$nNeg")
      assert(auc.isEmpty, s"$src: expected NULL auc, got $auc")
    }
    assert(got == rows(Calibration.rankAuc(posDocs)))
  }

  test("streaming wiring: foreachBatch reaches the same frame") {
    val docs = Tables.documents(spark, sf)
    val want = rows(Calibration.rankAuc(docs))
    val root = Files.createTempDirectory("calwire").toString
    val src = s"$root/src"
    docs.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = CalibrationStream.start(stream, s"$root/state",
      s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(rows(CalibrationStream.auc(spark, s"$root/state")) == want)
  }
}
