package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NoveltyStream

/** The streaming novelty twin's contract: the latest-emission view
  * equals the batch operator on the union of all batches under ANY
  * split — including a LATE-arriving smaller doc_id stealing a first
  * occurrence retroactively — and replays are idempotent.
  */
class NoveltyStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def fixture(): DataFrame =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")

  /** Batch-operator ground truth on an arbitrary doc set, via the
    * registered query against a temp table dir.
    */
  private def batchTruth(docs: DataFrame): Map[Long, (Long, Long, Long)] = {
    val dir = tmp("nv_truth")
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("srcA").as("source"), length(col("text")).cast("long")
          .as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("t_ngram_novelty")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_micro")))).toMap
  }

  private def viewOf(outPath: String): Map[Long, (Long, Long, Long)] =
    NoveltyStream.latestOutput(spark, outPath).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_micro")))).toMap

  test("3-way id-ordered split equals the batch operator on the union") {
    val (idx, out) = (tmp("nv_idx"), tmp("nv_out"))
    val docs = fixture()
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") < 150), 0, idx, out)
    NoveltyStream.ingestBatch(
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), 1, idx, out)
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") >= 300), 2, idx, out)
    assert(viewOf(out) == batchTruth(docs))
  }

  test("a late smaller doc_id retroactively re-emits the old holder") {
    val (idx, out) = (tmp("nv_idx2"), tmp("nv_out2"))
    val docs = fixture().filter(col("doc_id") < 200)
    // ARRIVAL order inverts id order: the 100-199 slice lands first
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") >= 100), 0, idx, out)
    val early = viewOf(out)
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") < 100), 1, idx, out)
    val fin = viewOf(out)
    val truth = batchTruth(docs)
    assert(fin == truth)
    // non-vacuous: at least one doc of the first batch was corrected
    // downward by the late arrivals (the fixture corpus shares trigrams
    // across docs, so some first occurrences move to smaller ids)
    val corrected = early.keySet.filter(id =>
      early(id) != fin(id))
    assert(corrected.nonEmpty,
      "late smaller ids must steal at least one first occurrence")
    corrected.foreach { id =>
      assert(fin(id)._2 < early(id)._2, s"doc $id must lose novel grams")
    }
  }

  test("replaying the last batch is idempotent") {
    val (idx, out) = (tmp("nv_idx3"), tmp("nv_out3"))
    val docs = fixture().filter(col("doc_id") < 100)
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") < 50), 0, idx, out)
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") >= 50), 1, idx, out)
    val before = viewOf(out)
    NoveltyStream.ingestBatch(docs.filter(col("doc_id") >= 50), 1, idx, out)
    assert(viewOf(out) == before)
    assert(before == batchTruth(docs))
  }
}
