package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BleuEval
import graft.streaming.GenEvalStream

/** The streaming corpus BLEU/chrF/ROUGE-L view must equal the batch operators'
  * aggregation over the union of everything ingested under ANY split —
  * every pair is (doc, its own corruption), so per-batch sums partition
  * the corpus sums exactly — replay idempotently, and hold zero
  * executor cache between batches.
  */
class GenEvalStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Map[(String, Long), (Long, Long, Long,
      Long, Long)] =
    df.collect().map(r => (r.getAs[String]("metric"), r.getAs[Long]("n")) ->
      ((r.getAs[Long]("matches"), r.getAs[Long]("cand_total"),
        r.getAs[Long]("ref_total"), r.getAs[Long]("p_micro"),
        r.getAs[Long]("r_micro")))).toMap

  /** The batch-side truth: aggregate the registered a_bleu / a_chrf
    * outputs with the stream's own row encoding.
    */
  private def batchTruth(docs: DataFrame): Map[(String, Long), (Long, Long,
      Long, Long, Long)] = {
    val b = BleuEval.bleuStats(BleuEval.bleuPairsOf(docs)).collect()
    val c = BleuEval.chrfStats(BleuEval.chrfPairsOf(docs)).collect()
    val bleu = b.groupBy(_.getAs[Long]("n")).map { case (n, rs) =>
      val m = rs.map(_.getAs[Long]("matches")).sum
      val t = rs.map(_.getAs[Long]("total")).sum
      ("bleu", n) -> ((m, t, 0L, if (t > 0) m * 1000000L / t else 0L, 0L))
    }
    val n1 = b.filter(_.getAs[Long]("n") == 1L)
    val (cl, rl) = (n1.map(_.getAs[Long]("cand_len")).sum,
      n1.map(_.getAs[Long]("ref_len")).sum)
    val lens = Map(("bleu_len", 0L) ->
      ((0L, cl, rl, if (rl > 0) cl * 1000000L / rl else 0L, 0L)))
    val chrf = c.groupBy(_.getAs[Long]("n")).map { case (n, rs) =>
      val m = rs.map(_.getAs[Long]("matches")).sum
      val ct = rs.map(_.getAs[Long]("cand_total")).sum
      val rt = rs.map(_.getAs[Long]("ref_total")).sum
      ("chrf", n) -> ((m, ct, rt,
        if (ct > 0) m * 1000000L / ct else 0L,
        if (rt > 0) m * 1000000L / rt else 0L))
    }
    val rr = BleuEval.rougeRows(BleuEval.rougePairsOf(docs)).collect()
    val (lcs, rcl, rrl) = (rr.map(_.getAs[Long]("lcs")).sum,
      rr.map(_.getAs[Long]("cand_len")).sum,
      rr.map(_.getAs[Long]("ref_len")).sum)
    val rouge = Map(("rouge", 0L) -> ((lcs, rcl, rrl,
      if (rcl > 0) lcs * 1000000L / rcl else 0L,
      if (rrl > 0) lcs * 1000000L / rrl else 0L)))
    (bleu ++ lens ++ chrf ++ rouge).toMap
  }

  test("3-way split of the fixture corpus equals the batch aggregation") {
    val docs = Tables.documents(spark, sf)
    val want = batchTruth(docs)
    spark.catalog.clearCache() // release batchTruth's stats seams
    val root = Files.createTempDirectory("genevalstream").toString
    (0 until 3).foreach(i => GenEvalStream.ingestBatch(
      docs.filter(col("doc_id") % 3 === i), i.toLong, root))
    // the stream's own seam persists are released per batch
    assert(spark.sharedState.cacheManager.isEmpty,
      "ingestBatch leaked a stats-seam cache")
    val got = rows(GenEvalStream.corpus(spark, root))
    assert(got == want, s"stream $got\nbatch  $want")
    assert(got.keySet.size == 4 + 1 + 6 + 1)
    // at-least-once replay: batch 1 overwrites its own partition
    GenEvalStream.ingestBatch(docs.filter(col("doc_id") % 3 === 1), 1L, root)
    assert(rows(GenEvalStream.corpus(spark, root)) == want)
  }

  test("streaming wiring: foreachBatch reaches the same frame") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val want = batchTruth(docs)
    spark.catalog.clearCache()
    val root = Files.createTempDirectory("genevalwire").toString
    val src = s"$root/src"
    docs.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = GenEvalStream.start(stream, s"$root/state", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(rows(GenEvalStream.corpus(spark, s"$root/state")) == want)
  }
}
