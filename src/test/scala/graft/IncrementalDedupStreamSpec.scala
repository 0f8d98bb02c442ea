package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup
import graft.streaming.IncrementalDedupStream

/** The streaming near-dup ingest must match a from-first-principles
  * simulation of its drop rule over the EXACT Jaccard ground truth:
  * process batches in order, flag docs pairing with the surviving index
  * or a smaller-id doc of their own batch, index the rest.
  */
class IncrementalDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("two-batch stream matches the sequential ground-truth simulation") {
    val root = Files.createTempDirectory("incdedup").toString
    val (src, idx, flagged, ckpt) = (s"$root/src", s"$root/index",
      s"$root/flagged", s"$root/ckpt")

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch1 = docs.filter(col("doc_id") % 5 =!= 0)
    val batch2 = docs.filter(col("doc_id") % 5 === 0)

    batch1.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = IncrementalDedupStream.start(stream, idx, flagged, 0.8, 20, ckpt)
    try {
      q.processAllAvailable()
      batch2.write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()

    // ground-truth simulation from the exact (uncapped) pair set — the
    // df cap never binds at fixture scale, so capped == exact
    val allPairs = Dedup.jaccardPairs(docs, 0.8)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    def dropsOf(batch: Set[Long], index: Set[Long]): Set[Long] = {
      val newNew = allPairs.collect {
        case (a, b) if batch(a) && batch(b) => a max b }
      val vsIndex = allPairs.collect {
        case (a, b) if batch(a) && index(b) => a
        case (a, b) if batch(b) && index(a) => b }
      newNew ++ vsIndex
    }
    val b1 = ids(batch1)
    val d1 = dropsOf(b1, Set.empty)
    val idx1 = b1 -- d1
    val b2 = ids(batch2)
    val d2 = dropsOf(b2, idx1)
    val expectIndex = idx1 ++ (b2 -- d2)

    assert(ids(spark.read.parquet(s"$idx/docs")) == expectIndex)
    assert(ids(spark.read.parquet(flagged)) == d1 ++ d2)
    // non-vacuous: both batches flagged something, and survivors remain
    assert((d1 ++ d2).nonEmpty && expectIndex.nonEmpty)
    assert(d2.nonEmpty, "batch 2 should collide with the index")
    // the persisted inverted index holds exactly the survivors
    assert(ids(spark.read.parquet(s"$idx/grams")) == expectIndex)
    assert(ids(spark.read.parquet(s"$idx/sizes")) == expectIndex)

    // at-least-once replay: re-running batch 1 (same batchId) must leave
    // index and flagged output identical — the batch=<id> overwrite plus
    // excluded-self index reads make the retry idempotent
    IncrementalDedupStream.ingestBatch(batch1, batchId = 0,
      idx, flagged, 0.8, 20)
    assert(ids(spark.read.parquet(s"$idx/docs")) == expectIndex)
    assert(ids(spark.read.parquet(flagged)) == d1 ++ d2)
  }
}
