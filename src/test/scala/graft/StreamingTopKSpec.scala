package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{Scored, TopK}

/** Streaming bounded-state top-k: cross-batch state carry, k-bound, and
  * equivalence with the batch answer over the full event history.
  */
class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("two micro-batches fold into the batch top-k over all events") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stopk").toString
    val k = 3
    // key 1: scores split across batches so the final top-3 mixes both
    // (batch answer {90,80,40} needs 90,40 from b1 and 80 from b2);
    // key 2: batch-2 only — state must appear mid-stream
    val batch1 = Seq(Scored(1L, 40L), Scored(1L, 90L), Scored(1L, 10L))
    val batch2 = Seq(Scored(1L, 80L), Scored(1L, 20L),
      Scored(2L, 7L), Scored(2L, 5L))

    batch1.toDS().write.mode("append").parquet(dir)
    val ds = spark.readStream.schema(implicitly[
        org.apache.spark.sql.Encoder[Scored]].schema)
      .parquet(dir).as[Scored]
    val q = StreamingTopK.topKPerKey(ds, k, spark)
      .writeStream.outputMode("update").format("memory")
      .queryName("stopk").start()
    try {
      q.processAllAvailable()
      batch2.toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    // memory sink in update mode appends each emission; the LAST row per
    // key is its current state
    val emitted = spark.table("stopk").as[TopK].collect()
    val last = emitted.zipWithIndex
      .groupBy(_._1.key).map { case (key, rows) =>
        key -> rows.maxBy(_._2)._1.topScores }
    assert(last(1L) == Seq(90L, 80L, 40L), s"got ${last(1L)}")
    assert(last(2L) == Seq(7L, 5L), "k-bound must not pad short keys")
    // ground truth: sequential fold over the full history equals the
    // distributed streaming result
    val exact = (batch1 ++ batch2).groupBy(_.key).map { case (key, xs) =>
      key -> StreamingTopK.fold(Nil, xs.map(_.score).iterator, k) }
    assert(last == exact)
    // state boundedness: key 1 saw 5 events, carries exactly k
    assert(last(1L).size == k)
  }
}
