package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SpanDedupStream

/** Arrival-order semantics + idempotency of the incremental span dedup:
  * first occurrence keeps its text, later repeats strip; a replayed
  * micro-batch overwrites itself with the identical verdicts.
  */
class SpanDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def outOf(path: String): Map[Long, String] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_stripped"))
      .toMap

  test("prior-batch spans strip later docs; first occurrence stays " +
      "verbatim; same-batch cross-doc strips both; short docs pass") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("span_stream").toString
    val (idx, out) = (s"$root/index", s"$root/out")

    val b1 = Seq((1L, "a b c d e f g h x")).toDF("doc_id", "text")
    SpanDedupStream.ingestBatch(b1, 0L, idx, out, 8)
    assert(outOf(s"$out/batch=0") == Map(1L -> "a b c d e f g h x"),
      "first occurrence must keep its text")

    val b2 = Seq(
      (2L, "a b c d e f g h y"),        // repeats batch-0's span → "y"
      (3L, "m n o p q r s t u"),        // same-batch cross-dup with 4
      (4L, "m n o p q r s t v"),
      (5L, "unique and short")          // < 8 tokens → verbatim
    ).toDF("doc_id", "text")
    SpanDedupStream.ingestBatch(b2, 1L, idx, out, 8)
    val got = outOf(s"$out/batch=1")
    assert(got == Map(
      2L -> "y", 3L -> "u", 4L -> "v",
      5L -> "unique and short"), s"got $got")

    // verbatim re-paste of indexed text → fully covered → empty verdict
    val b3 = Seq((6L, "a b c d e f g h")).toDF("doc_id", "text")
    SpanDedupStream.ingestBatch(b3, 2L, idx, out, 8)
    assert(outOf(s"$out/batch=2") == Map(6L -> ""))

    // replay batch 1 (at-least-once): identical verdicts, no
    // self-poisoning from batch 1's own index partition
    SpanDedupStream.ingestBatch(b2, 1L, idx, out, 8)
    assert(outOf(s"$out/batch=1") == got, "replay must be idempotent")
  }

  test("live stream (file source, two micro-batches) produces the same " +
      "verdicts as direct ingestBatch") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("span_stream_live").toString
    val (src, idx, out, ckpt) =
      (s"$root/src", s"$root/index", s"$root/out", s"$root/ckpt")

    val b1 = Seq((1L, "a b c d e f g h x")).toDF("doc_id", "text")
    val b2 = Seq(
      (2L, "a b c d e f g h y"),
      (3L, "fresh words only here nothing repeats at all")
    ).toDF("doc_id", "text")

    b1.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(b1.schema).parquet(src)
    val q = SpanDedupStream.start(stream, idx, out, 8, ckpt)
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()

    val all = outOf(s"$out/batch=0") ++ outOf(s"$out/batch=1")
    assert(all == Map(
      1L -> "a b c d e f g h x",
      2L -> "y",
      3L -> "fresh words only here nothing repeats at all"), s"got $all")
  }
}
