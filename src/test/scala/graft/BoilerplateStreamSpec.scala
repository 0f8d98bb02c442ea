package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup
import graft.streaming.BoilerplateStream

/** The streaming boilerplate twin's contract: the latest-emission view
  * equals the batch operator on the union of all batches under ANY
  * split (boilerplate hotness is corpus-relative, so the stream
  * re-emits retroactively when a source's hot set changes), replays are
  * idempotent, and compaction preserves both the answer and the state.
  */
class BoilerplateStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** The d_boilerplate_strip synthesis: per-source banner/footer with
    * per-doc seam sentinels, on the real fixture.
    */
  private def injectedFixture(): DataFrame =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"),
        concat_ws(" ",
          col("source"), lit("portal home nav menu search"),
          concat(lit("s"), col("doc_id")),
          col("text"),
          concat(lit("e"), col("doc_id")),
          col("source"), lit("footer terms privacy contact copyright"))
          .as("text"))

  private def collected(df: DataFrame): Map[Long, String] =
    df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_clean"))
      .toMap

  private def batchAnswer(docs: DataFrame): Map[Long, String] =
    collected(Dedup.stripBoilerplate(docs, n = 4, minFrac = 0.5,
      minDocs = 2))

  test("latest view equals the batch operator on the fixture under a " +
      "3-way split and under a single batch") {
    val docs = injectedFixture().persist()
    val want = batchAnswer(docs)

    val r3 = tmp("bp_stream_3")
    for (i <- 0 until 3)
      BoilerplateStream.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === i),
        i.toLong, s"$r3/index", s"$r3/out")
    assert(collected(BoilerplateStream.latestOutput(spark, s"$r3/out"))
      == want, "3-batch split must equal the batch operator")

    val r1 = tmp("bp_stream_1")
    BoilerplateStream.ingestBatch(docs, 0L, s"$r1/index", s"$r1/out")
    assert(collected(BoilerplateStream.latestOutput(spark, s"$r1/out"))
      == want, "single batch must equal the batch operator")
    docs.unpersist()
  }

  test("a later batch pushing a banner over the bar retroactively " +
      "re-emits the earlier doc stripped") {
    import spark.implicits._
    val root = tmp("bp_stream_retro")
    val (idx, out) = (s"$root/index", s"$root/out")
    def doc(i: Int) =
      (i.toLong, "s", s"B1 B2 B3 B4 body$i w$i x$i y$i z$i")
    val all = (1 to 4).map(doc).toDF("doc_id", "source", "text")

    // batch 0: one doc — banner df 1 < minDocs 2, nothing hot
    BoilerplateStream.ingestBatch(all.filter(col("doc_id") === 1), 0L,
      idx, out)
    val first = collected(spark.read.parquet(s"$out/batch=0"))
    assert(first(1L).startsWith("B1 B2 B3 B4"),
      s"banner not yet hot in batch 0, got '${first(1L)}'")

    // batch 1: three more docs — banner df 4 >= max(2, ceil(0.5*4)),
    // hot set changes, doc 1 must be re-emitted stripped
    BoilerplateStream.ingestBatch(all.filter(col("doc_id") > 1), 1L,
      idx, out)
    val latest = collected(BoilerplateStream.latestOutput(spark, out))
    assert(latest == batchAnswer(all),
      "retroactive re-emit must land on the batch answer")
    assert(latest(1L) == "body1 w1 x1 y1 z1",
      s"batch-0 doc must lose its banner, got '${latest(1L)}'")
  }

  test("replaying the last batch is idempotent, and compaction " +
      "preserves the answer, the hot set, and subsequent ingest") {
    val docs = injectedFixture().persist()
    val want = batchAnswer(docs)
    val root = tmp("bp_stream_compact")
    val (idx, out) = (s"$root/index", s"$root/out")
    val part = (i: Int) => docs.filter(pmod(col("doc_id"), lit(4)) === i)

    for (i <- 0 until 3)
      BoilerplateStream.ingestBatch(part(i), i.toLong, idx, out)
    // at-least-once replay of the last committed batch
    BoilerplateStream.ingestBatch(part(2), 2L, idx, out)

    val hotBefore = BoilerplateStream.hotSet(spark, idx)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    BoilerplateStream.compact(spark, idx)
    val hotAfter = BoilerplateStream.hotSet(spark, idx)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hotAfter == hotBefore, "compaction must not move the hot set")
    // state folded: batches 0+1 merged, the newest partition (2) kept
    // unfolded so an uncommitted-batch replay stays exact
    for (sub <- Seq("counts", "srcounts", "hot", "touched")) {
      val dirs = new java.io.File(s"$idx/$sub")
        .listFiles().filter(_.getName.startsWith("batch=")).toSeq
      assert(dirs.map(_.getName).sorted == Seq("batch=1", "batch=2"),
        s"$sub not folded as expected: ${dirs.map(_.getName).sorted}")
    }

    BoilerplateStream.ingestBatch(part(3), 3L, idx, out)
    assert(collected(BoilerplateStream.latestOutput(spark, out)) == want,
      "post-compaction ingest must land on the batch answer")
    docs.unpersist()
  }
}
