package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.KinesisRecord
import graft.streaming.WindowedStreams

/** Streaming watermark semantics (ST14 + streaming ST8): windowed counts
  * under `readStream` agree with the batch formulation, and
  * `dropDuplicatesWithinWatermark` suppresses redelivered sequence numbers
  * with bounded state.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def rec(key: String, seq: String, epochSec: Long): KinesisRecord =
    KinesisRecord(seq.getBytes("UTF-8"), key, seq,
      new Timestamp(epochSec * 1000), "None")

  private def writeRecords(dir: String, recs: Seq[KinesisRecord]): Unit = {
    import spark.implicits._
    recs.toDS().write.mode("append").parquet(dir)
  }

  test("streaming tumbling counts equal the batch formulation") {
    val dir = Files.createTempDirectory("wstream").toString
    val base = 1700000000L // window-aligned enough for 10-minute buckets
    val recs = (0 until 120).map { i =>
      rec(s"k${i % 3}", i.toString, base + i * 30) // 30s apart, 3 keys
    }
    writeRecords(dir, recs)

    import spark.implicits._
    val stream = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
    val q = WindowedStreams.tumblingCounts(stream, "10 minutes", "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("wcounts").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("wcounts")
      .select(col("window_start"), col("partitionKey"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = spark.read.schema(KinesisRecord.schema).parquet(dir)
      .groupBy(window(col("approximateArrivalTimestamp"), "10 minutes")
        .as("w"), col("partitionKey"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("partitionKey"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark suppresses redelivery in-horizon") {
    val dir = Files.createTempDirectory("wdedup").toString
    val base = 1700000000L
    // sequences 0..19, each delivered twice within the horizon
    val once = (0 until 20).map(i => rec("k", i.toString, base + i * 10))
    writeRecords(dir, once ++ once)

    val stream = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
    val q = WindowedStreams.dedupWithinWatermark(stream, "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("wdedup").start()
    try q.processAllAvailable() finally q.stop()

    val seqs = spark.table("wdedup").select("sequenceNumber")
      .collect().map(_.getString(0))
    assert(seqs.length == 20, s"expected 20 unique, got ${seqs.length}")
    assert(seqs.toSet == (0 until 20).map(_.toString).toSet)
  }

  test("stream-stream interval join equals the batch join") {
    val ldir = Files.createTempDirectory("sjleft").toString
    val rdir = Files.createTempDirectory("sjright").toString
    val base = 1700000000L
    // left events at +0, +120, +240…; right events every 50s — only
    // rights within [l_ts - 90s, l_ts] per key should match, so the
    // interval genuinely filters
    writeRecords(ldir, (0 until 12).map(i =>
      rec(s"k${i % 3}", s"L$i", base + i * 120)))
    writeRecords(rdir, (0 until 30).map(i =>
      rec(s"k${i % 3}", s"R$i", base + i * 50)))

    val ls = spark.readStream.schema(KinesisRecord.schema).parquet(ldir)
    val rs = spark.readStream.schema(KinesisRecord.schema).parquet(rdir)
    val q = WindowedStreams.intervalJoin(ls, rs, "1 minute", "90 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sjoin").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sjoin").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val lb = spark.read.schema(KinesisRecord.schema).parquet(ldir)
    val rb = spark.read.schema(KinesisRecord.schema).parquet(rdir)
    val batch = WindowedStreams.intervalJoin(lb, rb, "1 minute",
      "90 seconds").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // the time bound really filtered: fewer matches than the key-only join
    assert(streamed.size < 12L * 10L)
  }

  test("streaming embedding-outlier gate equals the batch filter on " +
      "the same broadcast artifacts, and genuinely drops records") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val dir = Files.createTempDirectory("mgate").toString
    emb.write.mode("overwrite").parquet(dir)
    val stats = graft.pipeline.Projection.covStats(spark, d)
    val (mu, inv) = graft.pipeline.Projection
      .mahalanobisArtifacts(stats, 64)
    val st = spark.readStream.schema(emb.schema).parquet(dir)
    val q = WindowedStreams.embeddingOutlierGate(st, mu, inv, 70.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("mgate").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("mgate").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = WindowedStreams.embeddingOutlierGate(emb, mu, inv, 70.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(streamed.size < emb.count(), "the gate must drop something")
  }

  test("keyless stream-stream band join equals the naive batch " +
      "cross-filter (the bucket equality is what makes the otherwise-" +
      "rejected no-equi-key stream-stream join plannable)") {
    val ldir = Files.createTempDirectory("bjleft").toString
    val rdir = Files.createTempDirectory("bjright").toString
    val base = 1700000000L
    // DIFFERENT keys on both sides — matching is purely temporal; right
    // events straddle bucket boundaries relative to the lefts
    writeRecords(ldir, (0 until 8).map(i =>
      rec(s"lk$i", s"L$i", base + i * 130)))
    writeRecords(rdir, (0 until 20).map(i =>
      rec(s"rk$i", s"R$i", base + 25 + i * 45)))
    val ls = spark.readStream.schema(KinesisRecord.schema).parquet(ldir)
    val rs = spark.readStream.schema(KinesisRecord.schema).parquet(rdir)
    val q = WindowedStreams.bandJoinStream(ls, rs, "1 minute", 60L)
      .writeStream.outputMode("append")
      .format("memory").queryName("bjoin").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bjoin").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed.size == streamed.toSeq.length, "no duplicate pairs")
    // naive reference: every (L, R) with |Δt| <= 60s
    val naive = (for {
      i <- 0 until 8; j <- 0 until 20
      if math.abs((i * 130) - (25 + j * 45)) <= 60
    } yield (s"L$i", s"R$j")).toSet
    assert(streamed == naive)
    assert(naive.nonEmpty)
  }

  test("keyless stream-stream interval-overlap join equals the naive " +
      "batch cross-filter: exactly-once across shared buckets, " +
      "variable span lengths both sides") {
    import org.apache.spark.sql.functions.{col, substring}
    val ldir = Files.createTempDirectory("ivleft").toString
    val rdir = Files.createTempDirectory("ivright").toString
    val base = 1700000000L
    // span lengths derive from each record's own sequence digits (the
    // planting discipline): left (i%3)*25 s, right (j%4)*20 s — zero-
    // length spans included, and spans straddle the 60 s buckets
    writeRecords(ldir, (0 until 8).map(i =>
      rec(s"lk$i", s"L$i", base + i * 130)))
    writeRecords(rdir, (0 until 20).map(i =>
      rec(s"rk$i", s"R$i", base + 25 + j2ts(i))))
    def lenL = substring(col("sequenceNumber"), 2, 10).cast("long") % 3 * 25
    def lenR = substring(col("sequenceNumber"), 2, 10).cast("long") % 4 * 20
    val ls = spark.readStream.schema(KinesisRecord.schema).parquet(ldir)
    val rs = spark.readStream.schema(KinesisRecord.schema).parquet(rdir)
    val q = WindowedStreams.intervalOverlapStream(ls, rs, "1 minute",
        60L, lenL, lenR)
      .writeStream.outputMode("append")
      .format("memory").queryName("ivjoin").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ivjoin").collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    assert(streamed.size == streamed.toSet.size, "no duplicate pairs")
    val naive = (for {
      i <- 0 until 8; j <- 0 until 20
      ls0 = i * 130L; le0 = ls0 + (i % 3) * 25L
      rs0 = 25L + j2ts(j); re0 = rs0 + (j % 4) * 20L
      if math.max(ls0, rs0) <= math.min(le0, re0)
    } yield (s"L$i", s"R$j")).toSet
    assert(streamed.toSet == naive)
    assert(naive.nonEmpty)
  }

  /** Right-side spacing for the interval test: irregular so overlaps
    * hit starts-inside, ends-inside, containment, and touching cases.
    */
  private def j2ts(j: Int): Long = j * 45L + (j % 5) * 7L

  test("interval overlap at the exact state bound with ms-precision " +
      "arrivals still pairs — the cleanup range over-approximates the " +
      "second-truncated spans") {
    import org.apache.spark.sql.functions.lit
    val ldir = Files.createTempDirectory("ivmsl").toString
    val rdir = Files.createTempDirectory("ivmsr").toString
    val base = 1700000000L
    // l arrives at 8.9s (len 0 → truncated span [8, 8]); r at 3.0s
    // (len 5 → [3, 8]): the spans touch, but |l_ts − r_ts| = 5.9 s
    // exceeds maxLenSec=5 — a cleanup range of exactly maxLenSec
    // would drop the genuinely-overlapping pair before the residual
    writeRecords(ldir, Seq(KinesisRecord("x".getBytes("UTF-8"), "lk",
      "L0", new Timestamp(base * 1000 + 8900), "None")))
    writeRecords(rdir, Seq(KinesisRecord("x".getBytes("UTF-8"), "rk",
      "R0", new Timestamp(base * 1000 + 3000), "None")))
    val ls = spark.readStream.schema(KinesisRecord.schema).parquet(ldir)
    val rs = spark.readStream.schema(KinesisRecord.schema).parquet(rdir)
    val q = WindowedStreams.intervalOverlapStream(ls, rs, "1 minute",
        5L, lit(0L), lit(5L))
      .writeStream.outputMode("append")
      .format("memory").queryName("ivms").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ivms").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed == Set(("L0", "R0")))
  }

  test("streaming blocklist gate: keeps equal the batch gate's keep set " +
      "and per-category counts ride along, across micro-batch splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("wblock").toString
    val base = 1700000000L
    // corpus: heavy grams form the blocklist band; doc texts reuse them
    // at different densities so the gate genuinely splits the stream
    val texts = (0 until 12).map { i =>
      (0 until (4 + i % 7)).map(j => s"w${(i * 5 + j * (i + 2)) % 6}")
        .mkString(" ")
    }
    val corpus = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def body(i: Int) = KinesisRecord(texts(i).getBytes("UTF-8"), s"k$i",
      s"s$i", new Timestamp((base + i) * 1000), "None")
    // two writes → two micro-batches; the gate is stateless so the
    // split must not matter
    writeRecords(dir, (0 until 6).map(body))
    writeRecords(dir, (6 until 12).map(body))
    val stream = spark.readStream.schema(KinesisRecord.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val cap = 2L
    val q = WindowedStreams.blocklistGateStream(stream, corpus, cap,
        uniSkip = 0, uniTake = 3, biSkip = 0, biTake = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("wblock").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("wblock").collect()
      .map(r => r.getString(2) -> (r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    val batch = graft.pipeline.TextAnalysis.blocklistGate(corpus,
        uniSkip = 0, uniTake = 3, biSkip = 0, biTake = 4,
        maxCatHits = cap)
      .filter(col("keep") === 1L)
      .join(corpus, "doc_id")
      .collect()
      .map(r => r.getAs[String]("text") ->
        (r.getAs[Long]("c0"), r.getAs[Long]("c1"), r.getAs[Long]("c2")))
      .toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(streamed.size < texts.size, "the gate must drop something")
  }

  test("streaming domain-LM gate: in-domain passes, OOD drops, ce equals " +
      "the batch operator across batch splits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wdomain").toString
    val base = 1700000000L
    val target = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val inD = "the cat sat on the mat"
    val ood = "zq xv qj wk vx kq"
    def body(seq: String, text: String, t: Long) =
      KinesisRecord(text.getBytes("UTF-8"), "k", seq,
        new Timestamp(t * 1000), "None")
    // two separate writes → two files → the file stream delivers them
    // in separate micro-batches; stateless scoring must not care
    writeRecords(dir, Seq(body("1", inD, base), body("2", ood, base + 1)))
    writeRecords(dir, Seq(body("3", inD, base + 2),
      body("4", "solo", base + 3))) // <2 tokens → dropped
    val stream = spark.readStream.schema(KinesisRecord.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // thresholds sit between the two scores: in-domain ≈ 1.1 bits
    // (every bigram seen 20×), OOD ≈ 2.32 (-log2(1/vsz), vsz = 5)
    val q = WindowedStreams.domainScoreGate(stream, target, maxCe = 2.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("wdomain").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("wdomain").collect()
      .map(r => r.getAs[String]("sequenceNumber") ->
        r.getAs[Double]("ce")).toMap
    // OOD ce on this target: every bigram unseen, every unigram unseen
    // except none → -log2(1/vsz)... must exceed the gate; in-domain low
    assert(out.keySet == Set("1", "3"), s"got ${out.keySet}")
    // the stream's ce equals the batch operator's at the 1e-4 grain
    val batchCe = graft.pipeline.CorpusOps
      .bigramCrossEntropyAgainst(target,
        Seq((1L, inD)).toDF("doc_id", "text"))
      .collect()(0).getDouble(2)
    assert(out("1") == batchCe, s"stream ${out("1")} vs batch $batchCe")
  }

  test("domain-LM gate refuses a corpus-shaped target loudly instead of " +
      "collecting it to the driver") {
    import spark.implicits._
    val target = (1 to 50).map(i =>
      (i.toLong, s"tok${i}a tok${i}b tok${i}c tok${i}d"))
      .toDF("doc_id", "text")
    val records = Seq.empty[(Array[Byte], String)]
      .toDF("data", "sequenceNumber")
      .withColumn("partitionKey", lit("k"))
    val e = intercept[IllegalArgumentException] {
      WindowedStreams.domainScoreGate(records, target, maxCe = 2.0,
        maxVocab = 100)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
    assert(e.getMessage.contains("bigramCrossEntropyAgainst"),
      "the error must point at the corpus-scale alternative")
  }

  test("a long but small-vocabulary target is accepted — the guard " +
      "bounds DISTINCT grams, not total tokens") {
    import spark.implicits._
    // 300 tokens total (3× maxVocab) but only 3 distinct unigrams +
    // 2 distinct bigrams: the driver model is tiny, so a repetitive
    // curated target must train, not hard-fail
    val target = (1 to 100).map(i => (i.toLong, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val records = Seq((("alpha beta").getBytes("UTF-8"), "1"))
      .toDF("data", "sequenceNumber")
      .withColumn("partitionKey", lit("k"))
    val gated = WindowedStreams.domainScoreGate(records, target,
      maxCe = 50.0, maxVocab = 100)
    assert(gated.columns.contains("ce"))
    assert(gated.count() == 1L)
  }

  test("streaming quality gate filters low-quality and exact-dup payloads") {
    val dir = Files.createTempDirectory("wquality").toString
    val base = 1700000000L
    val rich = "the quick brown fox jumps over a lazy dog " +
      "with many varied distinct tokens in this sentence"
    val poor = "spam spam spam spam spam spam spam spam spam spam"
    def body(key: String, seq: String, text: String, t: Long) =
      KinesisRecord(text.getBytes("UTF-8"), key, seq,
        new Timestamp(t * 1000), "None")
    writeRecords(dir, Seq(
      body("k", "1", rich, base),            // passes
      body("k", "2", poor, base + 10),       // low quality → dropped
      body("k", "3", rich, base + 20),       // exact dup of 1 → suppressed
      body("k", "4", rich + " extended with fresh additional words",
        base + 30)))                         // passes (different content)

    val stream = spark.readStream.schema(KinesisRecord.schema).parquet(dir)
    val q = WindowedStreams.qualityGate(stream, 0.5, "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("wquality").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("wquality").collect()
      .map(r => r.getAs[String]("sequenceNumber")).toSet
    // seq 2 must be gone (quality) and exactly ONE of the exact-dup pair
    // {1, 3} survives — which one is arbitrary within a micro-batch
    // (dropDuplicates keeps an unspecified member per key)
    assert(out.size == 2 && out.contains("4") &&
      (out - "4").subsetOf(Set("1", "3")), s"got $out")
    // the gate applies the SAME batch-tier expressions: cross-check the
    // surviving quality values against a batch computation
    val batchQ = spark.read.schema(KinesisRecord.schema).parquet(dir)
      .withColumn("text", col("data").cast("string"))
      .select(col("sequenceNumber"),
        round(graft.pipeline.TextAnalysis.qualityScore(col("text")), 4)
          .as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val streamQ = spark.table("wquality").collect()
      .map(r => r.getAs[String]("sequenceNumber") ->
        r.getAs[Double]("quality")).toMap
    assert(streamQ.forall { case (k, v) => batchQ(k) == v })
  }
}
