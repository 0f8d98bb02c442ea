package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Fingerprints, Similarity}
import graft.streaming.EmbeddingDedupStream

/** Ingest throughput of [[EmbeddingDedupStream]] at its design scale —
  * the vector-twin row of the STREAM_TPUT artifact (r14 verdict #3).
  *
  * `runMain graft.EmbDedupThroughput [nVectors] [batches]` (defaults
  * 200 000 × 64-dim in 4 batches — the sf10 embedding tier's size, so
  * the LSH shape the stream freezes is the one lshParams actually
  * picks there: 11 bits × 16 tables × 8 probes). Vectors are
  * deterministic hash noise with every 100th vector an EXACT copy of
  * its predecessor, so the flag path (bucket join → cosine verify →
  * drop) does real work instead of free-running on empty candidate
  * sets. Batches ingest sequentially through the real
  * `ingestBatch` body (fresh index), so later batches pay the
  * growing-index join — the steady-state cost, not the cold-start one.
  * Prints one `EMB_DEDUP_TPUT` JSON line (vec/s + payload MB/s at the
  * fixture's 64 × 4 B float layout).
  */
object EmbDedupThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    // optional 3rd arg: sketch-screen margin in sigmas (e.g. "2.5");
    // absent = the unscreened r15 shape
    val screen = args.lift(2).map(_.toDouble)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val plan = Similarity.lshParams(n, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)
    println(s"PLAN bits=${plan.bits} tables=${plan.tables} " +
      s"probes=${plan.probes}")

    // deterministic synthetic corpus (excluded from timings): hash
    // noise in [-1, 1); every 100th vector duplicates its predecessor
    val dir = Files.createTempDirectory("embtput-src").toString
    val base = when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
      .otherwise(col("id"))
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(base, i), lit(2000001L)) - 1000000L)
          .cast("double").cast("float") / 1000000.0f).as("embedding"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val src = spark.read.parquet(dir)
    val payloadMb = n * 64 * 4 / 1048576.0

    val root = Files.createTempDirectory("embtput").toString
    val per = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    for (b <- 0 until nBatches) {
      val tb = System.nanoTime()
      // threshold 0.75, not the design 0.47: 64-dim hash noise has fat
      // random-pair cosine tails (3.76σ ≈ 1e-4 of all pairs) that at
      // 2e10 pairs would flag half the synthetic corpus and measure
      // cluster pathology instead of ingest cost; at 6σ the flags are
      // the planted exact dups plus noise-level stragglers
      EmbeddingDedupStream.ingestBatch(
        src.filter(pmod(col("vec_id"), lit(nBatches)) === b),
        batchId = b, s"$root/index", s"$root/flagged",
        plan.bits, plan.tables, plan.probes, threshold = 0.75,
        screenSigmas = screen)
      per += (System.nanoTime() - tb) / 1e9
      println(f"BATCH $b ${per.last}%.2f s")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val flagged = spark.read.parquet(s"$root/flagged").count()
    val indexed = spark.read.parquet(s"$root/index/vecs").count()
    println(f"""EMB_DEDUP_TPUT {"metric":"emb_dedup_ingest","unit":"vec/s",""" +
      s""""vectors":$n,"batches":$nBatches,""" +
      s""""bits":${plan.bits},"tables":${plan.tables},""" +
      s""""probes":${plan.probes},""" +
      s""""screen_sigmas":${screen.map(_.toString).getOrElse("null")},""" +
      f""""secs":$secs%.2f,"vec_s":${n / secs}%.0f,""" +
      f""""mb_s":${payloadMb / secs}%.2f,""" +
      s""""batch_secs":[${per.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""flagged":$flagged,"indexed":$indexed}""")
    spark.stop()
  }
}
