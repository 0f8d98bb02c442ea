package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Fingerprints, Similarity, VectorOps}
import graft.streaming.EmbeddingDedupStream

/** Ingest throughput AND planted-pair recall of [[EmbeddingDedupStream]]
  * at its design scale — the vector-twin row of the STREAM_TPUT artifact
  * (r14 verdict #3), extended one decade for r16 (#1: candidate-bounded
  * fetch past the broadcast dial at ≥ 1M indexed vectors; #3: the recall
  * curve where the exact tier is infeasible, measured against PLANTED
  * ground truth).
  *
  * `runMain graft.EmbDedupThroughput [nVectors] [batches] [screenSigmas
  * |none] [probes|auto] [plantEps] [compactEvery]`.
  *
  * Vectors are deterministic hash noise; every 100th vector is a
  * planted near-duplicate of its predecessor: an EXACT copy when
  * `plantEps` = 0 (the r15 shape — exercises the flag path at zero
  * signature Hamming), or `pred + plantEps·freshNoise` renormalized
  * when > 0, placing the planted pair at cosine ≈ 1/√(1+ε²) — BETWEEN
  * the verify threshold and 1, so finding it requires the LSH
  * candidate step to survive real per-bit disagreement (q = θ/π > 0)
  * and recall is a measurement, not a tautology. Planted-pair ground
  * truth is computed EXACTLY after the run (a planted-id equi-join —
  * |planted| rows, not a pair scan): the denominator is planted pairs
  * whose true cosine clears the verify threshold (what any exact tier
  * would emit), the numerator those with a flagged endpoint, so the
  * reported recall isolates LSH candidate recall from the verify.
  *
  * The verify threshold is 0.75, not the design 0.47: 64-dim hash
  * noise has fat random-pair cosine tails (3.76σ ≈ 1e-4 of all pairs)
  * that at ≥ 2e10 pairs would flag half the synthetic corpus and
  * measure cluster pathology instead of ingest cost; at 6σ the flags
  * are the planted dups plus noise-level stragglers (reported
  * separately as `noise_flags`).
  *
  * `probes` overrides the adaptive probe depth (0 = the multi-probe
  * ablation row); `compactEvery` k folds the index partitions every k
  * batches through [[EmbeddingDedupStream.compact]], timing each fold
  * (the listing-cost row of r15 verdict #5). Batches ingest
  * sequentially through the real `ingestBatch` body, so later batches
  * pay the growing-index join — the steady-state cost. Prints one
  * `EMB_DEDUP_TPUT` JSON line.
  */
object EmbDedupThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    val screen = args.lift(2).filterNot(_ == "none").map(_.toDouble)
    val probeOverride = args.lift(3).filterNot(_ == "auto").map(_.toInt)
    val plantEps = args.lift(4).map(_.toDouble).getOrElse(0.0)
    val compactEvery = args.lift(5).map(_.toInt).getOrElse(0)
    val threshold = 0.75
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val plan = Similarity.lshParams(n, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)
    val probes = probeOverride.getOrElse(plan.probes)
    println(s"PLAN bits=${plan.bits} tables=${plan.tables} " +
      s"probes=$probes plantEps=$plantEps compactEvery=$compactEvery")

    // deterministic synthetic corpus (excluded from timings): hash
    // noise in [-1, 1); every 100th vector near-duplicates its
    // predecessor (exact copy at plantEps = 0)
    val dir = Files.createTempDirectory("embtput-src").toString
    val isDup = pmod(col("id"), lit(100)) === 1
    val base = when(isDup, col("id") - 1).otherwise(col("id"))
    def noise(key: org.apache.spark.sql.Column) = transform(
      sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(key, i), lit(2000001L)) - 1000000L)
          .cast("double") / 1000000.0)
    val emb =
      if (plantEps == 0.0) noise(base)
      else zip_with(noise(base),
        when(isDup, noise(col("id") + lit(1000000007L)))
          .otherwise(transform(sequence(lit(0), lit(63)), _ => lit(0.0))),
        (a, b) => a + lit(plantEps) * b)
    spark.range(n).select(col("id").as("vec_id"),
      transform(emb, x => x.cast("float")).as("embedding"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val src = spark.read.parquet(dir)
    val payloadMb = n * 64 * 4 / 1048576.0

    val root = Files.createTempDirectory("embtput").toString
    val per = scala.collection.mutable.ArrayBuffer.empty[Double]
    val compSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    for (b <- 0 until nBatches) {
      val tb = System.nanoTime()
      EmbeddingDedupStream.ingestBatch(
        src.filter(pmod(col("vec_id"), lit(nBatches)) === b),
        batchId = b, s"$root/index", s"$root/flagged",
        plan.bits, plan.tables, probes, threshold = threshold,
        screenSigmas = screen)
      per += (System.nanoTime() - tb) / 1e9
      println(f"BATCH $b ${per.last}%.2f s")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0) {
        val tc = System.nanoTime()
        EmbeddingDedupStream.compact(spark, s"$root/index")
        compSecs += (System.nanoTime() - tc) / 1e9
        println(f"COMPACT after $b ${compSecs.last}%.2f s")
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9

    // planted-pair ground truth + recall — EXACT, planted-id-bounded
    def normed(c: String, as: String): DataFrame = src
      .select(col("vec_id").as(as),
        VectorOps.normalized(VectorOps.asDouble(col("embedding")))
          .as(c))
    val planted = src.filter(pmod(col("vec_id"), lit(100)) === 1)
      .select(col("vec_id").as("db"), (col("vec_id") - 1).as("da"))
      .join(normed("ea", "da"), "da").join(normed("eb", "db"), "db")
      .select(col("da"), col("db"),
        graft.functions.ArrayDot.array_dot(col("ea"), col("eb"))
          .as("cos"))
      .persist()
    val plantedTrue = planted.filter(col("cos") > threshold).persist()
    val nPlanted = planted.count()
    val nTrue = plantedTrue.count()
    val fl = spark.read.parquet(s"$root/flagged").select("vec_id")
      .distinct().persist()
    val flagged = fl.count()
    val found = plantedTrue
      .join(fl.select(col("vec_id").as("da")), Seq("da"), "left_semi")
      .union(plantedTrue
        .join(fl.select(col("vec_id").as("db")), Seq("db"), "left_semi")
        .select("da", "db", "cos"))
      .dropDuplicates("da", "db").count()
    // flags with no planted endpoint — the 6σ noise stragglers
    val noiseFlags = fl
      .join(plantedTrue.select(col("da").as("vec_id")), Seq("vec_id"),
        "left_anti")
      .join(plantedTrue.select(col("db").as("vec_id")), Seq("vec_id"),
        "left_anti").count()
    val indexed = spark.read.parquet(s"$root/index/vecs").count()
    val recall = if (nTrue == 0) 0.0 else found.toDouble / nTrue
    println(f"""EMB_DEDUP_TPUT {"metric":"emb_dedup_ingest","unit":"vec/s",""" +
      s""""vectors":$n,"batches":$nBatches,""" +
      s""""bits":${plan.bits},"tables":${plan.tables},""" +
      s""""probes":$probes,""" +
      s""""screen_sigmas":${screen.map(_.toString).getOrElse("null")},""" +
      s""""plant_eps":$plantEps,"compact_every":$compactEvery,""" +
      f""""secs":$secs%.2f,"vec_s":${n / secs}%.0f,""" +
      f""""mb_s":${payloadMb / secs}%.2f,""" +
      s""""batch_secs":[${per.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""compact_secs":[${compSecs.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""flagged":$flagged,"indexed":$indexed,""" +
      s""""planted":$nPlanted,"planted_true":$nTrue,""" +
      s""""planted_found":$found,"noise_flags":$noiseFlags,""" +
      f""""recall_planted":$recall%.4f}""")
    spark.stop()
  }
}
