package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale smoke: synthesizes a 10× tier from sf0.1 and times the
  * production-path queries at both scales, printing the per-query ratio.
  * `runMain graft.ScaleSmoke [sf0.1Dir] [outDir]`.
  *
  * A super-linear ratio (≫10×) flags a shape that sf0.1 hides — exactly
  * what a 100 TB deployment would hit. Results are recorded in SCALING.md.
  *
  * The synthesis preserves WITHIN-copy structure and randomizes
  * CROSS-copy structure, so duplicate/similarity counts scale ×10
  * (linear), not ×100 (every doc suddenly 10 exact twins):
  *   - documents: ids shifted per copy; each copy salts the ~30% of
  *     words whose `xxhash64(word) % 10` falls in {c, c+1, c+2}
  *     (content-keyed, so two docs in the SAME copy transform
  *     identically — their Jaccard is preserved exactly — while docs
  *     from different copies share only 40-60% of word tokens). The
  *     fraction is sized for the LOOSEST tier: a 10%-per-copy salt left
  *     cross-copy trigram Jaccard under the 0.8 pair threshold but
  *     inside SimHash's hamming-≤3 tolerance (SimHash shrugs off small
  *     edits by design), which planted a 10-copy clique per source doc
  *     — the first smoke run showed d_simhash 19.8× at 10× data purely
  *     from that quadratic output. 40-60% token divergence pushes
  *     cross-copy pairs out of every tier, so pair counts scale ×10.
  *   - embeddings: vectors circularly rotated by the copy index — same
  *     rotation on both sides of a within-copy pair preserves cosine
  *     exactly; cross-copy cosine of a random vector with its rotation
  *     is near zero.
  *   - events/lineitem/orders: ids (and users) shifted per copy; event
  *     times unchanged, so time windows see 10× density — the linear
  *     axis a stream at scale actually grows along.
  */
object ScaleSmoke {
  // EXCLUDED by design: the exact ground-truth tiers documented as
  // oracle-only and quadratic — they exist to prove the production
  // tiers lossless at checkable scale, not to run at 100 TB
  // (d_embedding_dup_clusters consumes d_embedding_dup's brute-force
  // pair set, so it is in the same class).
  val Excluded = Set("d_ngram_jaccard", "d_embedding_dup",
    "d_embedding_dup_clusters", "s_ann_bruteforce")

  // Every registered query except the documented-quadratic set, DERIVED
  // from the registry so a new operator is smoke-covered the round it
  // lands instead of waiting for a hand-list edit (the same
  // self-auditing move as CoverageTotalsSpec).
  def Queries: Seq[String] =
    SparkEntry.queries.keys.toSeq.filterNot(Excluded).sorted

  def synthesize(spark: SparkSession, src: String, out: String): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()
    val copies = 10
    def shifted(df: DataFrame, idCols: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { c =>
        val s = idCols.foldLeft(df) { case (d, (col0, stride)) =>
          d.withColumn(col0, col(col0) + lit(stride * c))
        }
        extra(s, c)
      }.reduce(_ union _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    shifted(docs, Map("doc_id" -> 10000000L), (d, c) =>
      if (c == 0) d
      else d.withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "),
          w => when(pmod(xxhash64(w), lit(copies))
              .isin(c, (c + 1) % copies, (c + 2) % copies),
            concat(w, lit("_"), lit(c))).otherwise(w)))))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    shifted(emb, Map("vec_id" -> 10000000L), (d, c) =>
      if (c == 0) d
      else d.withColumn("embedding", concat(
        slice(col("embedding"), c + 1, dim - c),
        slice(col("embedding"), 1, c))))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$src/events.parquet")
    shifted(events,
      Map("event_id" -> 100000000L, "user_id" -> 10000000L))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    shifted(spark.read.parquet(s"$src/lineitem.parquet"),
      Map("l_orderkey" -> 100000000L))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    // o_custkey shifts with customer's stride so copy c's orders point
    // at copy c's customers — within-copy join structure preserved
    // (dangling 90% of customers would otherwise skew any
    // orders⋈customer smoke query)
    shifted(spark.read.parquet(s"$src/orders.parquet"),
      Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    // customer scales WITH the facts (TPC-H scales it with SF, and
    // r_fuzzy_join blocks on customer names — an unscaled copy would
    // make its smoke vacuous); names regenerate from the shifted key so
    // copies are distinct realistic names, not byte-identical dups
    shifted(spark.read.parquet(s"$src/customer.parquet"),
      Map("c_custkey" -> 10000000L), (d, c) =>
      if (c == 0) d
      else d.withColumn("c_name",
        format_string("Customer#%09d", col("c_custkey"))))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/customer.parquet")

    // true dimension tables pass through unscaled (they stay
    // broadcast-sized at any fact scale — the point of a star schema)
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    new java.io.FileOutputStream(new java.io.File(fs, "_DONE")).close()
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    // optional 3rd arg: comma-separated query subset (re-time just the
    // queries a round changed instead of the full hour-long sweep)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    synthesize(spark, src, out)
    println(f"SYNTH done in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // COLD timing (the r11-pinned bench discipline): clear the cache
    // before construction so a previous query's persists can't
    // substitute into this plan, and this query's own lazy persists
    // count inside its own wall time
    def time(q: String, dir: String): (Double, Long) = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      val t = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      ((System.nanoTime() - t) / 1e9, n)
    }
    // warm the machinery classes once, uncounted (same rationale as Bench)
    for (q <- Seq("d_ngram_jaccard_capped", "r_pricing_summary",
        "w_session", "s_ann_ivf"))
      try time(q, src) catch { case _: Throwable => () }
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"sf1"}%10s ${"ratio"}%7s  rows1")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Long)]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    Queries.filter(q => only.forall(_.contains(q))).foreach { q =>
      try {
        val (tSmall, _) = time(q, src)
        val (tBig, nBig) = time(q, out)
        val ratio = tBig / math.max(tSmall, 0.001)
        println(f"SMOKE $q%-24s $tSmall%7.2fs $tBig%9.2fs $ratio%6.1fx  $nBig")
        results.update(q, (tSmall, tBig, nBig))
      } catch {
        case e: Throwable =>
          failures += q
          println(s"SMOKE $q FAILED: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(120)}")
      }
    }
    // machine artifact, same methodology keys as Bench (cold cache;
    // single interleaved small/big pass per query — a 10×-ratio check,
    // not a median timing)
    val qJson = results.map { case (q, (s0, s1, n1)) =>
      f""""$q":{"sf01":$s0%.3f,"sf1":$s1%.3f,"ratio":${s1 / math.max(s0, 0.001)}%.2f,"rows_sf1":$n1}"""
    }.mkString(",")
    println(s"""SCALE_JSON {"metric":"sf1_sweep","unit":"sec","cache":"cold",""" +
      s""""sampling":"single-pass-paired","sf_small":"$src","sf_big":"$out",""" +
      s""""excluded":${Excluded.toSeq.sorted.mkString("[\"", "\",\"", "\"]")},""" +
      s""""failed":${
        if (failures.isEmpty) "[]"
        else failures.sorted.mkString("[\"", "\",\"", "\"]")},""" +
      s""""total_sf01":${results.values.map(_._1).sum},""" +
      s""""total_sf1":${results.values.map(_._2).sum},""" +
      s""""queries":{$qJson}}""")
    spark.stop()
  }
}
