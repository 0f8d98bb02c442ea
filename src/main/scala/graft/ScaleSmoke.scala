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
  // (a_emb_dup_recall rides d_embedding_dup's brute-force pair set —
  // it is run ONE-OFF at sf1 for the round recall artifact, where the
  // quadratic exact tier is still feasible, but stays out of sweeps)
  val Excluded = Set("d_ngram_jaccard", "d_embedding_dup",
    "d_embedding_dup_clusters", "s_ann_bruteforce", "a_emb_dup_recall")

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

  /** 100× tier synthesis (sf10 from sf0.1) for the ratio-flagged
    * DOCUMENT/EMBEDDING families — same contract as [[synthesize]]
    * (within-copy structure preserved, cross-copy randomized, pair
    * mass ×100 linear, not ×10000), but the 10×-tier randomizers have
    * PERIODS that break past 10 copies and are generalized:
    *   - documents: the word-salt gate moves from `xxhash64(w) % 10 ∈
    *     {c..c+2}` to `xxhash64(w) % 100 ∈ [c, c+30) mod 100` — the
    *     mod-10 gate repeats every 10 copies, so copies c and c+10
    *     would transform IDENTICALLY and plant 45 exact-duplicate
    *     cross-copy pairs per source doc;
    *   - embeddings: a per-copy deterministic SIGN MASK (negate dim i
    *     of copy c when xxhash64(c, i) is odd) replaces rotation — a
    *     64-dim rotation repeats at copy 64, planting identical
    *     vectors past it. A shared mask preserves within-copy cosine
    *     EXACTLY (m_i² = 1 termwise); distinct masks decorrelate
    *     cross-copy pairs like the rotation did.
    * The event/TPC-H tables pass through UNSCALED: their linear axes
    * (time-window density, fact-key joins) were swept at sf1 and the
    * sf10 subset is the documents/embeddings ratio-flagged families by
    * design — the artifact names the subset, nothing is silently
    * capped.
    */
  def synthesize100(spark: SparkSession, src: String, out: String): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()
    val copies = 100

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until copies).map { c =>
      val s = docs.withColumn("doc_id", col("doc_id") + lit(10000000L * c))
      if (c == 0) s
      else s.withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "), w => {
          val g = pmod(xxhash64(w), lit(copies))
          val in = // [c, c+30) mod 100, the wrapped window
            if (c + 30 <= copies) g >= c && g < c + 30
            else g >= c || g < (c + 30) % copies
          when(in, concat(w, lit("_"), lit(c))).otherwise(w)
        })))
    }.reduce(_ union _)
      .repartition(64)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until copies).map { c =>
      val s = emb.withColumn("vec_id", col("vec_id") + lit(10000000L * c))
      if (c == 0) s
      else s.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(pmod(xxhash64(lit(c), i), lit(2)) === 1, -x).otherwise(x)))
    }.reduce(_ union _)
      .repartition(64)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("events", "lineitem", "orders", "customer", "region",
        "nation", "supplier", "part"))
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
    // optional 4th arg: copies (10 = the sf1 tier, 100 = the sf10
    // document/embedding tier via synthesize100)
    val copies = args.lift(3).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    if (copies == 100) synthesize100(spark, src, out)
    else synthesize(spark, src, out)
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
    // audit-row capture (r14 verdict #4): the recall/drift audits'
    // VALUES belong in the artifact, not prose — for every a_* query
    // this sweep timed, embed the BIG tier's result rows (bounded to
    // 50) in the JSON so claims like "recall at 100×" are machine-
    // checkable against the artifact itself
    val auditRows = results.keys.filter(_.startsWith("a_")).map { q =>
      val rows =
        try {
          try spark.catalog.clearCache() catch { case _: Throwable => () }
          SparkEntry.queries(q)(spark, out).limit(50).collect()
            .map(_.toSeq.mkString("[", ",", "]")).mkString(";")
        } catch { case e: Throwable => s"error:${e.getClass.getSimpleName}" }
      s""""$q":"${rows.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString(",")
    // machine artifact, same methodology keys as Bench (cold cache;
    // single interleaved small/big pass per query — a 10×-ratio check,
    // not a median timing)
    val qJson = results.map { case (q, (s0, s1, n1)) =>
      f""""$q":{"sf01":$s0%.3f,"sf1":$s1%.3f,"ratio":${s1 / math.max(s0, 0.001)}%.2f,"rows_sf1":$n1}"""
    }.mkString(",")
    val metric = if (copies == 100) "sf10_sweep" else "sf1_sweep"
    println(s"""SCALE_JSON {"metric":"$metric","copies":$copies,""" +
      s""""unit":"sec","cache":"cold",""" +
      s""""sampling":"single-pass-paired","sf_small":"$src","sf_big":"$out",""" +
      s""""excluded":${Excluded.toSeq.sorted.mkString("[\"", "\",\"", "\"]")},""" +
      s""""failed":${
        if (failures.isEmpty) "[]"
        else failures.sorted.mkString("[\"", "\",\"", "\"]")},""" +
      s""""total_sf01":${results.values.map(_._1).sum},""" +
      s""""total_sf1":${results.values.map(_._2).sum},""" +
      s""""audit_rows":{$auditRows},""" +
      s""""queries":{$qJson}}""")
    spark.stop()
  }
}
