package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Fingerprints, Similarity}

/** The adaptive-LSH sizing contract ([[Similarity.lshPlan]] — round 14,
  * VERDICT r13 top item): the width rule must reproduce the historical
  * fixture constants at fixture sizes, grow with the corpus, and —
  * pinned at TWO forced widths — must not trade recall when the width
  * grows, because [[Similarity.lshTables]] compensates with tables.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("lshPlan reproduces the round-12 fixture constants and widens " +
      "with the corpus") {
    // dedup design point: 500- and 2000-vector corpora = 4 bits × 12
    // tables (the constants the fixture benches/oracles were built on)
    assert(Similarity.lshPlan(500, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) === (4, 12))
    assert(Similarity.lshPlan(2000, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) === (4, 12))
    // the 10× tier widens to 8 bits; tables hit the index-cost cap
    assert(Similarity.lshPlan(20000, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) === (8, 16))
    // ANN design point: the historical 4 bits × 8 tables at fixture n
    assert(Similarity.lshPlan(500, Similarity.AnnCos,
      Similarity.AnnRecall) === (4, 8))
    assert(Similarity.lshPlan(2000, Similarity.AnnCos,
      Similarity.AnnRecall) === (4, 8))
    // monotone: more vectors never narrows the signature
    val widths = Seq(500L, 5000L, 50000L, 500000L).map(n =>
      Similarity.lshPlan(n, Fingerprints.EmbDupCos,
        Fingerprints.EmbDupRecall)._1)
    assert(widths === widths.sorted)
    // bounded: the clamps hold at the extremes
    assert(Similarity.lshPlan(1, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)._1 === 4)
    assert(Similarity.lshPlan(Long.MaxValue, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)._1 === 16)
  }

  test("embedding-LSH recall holds at BOTH widths when tables follow " +
      "lshTables — width adaptivity cannot silently trade recall") {
    val exact = SparkEntry.queries("d_embedding_dup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    for (bits <- Seq(4, 8)) {
      val tables = Similarity.lshTables(bits, Fingerprints.EmbDupCos,
        Fingerprints.EmbDupRecall)
      val got = Fingerprints.embeddingDupLsh(spark, sf,
          widthOverride = Some((bits, tables))).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(got.contains).toDouble / exact.size
      assert(recall >= 0.5,
        s"width $bits ($tables tables): recall $recall over ${exact.size}")
      // precision stays 1.0 at any width: candidates are re-verified
      // with the exact dot > threshold predicate
      assert((got -- exact).isEmpty,
        s"width $bits produced a non-exact pair")
    }
  }

  test("HyperplaneSigs: codegen output is bit-identical to the " +
      "composed lshSignature columns; interpreted eval agrees; " +
      "null/length contract holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      1L -> Seq.tabulate(64)(i => math.sin(i + 1.0)),
      2L -> Seq.fill(64)(0.0), // every dot 0 → no bit set → sig 0
      3L -> Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0),
      4L -> Seq.tabulate(64)(i => 1e-12 * (32.0 - i)))
    val df = vecs.toDF("id", "v")
    val tables = 5; val bits = 7
    val nat = df.orderBy("id").select(
        graft.functions.HyperplaneSigs.hyperplane_sigs(
          col("v"), tables, bits, 64))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val composed = df.orderBy("id").select(
        array((0 until tables).map(t =>
          graft.pipeline.Similarity.lshSignature(col("v"), t, bits, 64))
          : _*))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(nat == composed)
    assert(nat(1) == Seq.fill(tables)(0)) // the zero vector
    // interpreted path: eval() on a Literal child walks nullSafeEval,
    // not the generated code — must agree with the DataFrame route
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (((_, v), i) <- vecs.zipWithIndex) {
      val lit = Literal.create(v, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
      val got = graft.functions.HyperplaneSigs(lit, tables, bits, 64)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(got == nat(i), s"interpreted != codegen for vector $i")
    }
    // contract: null input → null; wrong length → null (corrupt input)
    assert(graft.functions.HyperplaneSigs(
      Literal.create(null, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)), tables, bits, 64)
      .eval(null) == null)
    assert(Seq(Seq(1.0, 2.0)).toDF("v").select(
        graft.functions.HyperplaneSigs.hyperplane_sigs(
          col("v"), tables, bits, 64))
      .head().isNullAt(0))
  }

  test("lshParams probe depth: zero across the whole fixture/oracle " +
      "regime, engages exactly when maxTables caps the uncapped count") {
    // fixture + oracle contract sizes: no probes, so static SQL and
    // benches are unchanged by construction
    for (n <- Seq(500L, 2000L, 2048L)) {
      assert(Similarity.lshParams(n, Fingerprints.EmbDupCos,
        Fingerprints.EmbDupRecall).probes === 0, s"n=$n")
      assert(Similarity.lshParams(n, Similarity.AnnCos,
        Similarity.AnnRecall).probes === 0, s"n=$n")
    }
    // the 10× tier: 8 bits need 67 uncapped tables -> ceil(67/16)-1 = 4
    assert(Similarity.lshParams(20000, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall) ===
      Similarity.LshParams(8, 16, 4))
    // the 100× tier saturates maxProbes
    assert(Similarity.lshParams(200000, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall).probes === 8)
    // probes stay flippable: always < bits, even at tiny widths
    for (n <- Seq(1L, 100000L, Long.MaxValue)) {
      val p = Similarity.lshParams(n, Fingerprints.EmbDupCos,
        Fingerprints.EmbDupRecall)
      assert(p.probes >= 0 && p.probes < p.bits, s"n=$n: $p")
    }
  }

  test("multi-probe buys recall back at a capped table budget — " +
      "pinned at two widths × two probe depths; precision stays 1.0") {
    // sf0.01 (6 exact pairs): the 4-table budget starves the home
    // buckets at these forced widths (measured 1/6 at 6 bits, 0/6 at
    // 8), which is exactly the deficit regime lshParams' probe rule
    // targets — probing must STRICTLY recover pairs at both widths
    // (measured: 6 bits 1/6 -> 5/6, 8 bits 0/6 -> 2/6)
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("d_embedding_dup")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    for (bits <- Seq(6, 8)) {
      val found = for (probes <- Seq(0, 2)) yield {
        val got = Fingerprints.embeddingDupLsh(spark, sf01,
            widthOverride = Some((bits, 4)),
            probeOverride = Some(probes)).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        spark.catalog.clearCache()
        // candidates are exact-dot re-verified, so probing can only ADD
        // true pairs, never a false one
        assert((got -- exact).isEmpty,
          s"bits=$bits probes=$probes produced a non-exact pair")
        exact.count(got.contains)
      }
      assert(found(1) > found(0),
        s"bits=$bits: probe-2 recall ${found(1)} !> probe-0 ${found(0)}")
      info(s"bits=$bits tables=4: recall ${found(0)}/${exact.size} -> " +
        s"${found(1)}/${exact.size}")
    }
  }

  test("HyperplaneProbeSigs: probes=0 is bit-identical to " +
      "HyperplaneSigs; probe elements flip exactly the lowest-|dot| " +
      "bits; interpreted eval agrees with codegen; null contract holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      1L -> Seq.tabulate(64)(i => math.sin(i + 1.0)),
      2L -> Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0),
      3L -> Seq.tabulate(64)(i => 1e-9 * (32.0 - i)))
    val df = vecs.toDF("id", "v")
    val tables = 3; val bits = 6; val probes = 2
    // probes = 0 degenerates to the home-only expression
    val p0 = df.orderBy("id").select(
        graft.functions.HyperplaneSigs.hyperplane_probe_sigs(
          col("v"), tables, bits, 64, 0))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val home = df.orderBy("id").select(
        graft.functions.HyperplaneSigs.hyperplane_sigs(
          col("v"), tables, bits, 64))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(p0 == home)
    // probe layout + semantics, checked against a from-first-principles
    // recomputation of the plane dots
    val out = df.orderBy("id").select(
        graft.functions.HyperplaneSigs.hyperplane_probe_sigs(
          col("v"), tables, bits, 64, probes))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    for (((_, v), r) <- vecs.zip(out)) {
      assert(r.size == tables * (1 + probes))
      for (t <- 0 until tables) {
        val d = (0 until bits).map(b => (0 until 64).map(i =>
          v(i) * Similarity.planeComponent(t, b, i)).sum)
        val sig = (0 until bits).map(b =>
          if (d(b) > 0) 1 << b else 0).sum
        assert(r(t * (1 + probes)) == sig)
        val order = (0 until bits).sortBy(b => (math.abs(d(b)), b))
        for (p <- 0 until probes)
          assert(r(t * (1 + probes) + 1 + p) == (sig ^ (1 << order(p))),
            s"table $t probe $p")
      }
    }
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (((_, v), i) <- vecs.zipWithIndex) {
      val lit0 = Literal.create(v, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
      val got = graft.functions.HyperplaneProbeSigs(
          lit0, tables, bits, 64, probes)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(got == out(i), s"interpreted != codegen for vector $i")
    }
    // null / corrupt-length contract mirrors HyperplaneSigs
    assert(graft.functions.HyperplaneProbeSigs(
      Literal.create(null, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)), tables, bits, 64, probes)
      .eval(null) == null)
    assert(Seq(Seq(1.0, 2.0)).toDF("v").select(
        graft.functions.HyperplaneSigs.hyperplane_probe_sigs(
          col("v"), tables, bits, 64, probes))
      .head().isNullAt(0))
    // shape guard: probes must stay flippable
    intercept[IllegalArgumentException] {
      graft.functions.HyperplaneProbeSigs(
        Literal.create(Seq(1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), 1, 4, 1, 4)
    }
  }

  test("cappedPairs homeCol: probe×probe pairs are excluded in small " +
      "buckets; the star tier connects the whole bucket regardless") {
    import spark.implicits._
    val frame = Seq(
      (1L, 0, 7, true),   // home in bucket (0,7)
      (2L, 0, 7, false),  // probe row visiting (0,7)
      (3L, 0, 7, false),  // probe row visiting (0,7)
      (4L, 0, 9, true), (5L, 0, 9, true) // plain home bucket
    ).toDF("vec_id", "t", "sig", "home")
    def pairs(cap: Int) = Fingerprints.cappedPairs(frame, Seq("t", "sig"),
        "vec_id", cap = cap, homeCol = Some("home"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // small-bucket rule: (2,3) is probe×probe — neither side indexes
    // that bucket, so it is not a candidate; home×probe and home×home are
    assert(pairs(1000) == Set((1L, 2L), (1L, 3L), (4L, 5L)))
    // star tier (cap below the bucket size): min-id representative
    // pairs with every member, probe provenance ignored
    assert(pairs(2) == Set((1L, 2L), (1L, 3L), (4L, 5L)))
  }

  test("lshTables compensation: per the collision model, wider " +
      "signatures need more tables for the same recall") {
    val t4 = Similarity.lshTables(4, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)
    val t8 = Similarity.lshTables(8, Fingerprints.EmbDupCos,
      Fingerprints.EmbDupRecall)
    assert(t4 === 12) // the historical constant falls out of the model
    assert(t8 > t4)
  }

  test("SigHamming: codegen, interpreted, and the zip_with reference " +
      "agree; null/length contract holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pairs = Seq(
      (Seq(0, 0, 0), Seq(0, 0, 0)),            // identical → 0
      (Seq(0xF, 0, 0), Seq(0, 0, 0)),          // 4 bits in one element
      (Seq(0x7FF, 0x3AC, 0x001), Seq(0x400, 0x3AC, 0x000)),
      (Seq(-1, -1), Seq(0, 0)))                // full 32-bit words → 64
    val df = pairs.toDF("a", "b")
    val nat = df.select(graft.functions.SigHamming.sig_hamming(
      col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    // Spark's bit_count promotes to BIGINT (-1 counts 64 bits); mask the
    // reference to the 32-bit word SigHamming counts — signatures are
    // non-negative by the bits ≤ 30 contract, so the two only differ on
    // out-of-contract negative words, where per-word popcount is the
    // honest semantics for packed 32-bit signatures
    val ref = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => bit_count(x.bitwiseXOR(y).cast("bigint")
          .bitwiseAND(lit(0xFFFFFFFFL))).cast("int")),
      lit(0), (acc, x) => acc + x)).collect().map(_.getInt(0)).toSeq
    assert(nat == ref)
    assert(nat == Seq(0, 4,
      pairs(2)._1.zip(pairs(2)._2)
        .map { case (x, y) => Integer.bitCount(x ^ y) }.sum, 64))
    // interpreted path (eval on Literal children) agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    val intTpe = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType)
    for (((a, b), i) <- pairs.zipWithIndex) {
      val got = graft.functions.SigHamming(
        Literal.create(a, intTpe), Literal.create(b, intTpe)).eval(null)
      assert(got == nat(i), s"interpreted != codegen for pair $i")
    }
    // null contract: null side → null; LENGTH mismatch → null (corrupt
    // signatures must surface, not deflate the distance)
    assert(graft.functions.SigHamming(
      Literal.create(null, intTpe), Literal.create(Seq(1), intTpe))
      .eval(null) == null)
    assert(Seq((Seq(1, 2, 3), Seq(1, 2))).toDF("a", "b")
      .select(graft.functions.SigHamming.sig_hamming(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("screenMaxHamming reproduces the design-point budgets and is " +
      "monotone in the margin") {
    // sf10 plan (11 bits × 16 tables, B = 176): budget 77 — the ~17×
    // random-mass cut the scaladoc quotes
    assert(Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 16, 11,
      2.5) === 77)
    // fixture plan (4 bits × 12 tables, B = 48): budget 25
    assert(Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 12, 4,
      2.5) === 25)
    // a wider margin never tightens the budget; budget grows with B
    val b1 = Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 16, 11, 2.0)
    val b2 = Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 16, 11, 3.0)
    assert(b1 <= b2)
    assert(Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 16, 11,
      2.5) > Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 12, 4,
      2.5))
  }

  test("sketch-screened tier is a subset of the unscreened tier; an " +
      "identical pair always survives the screen") {
    // sf0.001 (500 vectors): the adaptive plan is (4, 12, probes 0);
    // the screen rides the same candidates, so screened ⊆ unscreened
    // by construction — pinned here against regressions in the wiring
    val un = Fingerprints.embeddingDupLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scr = Fingerprints.embeddingDupLsh(spark, sf,
        screenSigmas = Some(Fingerprints.ScreenSigmas))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scr.subsetOf(un), s"screened ${scr.size} ⊄ unscreened ${un.size}")
    info(s"screened kept ${scr.size}/${un.size} fixture pairs")
    // an identical pair has Hamming 0 ≤ any budget — the planted-dup
    // guarantee the stream's screened ingest leans on
    assert(Similarity.screenMaxHamming(Fingerprints.EmbDupCos, 12, 4,
      Fingerprints.ScreenSigmas) >= 0)
  }

  test("a_screen_drift: non-vacuous at the forced austerity margin, " +
      "lost-only, and exactly the recomputed set difference") {
    spark.catalog.clearCache()
    val drift = Fingerprints.screenDrift(spark, sf).collect()
    spark.catalog.clearCache()
    val un = Fingerprints.embeddingDupLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val scr = Fingerprints.embeddingDupLsh(spark, sf,
        screenSigmas = Some(Fingerprints.ScreenDriftSigmas))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    // the audit must show real loss at the forced margin (a vacuous
    // drift audit pins nothing) and never a "gained" row — the screen
    // only FILTERS the same candidate set
    assert(drift.nonEmpty, "austerity-margin drift is vacuous")
    assert(drift.forall(_.getString(3) == "lost"),
      s"impossible 'gained' rows: ${drift.toSeq}")
    assert(drift.map(r => (r.getLong(0), r.getLong(1))).toSet == un -- scr)
    // every lost pair is a true >0.47 pair (it came from the verified
    // unscreened set), visible in its carried cosine — asserted on >=
    // because the carried column is ROUNDED to 4 decimals for the
    // oracle hash: a true pair at e.g. 0.47004 rounds to 0.4700 and a
    // strict > would spuriously fail on a value the verify accepted
    assert(drift.forall(_.getDouble(2) >= 0.47))
  }

  test("ANN flip-mask probing: masks enumerate the exact Hamming " +
      "radius, the modeled depth matches hand-computed values, and " +
      "complete-radius probing never loses recall vs home-only") {
    // mask enumeration: Σ C(bits, j), all within radius, 0 included
    val m2 = Similarity.flipMasks(11, 2)
    assert(m2.size == 1 + 11 + 55)
    assert(m2.forall(m => Integer.bitCount(m) <= 2))
    assert(m2.contains(0) && m2.distinct.size == m2.size)
    // modeled depth: the sf10 plan needs radius 2 for 0.90; the
    // fixture plan's 8 tables already clear 0.74 at radius 0
    assert(Similarity.annQueryFlipDepth(11, 16, Similarity.AnnCos,
      Similarity.AnnProbeRecall) == 2)
    assert(Similarity.annQueryFlipDepth(4, 8, Similarity.AnnCos,
      Similarity.AnnRecall) == 0)
    // recall monotonicity at fixture scale: candidates at depth ≥ 1
    // are a superset (mask 0), and exact re-rank makes true-top-10
    // overlap monotone in the candidate set
    import graft.pipeline.VectorOps
    import org.apache.spark.sql.functions.col
    def overlap(ann: org.apache.spark.sql.DataFrame): Long = {
      val bf = Similarity.queries("s_ann_bruteforce")(spark, sf)
        .select("qid", "nid")
      bf.join(ann.select("qid", "nid"), Seq("qid", "nid")).count()
    }
    val e = Tables.spread(Tables.embeddings(spark, sf))
      .select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("v"))
    val home = overlap(Similarity.annLshFlipMask(e, 4, 8, 64, 0))
    val r1 = overlap(Similarity.annLshFlipMask(e, 4, 8, 64, 1))
    assert(home > 0, "vacuous recall fixture")
    assert(r1 >= home, s"radius-1 recall $r1 < home-only $home")
    // depth 0 of the flip-mask builder ≡ the registered fixture tier's
    // candidates (same home-bucket join, same re-rank)
    val reg = Similarity.queries("s_ann_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fm0 = Similarity.annLshFlipMask(e, 4, 8, 64, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fm0 == reg, "flip-mask depth 0 diverged from the fixture tier")
  }

  test("batch tier past the broadcast dial: forcing " +
      "graft.broadcastFetchMaxRows=0 (candidate-bounded semi-pruned " +
      "fetch) reproduces the broadcast-path pairs, screened and " +
      "unscreened") {
    def pairs(dial: Boolean, screen: Option[Double]): Set[(Long, Long)] = {
      spark.catalog.clearCache()
      if (dial) spark.conf.set("graft.broadcastFetchMaxRows", "0")
      try Fingerprints.embeddingDupLsh(spark, sf, screenSigmas = screen)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset("graft.broadcastFetchMaxRows")
    }
    for (screen <- Seq(None, Some(Fingerprints.ScreenSigmas))) {
      val bc = pairs(dial = false, screen)
      val semi = pairs(dial = true, screen)
      assert(semi == bc, s"dial divergence (screen=$screen)")
      assert(bc.nonEmpty, "vacuous dial equivalence")
    }
  }
}
