package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity
import graft.streaming.EmbeddingDedupStream

/** The streaming embedding near-dup ingest must match a
  * from-first-principles simulation of its drop rule: process batches
  * in order; a batch vector is flagged when it exact-cosine-verifies
  * against a SURVIVING index vector it collides with (one-sided
  * multi-probe: batch home+probe rows vs index home rows) or against a
  * smaller-id vector of its own batch (either-side-home collision, the
  * cappedPairs homeCol rule); survivors join the index. The simulation
  * recomputes signatures, probe flips, and cosines directly from
  * [[Similarity.planeComponent]] — nothing is shared with the engine
  * path but the plane family.
  */
class EmbeddingDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  // sf0.01 = 500 vectors, 6 exact >0.47 pairs — enough signal for the
  // forced (6 bits × 4 tables × 2 probes) plan to flag non-vacuously
  private val sf = "/root/testdata/sf0.01"
  private val (bits, tables, probes) = (6, 4, 2)
  private val threshold = 0.47

  private def norm(v: Seq[Double]): Array[Double] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    v.map(_ / n).toArray
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  /** (home set, home ∪ probe set) of (table, sig) keys for one vector —
    * the same sig + lowest-|dot| flip rule as HyperplaneProbeSigs.
    */
  private def sigSets(v: Array[Double])
      : (Set[(Int, Int)], Set[(Int, Int)]) = {
    val home = scala.collection.mutable.Set.empty[(Int, Int)]
    val all = scala.collection.mutable.Set.empty[(Int, Int)]
    for (t <- 0 until tables) {
      val d = (0 until bits).map(b => (0 until v.length).foldLeft(0.0)(
        (a, i) => a + v(i) * Similarity.planeComponent(t, b, i)))
      val sig = (0 until bits).map(b => if (d(b) > 0) 1 << b else 0).sum
      home += ((t, sig)); all += ((t, sig))
      val order = (0 until bits).sortBy(b => (math.abs(d(b)), b))
      for (p <- 0 until probes) all += ((t, sig ^ (1 << order(p))))
    }
    (home.toSet, all.toSet)
  }

  test("three-batch stream matches the sequential ground-truth " +
      "simulation; replay is idempotent") {
    val root = Files.createTempDirectory("embdedup").toString
    val (src, idx, flagged, ckpt) = (s"$root/src", s"$root/index",
      s"$root/flagged", s"$root/ckpt")

    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val batches = (1 to 3).map(k =>
      emb.filter(pmod(col("vec_id"), lit(3)) === k % 3))

    batches(0).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(emb.schema).parquet(src)
    val q = EmbeddingDedupStream.start(stream, idx, flagged,
      bits, tables, probes, ckpt, threshold)
    try {
      q.processAllAvailable()
      batches(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      batches(2).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()

    // ---- ground-truth simulation --------------------------------
    val vecs = emb.collect().map(r => r.getLong(0) ->
      norm(r.getSeq[Float](1).map(_.toDouble))).toMap
    val sigs = vecs.map { case (id, v) => id -> sigSets(v) }
    def near(a: Long, b: Long): Boolean = dot(vecs(a), vecs(b)) > threshold
    // one-sided: a (probing) collides with b (indexed home rows)
    def candDir(a: Long, b: Long): Boolean =
      (sigs(a)._2 intersect sigs(b)._1).nonEmpty
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    def dropsOf(batch: Set[Long], index: Set[Long]): Set[Long] = {
      val intra = for (a <- batch; b <- batch
        if a < b && (candDir(a, b) || candDir(b, a)) && near(a, b))
        yield b
      val vsIndex = for (a <- batch; b <- index
        if candDir(a, b) && near(a, b)) yield a
      intra ++ vsIndex
    }
    val b = batches.map(ids)
    val d1 = dropsOf(b(0), Set.empty)
    val i1 = b(0) -- d1
    val d2 = dropsOf(b(1), i1)
    val i2 = i1 ++ (b(1) -- d2)
    val d3 = dropsOf(b(2), i2)
    val expectIndex = i2 ++ (b(2) -- d3)
    val expectFlagged = d1 ++ d2 ++ d3

    assert(ids(spark.read.parquet(flagged)) == expectFlagged)
    assert(ids(spark.read.parquet(s"$idx/vecs")) == expectIndex)
    assert(ids(spark.read.parquet(s"$idx/sigs")) == expectIndex)
    // the index stores HOME rows only: tables rows per survivor
    assert(spark.read.parquet(s"$idx/sigs").count() ==
      expectIndex.size.toLong * tables)
    // non-vacuous: something was flagged, something survived, and at
    // least one flag came from a cross-batch index collision
    assert(expectFlagged.nonEmpty && expectIndex.nonEmpty)
    assert((d2 ++ d3).nonEmpty, "no batch collided with the index")

    // at-least-once replay: re-running batch 1 (same batchId) AFTER
    // batches 2-3 committed must leave index and flagged output
    // identical — batch=<id> overwrite plus AS-OF (batch < id) index
    // reads make the retry idempotent. Exclude-self reads are NOT
    // enough here: one-sided probing is asymmetric, and this exact
    // replay flagged vec 406 against a later batch's survivor (338 —
    // cand(406->338) holds, cand(338->406) does not) before the as-of
    // read was pinned
    EmbeddingDedupStream.ingestBatch(batches(0), batchId = 0,
      idx, flagged, bits, tables, probes, threshold)
    assert(ids(spark.read.parquet(flagged)) == expectFlagged)
    assert(ids(spark.read.parquet(s"$idx/vecs")) == expectIndex)
  }

  test("stream ≡ batch: with everything in ONE batch, the flagged set " +
      "equals the batch tier's pair-derived larger-id drops") {
    val root = Files.createTempDirectory("embdedup1").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    EmbeddingDedupStream.ingestBatch(emb, batchId = 0,
      s"$root/index", s"$root/flagged", bits, tables, probes, threshold)
    val flagged = spark.read.parquet(s"$root/flagged")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // the batch tier at the SAME forced plan: its (va < vb) verified
    // pairs; the stream's single-batch drop rule flags every vb
    val pairs = graft.pipeline.Fingerprints.embeddingDupLsh(spark, sf,
        widthOverride = Some((bits, tables)),
        probeOverride = Some(probes)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    assert(flagged == pairs.map(_._2).toSet)
    assert(flagged.nonEmpty)
  }

  test("sketch-screened ingest: flags are a subset of the unscreened " +
      "run on identical input, and a planted exact duplicate (Hamming " +
      "0) is always flagged through the screen") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val minId = emb.agg(min("vec_id")).head().getLong(0)
    // batch 1 = an exact copy of the smallest-id vector under a new id:
    // cross-batch index collision with signature Hamming 0 — the screen
    // must be transparent to it at ANY margin
    val planted = emb.filter(col("vec_id") === minId)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    def run(screen: Option[Double]): Set[Long] = {
      val root = Files.createTempDirectory("embscr").toString
      EmbeddingDedupStream.ingestBatch(emb, batchId = 0,
        s"$root/index", s"$root/flagged", bits, tables, probes,
        threshold, screenSigmas = screen)
      EmbeddingDedupStream.ingestBatch(planted, batchId = 1,
        s"$root/index", s"$root/flagged", bits, tables, probes,
        threshold, screenSigmas = screen)
      spark.read.parquet(s"$root/flagged")
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val unscreened = run(None)
    val screened = run(Some(2.5))
    // the subset law is PER BATCH AGAINST EQUAL PRIOR STATE (screening
    // an earlier batch can grow the index a later batch is checked
    // against); batch 1 being the single planted row keeps the whole
    // run inside the law: batch 0 sees an empty index in both runs,
    // batch 1's only possible flag is the planted duplicate
    assert(screened.subsetOf(unscreened),
      s"screened ${screened.size} ⊄ unscreened ${unscreened.size}")
    assert(screened.contains(minId + 10000000L),
      "planted exact duplicate did not survive the screen")
    assert(unscreened.contains(minId + 10000000L))
  }

  test("compaction preserves as-of reads: ingest → compact → replay " +
      "the newest batch → identical flags; later batches match an " +
      "uncompacted twin; partition count collapses") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    def batchOf(i: Int) = emb.filter(pmod(col("vec_id"), lit(5)) === i)
    def flagsOf(root: String, b: Long): Set[Long] =
      spark.read.parquet(s"$root/flagged/batch=$b")
        .collect().map(_.getLong(0)).toSet
    def parts(root: String, name: String): Int =
      new java.io.File(s"$root/index/$name")
        .listFiles().count(_.getName.startsWith("batch="))
    def ingest(root: String, i: Int): Unit =
      EmbeddingDedupStream.ingestBatch(batchOf(i), batchId = i,
        s"$root/index", s"$root/flagged", bits, tables, probes,
        threshold, screenSigmas = Some(2.5))
    val plain = Files.createTempDirectory("embnocomp").toString
    val comp = Files.createTempDirectory("embcomp").toString
    for (i <- 0 until 4) { ingest(plain, i); ingest(comp, i) }
    val before = flagsOf(comp, 3)
    assert(parts(comp, "sigs") == 4 && parts(comp, "vecs") == 4)
    EmbeddingDedupStream.compact(spark, s"$comp/index")
    // batches 0..2 folded into batch=2; batch=3 (the newest — the only
    // replayable id under foreachBatch) untouched
    assert(parts(comp, "sigs") == 2 && parts(comp, "vecs") == 2,
      "fold did not collapse the old partitions")
    // replay of the newest batch: as-of (batch < 3) now reads the
    // merged partition — same content, same deterministic decision
    ingest(comp, 3)
    assert(flagsOf(comp, 3) == before,
      "replay after compaction changed the newest batch's flags")
    // a later batch over the compacted index matches the uncompacted
    // twin exactly
    ingest(plain, 4); ingest(comp, 4)
    assert(flagsOf(comp, 4) == flagsOf(plain, 4),
      "post-compaction batch diverged from the uncompacted twin")
    // idempotent: nothing left below the newest worth folding changes
    // semantics — a second compact folds {2,3} leaving {3,4} reads
    // intact for a hypothetical batch 5
    EmbeddingDedupStream.compact(spark, s"$comp/index")
    val p5 = EmbeddingDedupStream.batchPlan(batchOf(0), batchId = 5,
      s"$comp/index", bits, tables, probes, threshold,
      graft.pipeline.Fingerprints.DefaultBucketCap, None)
    assert(p5.drops.count() >= 0)
    p5.release()
  }

  test("past-dial candidate-bounded fetch: forcing the broadcast dial " +
      "to 0 (every batch takes the semi-pruned index fetch) flags the " +
      "identical set, screened and unscreened") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    def run(dial: Option[Long], screen: Option[Double]): Set[Long] = {
      dial match {
        case Some(d) =>
          spark.conf.set("graft.broadcastFetchMaxRows", d.toString)
        case None => spark.conf.unset("graft.broadcastFetchMaxRows")
      }
      try {
        val root = Files.createTempDirectory("embdial").toString
        for (b <- 0 until 2)
          EmbeddingDedupStream.ingestBatch(
            emb.filter(pmod(col("vec_id"), lit(2)) === b), batchId = b,
            s"$root/index", s"$root/flagged", bits, tables, probes,
            threshold, screenSigmas = screen)
        spark.read.parquet(s"$root/flagged")
          .select("vec_id").collect().map(_.getLong(0)).toSet
      } finally spark.conf.unset("graft.broadcastFetchMaxRows")
    }
    for (screen <- Seq(None, Some(2.5))) {
      val viaBroadcast = run(None, screen)
      val viaSemi = run(Some(0L), screen)
      assert(viaSemi == viaBroadcast,
        s"past-dial fetch diverged (screen=$screen): " +
          s"semi=$viaSemi broadcast=$viaBroadcast")
      assert(viaBroadcast.nonEmpty, "vacuous dial equivalence")
    }
  }
}
