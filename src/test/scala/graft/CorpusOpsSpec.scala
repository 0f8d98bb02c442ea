package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusOps

/** Semantics the round-trip oracles can't pin: the LM actually ranks
  * fluent text below gibberish, normalization edge cases, and the
  * shard layout's balance/reproducibility properties.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bigram LM scores repeated fluent text below unseen gibberish") {
    val docs = (
      (1 to 20).map(i => (i.toLong, "the cat sat on the mat")) :+
        (99L, "zq xv qj wk vx kq")
      ).toDF("doc_id", "text")
    val ce = CorpusOps.bigramCrossEntropy(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    // every bigram of the fluent doc occurs 20×; the gibberish doc's
    // bigrams are singletons over a vocab they barely share
    assert(ce(1L) < ce(99L),
      s"fluent ${ce(1L)} must score below gibberish ${ce(99L)}")
  }

  test("domain LM: in-target text scores below out-of-domain, unseen " +
      "bigrams stay finite") {
    val target = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (50L, "the cat sat on the mat"), // pure in-domain
      (60L, "zq xv qj wk vx kq")) // every bigram unseen by the target
      .toDF("doc_id", "text")
    val ce = CorpusOps.bigramCrossEntropyAgainst(target, docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(ce(50L) < ce(60L),
      s"in-domain ${ce(50L)} must score below ood ${ce(60L)}")
    assert(!ce(60L).isInfinite && !ce(60L).isNaN)
  }

  test("domain LM on the fixture: the en target slice is enriched in " +
      "the low-cross-entropy half") {
    val docs = Tables.documents(spark, sf)
    val scored = CorpusOps.bigramCrossEntropyAgainst(
        docs.filter(col("lang") === "en"), docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val half = scored.count() / 2
    val lowHalfEn = scored.orderBy("ce").limit(half.toInt)
      .filter(col("lang") === "en").count().toDouble / half
    val overallEn = scored.filter(col("lang") === "en").count().toDouble /
      scored.count()
    assert(lowHalfEn > overallEn,
      s"en share in low-ce half $lowHalfEn must exceed base rate $overallEn")
  }

  test("docs with fewer than two tokens drop out (no bigrams)") {
    val docs = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = CorpusOps.bigramCrossEntropy(docs).collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("normalize: case, punctuation, whitespace runs, trim") {
    val got = Seq(
      "  The CAT, sat!  ", "a-b_c", "!!!", "already clean")
      .toDF("text").select(CorpusOps.normalize(col("text")))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("the cat sat", "abc", "", "already clean"))
  }

  test("chunking: stride overlap, end clipping, short docs, guards") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (1 to 10).map("w" + _).mkString(" ")), // 10 tokens
      (2L, "tiny"))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(docs, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    // doc 1: starts 0,3,6 — window 6 covers through token 10, so a
    // start-9 chunk would be a strict suffix of it and must NOT emit
    assert(got.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 4L), (1L, 3L, 4L), (1L, 6L, 4L)))
    // doc 2: one chunk of its single token
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L)))
    // null text emits nothing (no phantom md5("") chunk)
    val withNull = Seq((9L, null: String)).toDF("doc_id", "text")
    assert(CorpusOps.chunkDocs(withNull, 4, 3).count() == 0L)
    // overlapping windows really share tokens: chunk(0) and chunk(3)
    // of doc 1 overlap on w4 — verified via the md5 of the overlap
    // reconstruction
    val full = CorpusOps.chunkDocs(docs.filter(col("doc_id") === 1L), 4, 3)
      .collect().map(r => (r.getLong(1), r.getString(3))).toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(full(0L) == h("w1 w2 w3 w4") && full(3L) == h("w4 w5 w6 w7"))
    intercept[IllegalArgumentException] {
      CorpusOps.chunkDocs(docs, 4, 5) // stride > window would skip text
    }
  }

  test("shard assignment: 16 shards, positions contiguous from 1, " +
      "deterministic, and balanced within 3x of uniform") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val a = CorpusOps.shardAssign(docs, "graft42")
    val n = a.count()
    val perShard = a.groupBy("shard").agg(
      count(lit(1)).as("c"), max("pos").as("maxp"), min("pos").as("minp"))
      .collect()
    assert(perShard.length == 16, "md5 low nibble must hit all 16 shards")
    perShard.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L,
        "pos must be a contiguous 1..count ranking per shard")
      val c = r.getLong(1).toDouble
      assert(c < 3.0 * n / 16 && c > n / 16 / 3.0,
        s"shard ${r.getLong(0)} has $c of $n rows — md5 should spread")
    }
    // different seed ⇒ different layout (the seed is real, not decor)
    val b = CorpusOps.shardAssign(docs, "other-seed")
    val moved = a.as("a").join(b.as("b"), "doc_id")
      .filter(col("a.shard") =!= col("b.shard")).count()
    assert(moved > 0, "changing the seed must move documents")
  }

  test("interleave: positions unique, every k·|sources| prefix holds at " +
      "most k docs per source, and the first cycle is one of each") {
    val rows = SparkEntry.queries("p_interleave_sources")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = rows.map(_._2).distinct.length
    assert(rows.map(_._3).distinct.length == rows.length,
      "positions must be unique")
    val byPos = rows.sortBy(_._3)
    // first cycle: n distinct sources (no source has < 1 doc here)
    assert(byPos.take(n).map(_._2).distinct.length == n)
    // anti-clumping bound for every full-cycle prefix
    for (k <- Seq(1, 3, 7, 15)) {
      val prefix = byPos.takeWhile(_._3 < k.toLong * n)
      prefix.groupBy(_._2).foreach { case (src, xs) =>
        assert(xs.length <= k, s"prefix k=$k holds ${xs.length} of $src")
      }
    }
    // deterministic across runs
    val again = SparkEntry.queries("p_interleave_sources")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
  }
}
