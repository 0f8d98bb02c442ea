package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Boundary semantics of the blocklist gate that the oracle hash can't
  * localize: the cover-suppression rule, overlapping bigram counting,
  * the derivation window's tie-break, the per-category threshold edge,
  * and the one case where the declarative cover rule diverges from
  * greedy leftmost-longest consumption.
  */
class BlocklistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** The engine's category rule recomputed independently: first md5 hex
    * nibble mod 3.
    */
  private def cat(g: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    ((d(0) >> 4) & 0xf) % 3
  }

  private def catCounts(hits: Seq[String]): (Long, Long, Long) = {
    val m = hits.groupBy(cat).view.mapValues(_.size.toLong).toMap
    (m.getOrElse(0, 0L), m.getOrElse(1, 0L), m.getOrElse(2, 0L))
  }

  private def run(docs: Seq[(Long, String)], uniTake: Int, biTake: Int,
      maxCatHits: Long = 5L): Map[Long, (Long, Long, Long, Long, Long)] =
    TextAnalysis.blocklistGate(docs.toDF("doc_id", "text"),
        uniSkip = 0, uniTake = uniTake, biSkip = 0, biTake = biTake,
        maxCatHits = maxCatHits)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap

  test("a bigram hit suppresses its covered constituent unigrams; an " +
      "uncovered later occurrence still counts") {
    // top-2 unigrams by (count desc, gram asc): alpha(2), beta(1) —
    // beta beats gamma on the asc tie-break; top-1 bigram: "alpha beta"
    val r = run(Seq((1L, "alpha beta gamma alpha")), uniTake = 2,
      biTake = 1)
    // bigram @0 covers positions {0,1}: alpha@0 and beta@1 suppressed,
    // alpha@3 counts → hits = {"alpha beta", "alpha"}
    val (c0, c1, c2) = catCounts(Seq("alpha beta", "alpha"))
    assert(r(1L) == ((c0, c1, c2, 2L, 1L)))
  }

  test("overlapping bigram hits all count and jointly cover every " +
      "constituent position") {
    // bigrams of "x y x y x": "x y"(2), "y x"(2) — the only two; both
    // in the take-2 window. Hits @0,@2 ("x y") and @1,@3 ("y x") cover
    // positions 0-4 entirely, so no unigram hit survives.
    val r = run(Seq((1L, "x y x y x")), uniTake = 2, biTake = 2)
    val (c0, c1, c2) = catCounts(Seq("x y", "x y", "y x", "y x"))
    assert(r(1L) == ((c0, c1, c2, 4L, 1L)))
  }

  test("declarative cover rule vs greedy leftmost-longest: the " +
      "documented divergence case counts BOTH overlapping bigrams") {
    // "u v u": greedy consumption would take "u v"@0, leaving a lone
    // u@2 — one bigram hit. The declarative rule counts "u v"@0 AND
    // "v u"@1 (4 > 2 distinct bigrams never arise: only two exist).
    val r = run(Seq((1L, "u v u")), uniTake = 0, biTake = 2)
    val (c0, c1, c2) = catCounts(Seq("u v", "v u"))
    assert(r(1L) == ((c0, c1, c2, 2L, 1L)))
  }

  test("a doc with no blocklisted grams reports zeros and keeps") {
    // doc 2's tokens are rarer than doc 1's, so the take-1 windows
    // hold only doc 1's grams
    val r = run(Seq(
      (1L, "hot hot hot hot hot hot"),
      (2L, "cold mild")), uniTake = 1, biTake = 1, maxCatHits = 99L)
    assert(r(2L) == ((0L, 0L, 0L, 0L, 1L)))
    // the five chained "hot hot" hits cover positions 0-5 entirely, so
    // every "hot" unigram hit is suppressed
    val (c0, c1, c2) = catCounts(Seq.fill(5)("hot hot"))
    assert(r(1L) == ((c0, c1, c2, 5L, 1L)))
  }

  test("per-category threshold edge: exactly maxCatHits keeps, one " +
      "more drops") {
    // unigram-only list = {"t"}; doc 1 has 3 hits (== cap), doc 2 has 4
    val r = run(Seq(
      (1L, "t t t pad"),
      (2L, "t t t t")), uniTake = 1, biTake = 0, maxCatHits = 3L)
    assert(r(1L)._5 == 1L)
    assert(r(2L)._5 == 0L)
  }

  test("per-row expression scorer equals the join pipeline row for row " +
      "on a varied corpus (the stream twin's equality seam)") {
    import org.apache.spark.sql.functions.col
    // 40 docs over a 10-word vocabulary, lengths 5..13, deterministic
    val vocab = Vector("ape", "bat", "cow", "doe", "elk", "fox", "gnu",
      "hen", "ibis", "jay")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until (5 + i % 9))
        .map(j => vocab((i * 7 + j * (i + 3)) % 10)).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val (bl1, bl2) = TextAnalysis.blocklistTables(df,
      uniSkip = 1, uniTake = 4, biSkip = 2, biTake = 5)
    val uni = bl1.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val bi = bl2.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(uni.size == 4 && bi.size == 5)
    val viaExpr = df.select(col("doc_id"),
        TextAnalysis.blocklistScore(col("text"), uni, bi).as("s"))
      .collect()
      .map(r => r.getLong(0) -> (r.getStruct(1).getLong(0),
        r.getStruct(1).getLong(1), r.getStruct(1).getLong(2)))
      .toMap
    val viaJoin = TextAnalysis.blocklistGate(df,
        uniSkip = 1, uniTake = 4, biSkip = 2, biTake = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(viaExpr == viaJoin)
    assert(viaExpr.values.exists(_ != ((0L, 0L, 0L))), "non-vacuous")
  }

  test("derivation window tie-break: equal counts resolve by gram asc") {
    // "aa" and "ab" both appear twice; take-1 window must pick "aa"
    val r = run(Seq((1L, "aa ab aa ab")), uniTake = 1, biTake = 0)
    val (c0, c1, c2) = catCounts(Seq("aa", "aa"))
    assert(r(1L) == ((c0, c1, c2, 2L, 1L)))
  }
}
