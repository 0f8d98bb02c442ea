package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Agreement, Dedup, TrainingSet}

/** Fidelity-audit queries (a_*), span dedup, and the bloom decontaminate
  * path: internal-consistency invariants the DuckDB oracle also checks
  * end-to-end, plus hand fixtures for the semantics the big fixture
  * can't isolate.
  */
class AgreementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("a_gate_agreement: common ≤ min(exact, approx); exact side " +
      "matches p_quality_gate") {
    val rows = SparkEntry.queries("a_gate_agreement")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (e, a, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c <= math.min(e, a), s"row $r violates common ≤ min")
      assert(c > 0, s"sampled gate found nothing in common for $r")
    }
    val nExact = rows.map(_.getLong(1)).sum
    val gate = SparkEntry.queries("p_quality_gate")(spark, sf).count()
    assert(nExact == gate,
      s"agreement exact side $nExact != p_quality_gate $gate")
  }

  test("a_capped_pair_drift: drift rows really are the set difference " +
      "of the two tiers") {
    val docs = Tables.documents(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.jaccardPairs(docs, 0.8))
    val capped = pairSet(Dedup.jaccardPairs(docs, 0.8, maxDf = 2))
    val drift = SparkEntry.queries("a_capped_pair_drift")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(3)))
    val lost = drift.collect { case (p, "lost") => p }.toSet
    val gained = drift.collect { case (p, "gained") => p }.toSet
    assert(lost == exact -- capped)
    assert(gained == capped -- exact)
    // the fixture cap is chosen to make the audit non-trivial
    assert((lost ++ gained).nonEmpty, "drift fixture is degenerate")
  }

  test("d_span_dup: cross-doc spans count, within-doc repetition and " +
      "unique text do not") {
    import spark.implicits._
    val docs = Seq(
      // 1 & 2 share the 8-token prefix (tokens 0..7 covered in both)
      (1L, "a b c d e f g h x1 y1 z1"),
      (2L, "a b c d e f g h x2 y2 z2"),
      // 3 repeats an 8-gram WITHIN itself only — must not count
      (3L, "m n o p q r s t m n o p q r s t"),
      // 4 is unique
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
      // 5 is too short for any 8-gram
      (5L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.spanDupTokens(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 8L, 2L -> 8L), s"got $out")
  }

  test("d_span_dup: overlapping shared spans merge into one covered run") {
    import spark.implicits._
    // 9 shared tokens → two overlapping 8-grams → coverage 9, not 16
    val docs = Seq(
      (1L, "a b c d e f g h i x1"),
      (2L, "a b c d e f g h i x2")).toDF("doc_id", "text")
    val out = Dedup.spanDupTokens(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 9L, 2L -> 9L), s"got $out")
  }

  test("d_span_strip: removes exactly the covered run, keeps unique docs " +
      "verbatim, drops fully-covered docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1 z1"),
      (2L, "a b c d e f g h x2 y2 z2"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
      // 4 and 5: verbatim re-paste → fully covered → dropped
      (4L, "p q r s t u v w"),
      (5L, "p q r s t u v w")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "x1 y1 z1", 2L -> "x2 y2 z2",
      3L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9"), s"got $out")
  }

  test("stripBoilerplate: strips per-source frequent spans only; another " +
      "source's identical template survives below ITS threshold") {
    import spark.implicits._
    // source A: 4 docs, 3 of which open with the same 4-token banner
    // (df 3 ≥ ceil(0.5·4) = 2 → boilerplate); source B: 4 docs, ONE of
    // which carries A's banner verbatim (df 1 in B < 2 → kept — the
    // per-source partitioning is the point of the operator)
    val docs = Seq(
      (1L, "A", "nav home about contact w1 w2 w3 w4"),
      (2L, "A", "nav home about contact x1 x2 x3 x4"),
      (3L, "A", "nav home about contact y1 y2 y3 y4"),
      (4L, "A", "a1 a2 a3 a4 a5 a6 a7 a8"),
      (5L, "B", "nav home about contact b1 b2 b3 b4"),
      (6L, "B", "c1 c2 c3 c4 c5 c6 c7 c8"),
      (7L, "B", "d1 d2 d3 d4 d5 d6 d7 d8"),
      (8L, "B", "e1 e2 e3 e4 e5 e6 e7 e8"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.stripBoilerplate(docs, n = 4, minFrac = 0.5,
        minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "w1 w2 w3 w4", 2L -> "x1 x2 x3 x4", 3L -> "y1 y2 y3 y4",
      4L -> "a1 a2 a3 a4 a5 a6 a7 a8",
      5L -> "nav home about contact b1 b2 b3 b4",
      6L -> "c1 c2 c3 c4 c5 c6 c7 c8",
      7L -> "d1 d2 d3 d4 d5 d6 d7 d8",
      8L -> "e1 e2 e3 e4 e5 e6 e7 e8"), s"got $out")
  }

  test("d_span_strip is consistent with d_span_dup's coverage counts") {
    val docs = Tables.documents(spark, sf)
    val origLen = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n0"))
    val counts = Dedup.spanDupTokens(docs, 8)
    val stripped = Dedup.stripDupSpans(docs, 8)
      .select(col("doc_id"),
        size(split(col("text_stripped"), " ")).cast("long").as("n1"))
    // for every doc with dup coverage: n0 - n_dup_tokens == n1
    val bad = origLen.join(counts, "doc_id").join(stripped, "doc_id")
      .filter(col("n0") - col("n_dup_tokens") =!= col("n1"))
      .count()
    assert(bad == 0)
  }

  test("p_decontaminate_bloom equals the single-phase exact result") {
    val exact = SparkEntry.queries("p_decontaminate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = SparkEntry.queries("p_decontaminate_bloom")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("a_source_overlap: a fingerprint planted in three sources scores " +
      "all three pairs once; per-source duplicates never double-count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the shared 7-token phrase yields identical winnow fingerprints in
    // every doc that carries it; fillers are per-doc unique words
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"u1a u1b $shared u1c u1d", "s1"),
      (2L, s"u2a u2b $shared u2c u2d", "s1"), // same source dup: 1 fp
      (3L, s"u3a u3b $shared u3c u3d", "s2"),
      (4L, s"u4a u4b $shared u4c u4d", "s3"),
      (5L, "v5a v5b v5c v5d v5e v5f v5g v5h v5i", "s4") // no overlap
    ).toDF("doc_id", "text", "source")
    val got = graft.pipeline.Agreement.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // every cross-source pair among {s1, s2, s3} shares ≥ 1 fp; s4 none
    assert(got.intersect(Set(("s1","s2"), ("s1","s3"), ("s2","s3")))
      .size == 3)
    assert(!got.exists(p => p._1 == "s4" || p._2 == "s4"))
    // registered query is non-empty on the real fixture and symmetric-
    // free (src_a < src_b always)
    val real = SparkEntry.queries("a_source_overlap")(spark, sf).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getString(0) < r.getString(1)))
  }

  test("a_bootstrap_ci: 64 replicates, rank-consistent CI, Poisson mass " +
      "where it should be, and the CI brackets the true mean") {
    val rows = SparkEntry.queries("a_bootstrap_ci")(spark, sf).collect()
    assert(rows.length == 64)
    val lo = rows.map(_.getLong(3)).distinct
    val hi = rows.map(_.getLong(4)).distinct
    assert(lo.length == 1 && hi.length == 1,
      "CI columns must be constant across replicate rows")
    assert(lo.head <= hi.head)
    // ranks 4..61 sit inside the CI by construction → ≥ 58 of 64 rows
    val inside = rows.count(r =>
      r.getLong(2) >= lo.head && r.getLong(2) <= hi.head)
    assert(inside >= 58, s"only $inside replicate means inside the CI")
    // each replicate draws ~n docs (sum of Poisson(1) weights)
    val n = Tables.documents(spark, sf).count()
    for (r <- rows) {
      val drawn = r.getLong(1)
      assert(math.abs(drawn - n) <= n / 5,
        s"replicate ${r.getLong(0)} drew $drawn of $n")
    }
    // deterministic fixture: the CI brackets the corpus's true mean
    val truth = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"),
        count(lit(1)).as("n")).collect()(0)
    val trueMicro = truth.getLong(0) * 1000000L / truth.getLong(1)
    assert(lo.head <= trueMicro && trueMicro <= hi.head,
      s"true mean $trueMicro outside [$lo, $hi]")
  }
}
