package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keeps the DiamondLint machinery honest (the enforcement contract its
  * scaladoc states):
  *   - a seeded unpersisted diamond with NO physical reuse must flag;
  *   - the same diamond persisted must pass (cache-backed — phase 1
  *     sees InMemoryRelation leaves, not file scans);
  *   - a logical diamond that physical ReusedExchange collapses must
  *     pass phase 2 (round 12's false-positive class: 35 of 36 raw
  *     structural findings were exchange-reuse, invisible at the
  *     logical level);
  *   - every [[DiamondLint.waivers]] entry must still flag — a STALE
  *     waiver (waived query no longer flags) fails here, so the list
  *     can only shrink truthfully;
  *   - the one genuine round-12 finding, t_heavy_hitters, stays fixed.
  */
class DiamondLintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.001"

  test("flags a seeded unpersisted diamond with no physical reuse") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    // the explode subtree feeds both union branches; no exchange sits
    // between the scan and the Generate, so ReuseExchange cannot
    // collapse it — the explode genuinely runs twice
    val ex = docs.select(explode(split(col("text"), " ")).as("w"))
    val dup = ex.filter(length(col("w")) > 2)
      .union(ex.filter(length(col("w")) <= 2))
    val findings = DiamondLint.lintFrame("seeded", dup)
    assert(findings.nonEmpty, "linter missed a genuine re-executed explode")
    assert(findings.head.occurrences >= 2)
    assert(findings.head.reusedExchange + findings.head.cachedReads <
      findings.head.required)
  }

  test("passes the same diamond once persisted (cache-backed)") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val ex = docs.select(explode(split(col("text"), " ")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dup = ex.filter(length(col("w")) > 2)
        .union(ex.filter(length(col("w")) <= 2))
      assert(DiamondLint.lintFrame("persisted", dup).isEmpty,
        "persisted diamond must not flag: its branches read the cache")
    } finally { ex.unpersist(); spark.catalog.clearCache() }
  }

  test("passes a logical diamond that ReusedExchange collapses") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    // self-join of one aggregate: the logical plan shows the Aggregate
    // subtree twice over file scans (phase 1 flags it), but the
    // physical plan computes the shuffle once and reuses the exchange —
    // phase 2 must adjudicate it clean
    val agg = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val joined = agg.as("a").join(agg.as("b"), Seq("lang"))
      .select(col("lang"), (col("a.n") + col("b.n")).as("nn"))
    val structural = DiamondLint.findDiamonds(
      joined.queryExecution.optimizedPlan)
    assert(structural.nonEmpty,
      "fixture broke: the self-joined aggregate should be a logical dup")
    assert(DiamondLint.lintFrame("reused", joined).isEmpty,
      "exchange-reused diamond must pass physical adjudication")
  }

  test("a persisted diamond cannot mask an unpersisted one (per-subtree attribution)") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    // diamond A: persisted explode x2 -> contributes 2 cached reads.
    // Under the old pooled check those 2 covered the WHOLE query's
    // required = (2-1)+(2-1) = 2 and diamond B shipped silently.
    val a = docs.select(explode(split(col("text"), " ")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val aDup = a.filter(length(col("w")) > 2)
        .union(a.filter(length(col("w")) <= 2))
      // diamond B: a DIFFERENT unpersisted explode x2, genuinely re-run
      val b = docs.select(explode(split(col("text"), "e")).as("w"))
      val bDup = b.filter(length(col("w")) > 2)
        .union(b.filter(length(col("w")) <= 2))
      val findings = DiamondLint.lintFrame("masked", aDup.union(bDup))
      assert(findings.nonEmpty,
        "pooled-evidence masking: persisted diamond A's surplus cached " +
          "reads hid unpersisted diamond B's re-execution")
    } finally { a.unpersist(); spark.catalog.clearCache() }
  }

  test("no stale waivers: every waived query still flags") {
    assert(DiamondLint.waivers.keySet.subsetOf(SparkEntry.queries.keySet),
      "waiver names a query that is not registered")
    for ((q, reason) <- DiamondLint.waivers) {
      spark.catalog.clearCache()
      val f = DiamondLint.lintFrame(q, SparkEntry.queries(q)(spark, sf))
      assert(f.nonEmpty,
        s"STALE waiver '$q' (reason: ${reason.take(60)}…): the query no " +
          "longer flags — delete the waiver")
    }
  }

  test("t_heavy_hitters stays clean (round-13 persist fix)") {
    spark.catalog.clearCache()
    val f = DiamondLint.lintFrame("t_heavy_hitters",
      SparkEntry.queries("t_heavy_hitters")(spark, sf))
    assert(f.isEmpty, s"regressed: ${f.map(_.render).mkString("; ")}")
    spark.catalog.clearCache()
  }
}
