package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Blocking-recall semantics the oracle hash can't explain: every
  * planted typo recovers its source, substitutions/deletions both
  * land, short strings don't trip the sequence guard, and the df cap
  * actually gates the candidate set.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("substitution and deletion typos match at dist 1; short strings " +
      "block nowhere without crashing") {
    val l = Seq((1L, "alice smith"), (2L, "bob jones"), (3L, "cw"))
      .toDF("id", "name")
    val r = Seq((10L, "alise smith"), (20L, "bob jone"), (30L, "zz"))
      .toDF("id", "name")
    val got = FuzzyJoin.fuzzyJoin(l, r, "id", "name", "id", "name", 1, 100)
      .collect().map(re => (re.getLong(0), re.getLong(1), re.getLong(2)))
      .toSet
    assert(got == Set((1L, 10L, 1L), (2L, 20L, 1L)))
  }

  test("planted typos recover their sources; the ONLY losses are the " +
      "all-boilerplate tails the df cap is defined to give up") {
    val c = Tables.customer(spark, "/root/testdata/sf0.01")
    val l = c.select(col("c_custkey"), col("c_name"))
    val r = c.filter(pmod(col("c_custkey"), lit(3)) === 0)
      .select(col("c_custkey"),
        concat(substring(col("c_name"), 1, 9),
          substring(col("c_name"), 11, 100)).as("typo_name"))
    val planted = r.collect().map(_.getLong(0)).toSet
    val recovered = FuzzyJoin.fuzzyJoin(l, r, "c_custkey", "c_name",
      "c_custkey", "typo_name", 1, 50, q = 5)
      .filter(col("lid") === col("rid"))
      .collect().map(_.getLong(0)).toSet
    // Customer#000000000..12: at q = 5 every gram of these names is
    // either prefix boilerplate ("Custo", "ustom", …) or a zero-heavy
    // digit gram like "00003"/"00012" whose df ≈ 111 (keys 3, 30-39,
    // 300-399 all contain it) — over the 50 cap, so each pair's ENTIRE
    // shared-gram set is capped: the exact recall boundary the operator
    // documents (a pair whose every shared gram is ubiquitous shares
    // nothing distinctive). 495 of 500 planted typos must survive, and
    // the loss set must be EXACTLY that boilerplate zone, nothing else.
    val lost = planted -- recovered
    assert(lost == Set(0L, 3L, 6L, 9L, 12L),
      s"unexpected loss set $lost (recovered ${recovered.size} of " +
        s"${planted.size})")
  }

  test("an aggressive df cap shrinks the candidate set (the gate is " +
      "live, not decorative)") {
    val c = Tables.customer(spark, "/root/testdata/sf0.01")
      .limit(200)
    val l = c.select(col("c_custkey"), col("c_name"))
    val loose = FuzzyJoin.fuzzyJoin(l, l, "c_custkey", "c_name",
      "c_custkey", "c_name", 2, 1000).count()
    val tight = FuzzyJoin.fuzzyJoin(l, l, "c_custkey", "c_name",
      "c_custkey", "c_name", 2, 5).count()
    assert(tight < loose,
      s"maxDf=5 ($tight pairs) must prune vs maxDf=1000 ($loose)")
  }
}
