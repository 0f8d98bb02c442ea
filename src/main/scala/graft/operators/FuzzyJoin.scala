package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fuzzy (approximate-string) join — the entity-resolution shape:
  * match records whose keys differ by at most `maxDist` edits without
  * ever comparing all pairs. North-star operator (the reference's only
  * string matching is its 18 exact/substring filter verbs,
  * SURVEY §2.3).
  *
  * Shape at 100 TB: character-trigram blocking — only pairs sharing at
  * least one SUFFICIENTLY RARE trigram are enumerated (posting-list
  * equi-join, the same pattern as the shingle dedup tiers), then the
  * expensive edit-distance confirm runs on candidates only. The df cap
  * is the skew guard: a trigram shared by every record ("Cus", "000"
  * in id-styled names, "www" in URLs) would make its bucket quadratic,
  * and a pair it alone connects is all-boilerplate anyway. Recall
  * drops only for pairs whose EVERY shared trigram is ubiquitous —
  * and those share nothing distinctive. One shuffle for the posting
  * lists, one for the candidate distinct; edit distance never runs on
  * the cross product.
  */
object FuzzyJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct character trigrams; strings shorter than 3 chars block
    * nowhere (Spark's `sequence(1, n)` REVERSES when n < 1 — the guard
    * is load-bearing, not cosmetic).
    */
  def charTrigrams(c: Column): Column =
    when(length(c) >= 3,
      array_distinct(transform(sequence(lit(1), length(c) - 2),
        i => c.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** (lid, rid, dist) for all cross-side pairs with edit distance ≤
    * `maxDist` among candidates sharing a trigram with combined
    * document frequency ≤ `maxDf`.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, maxDf: Int): DataFrame = {
    val lg = left.select(col(leftId).as("lid"), col(leftKey).as("lk"),
      explode(charTrigrams(col(leftKey))).as("g"))
    val rg = right.select(col(rightId).as("rid"), col(rightKey).as("rk"),
      explode(charTrigrams(col(rightKey))).as("g"))
    // df across BOTH sides: a trigram hot on either side floods the join
    val hot = lg.select("g").union(rg.select("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") > maxDf).select("g")
    val cands = lg.join(broadcast(hot), Seq("g"), "left_anti")
      .join(rg.join(broadcast(hot), Seq("g"), "left_anti"), "g")
      .select("lid", "rid", "lk", "rk").distinct()
    cands
      .select(col("lid"), col("rid"),
        levenshtein(col("lk"), col("rk")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  val queries: Map[String, Q] = Map(
    // right side = every third customer's name with its first digit
    // dropped (a deterministic typo); the join must recover each typo's
    // source at distance 1 — plus whatever other names legitimately sit
    // within one edit, identically on both engines. The 50-df cap drops
    // the "Customer#0…" boilerplate trigrams, so blocking runs on the
    // distinctive digit tails.
    "r_fuzzy_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val l = c.select(col("c_custkey"), col("c_name"))
      val r = c.filter(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey"),
          concat(substring(col("c_name"), 1, 9),
            substring(col("c_name"), 11, 100)).as("typo_name"))
      fuzzyJoin(l, r, "c_custkey", "c_name", "c_custkey", "typo_name",
        1, 50)
        .orderBy("lid", "rid")
    })

  val oracles: Map[String, String] = Map(
    "r_fuzzy_join" ->
      """WITH l AS (SELECT c_custkey lid, c_name lk FROM customer),
        |r AS (
        |  SELECT c_custkey rid,
        |    concat(substr(c_name, 1, 9), substr(c_name, 11)) rk
        |  FROM customer WHERE c_custkey % 3 = 0),
        |lg AS (
        |  SELECT lid, lk, g
        |  FROM l, unnest(list_distinct(list_transform(
        |    range(1, len(lk) - 1),
        |    i -> substr(lk, CAST(i AS INT), 3)))) u(g)
        |  WHERE len(lk) >= 3),
        |rg AS (
        |  SELECT rid, rk, g
        |  FROM r, unnest(list_distinct(list_transform(
        |    range(1, len(rk) - 1),
        |    i -> substr(rk, CAST(i AS INT), 3)))) u(g)
        |  WHERE len(rk) >= 3),
        |hot AS (
        |  SELECT g FROM (
        |    SELECT g FROM lg UNION ALL SELECT g FROM rg)
        |  GROUP BY g HAVING count(*) > 50),
        |cand AS (
        |  SELECT DISTINCT lid, rid, lk, rk
        |  FROM (SELECT * FROM lg WHERE g NOT IN (SELECT g FROM hot)) a
        |  JOIN (SELECT * FROM rg WHERE g NOT IN (SELECT g FROM hot)) b
        |    USING (g))
        |SELECT lid, rid, CAST(levenshtein(lk, rk) AS BIGINT) dist
        |FROM cand WHERE levenshtein(lk, rk) <= 1
        |ORDER BY lid, rid""".stripMargin)
}
