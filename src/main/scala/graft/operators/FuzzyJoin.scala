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
  * Shape at 100 TB: character q-gram blocking — only pairs sharing at
  * least one SUFFICIENTLY RARE q-gram are enumerated (posting-list
  * equi-join, the same pattern as the shingle dedup tiers), then the
  * expensive edit-distance confirm runs on candidates only. The df cap
  * is the skew guard: a gram shared by every record ("Cus", "000" in
  * id-styled names, "www" in URLs) would make its bucket quadratic,
  * and a pair it alone connects is all-boilerplate anyway. Recall
  * drops only for pairs whose EVERY shared gram is ubiquitous — and
  * those share nothing distinctive; when a GROWING corpus pushes
  * distinctive grams over the cap, the fix is a longer q (see
  * [[charGrams]] — the count filter bounds how long q may be for a
  * given edit distance), never a bigger cap. One shuffle for the
  * posting lists, one for the candidate distinct; edit distance never
  * runs on the cross product.
  */
object FuzzyJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct character q-grams; strings shorter than q chars block
    * nowhere (Spark's `sequence(1, n)` REVERSES when n < 1 — the guard
    * is load-bearing, not cosmetic).
    *
    * q is the recall/selectivity dial, and the q-gram COUNT FILTER says
    * how far it can be turned: strings of lengths m₁ ≤ m₂ within edit
    * distance d share at least (m₂ − q + 1) − d·q q-grams, so blocking
    * is provably complete whenever that bound is positive. Longer
    * grams are exponentially more selective — the correct response to
    * corpus growth is raising q (3 → 5 kept the 18-char-name fixture
    * complete for d ≤ 2 while its gram dfs stayed flat at 100× the
    * corpus), NOT raising the df cap, which reopens the quadratic
    * bucket the cap exists to prevent.
    */
  def charGrams(c: Column, q: Int): Column = {
    require(q >= 1, s"q=$q: gram length must be >= 1 (q = 0 grams are " +
      "empty strings shared by every row - blocking degenerates)")
    when(length(c) >= q,
      array_distinct(transform(sequence(lit(1), length(c) - (q - 1)),
        i => c.substr(i, lit(q)))))
      .otherwise(array().cast("array<string>"))
  }


  /** (lid, rid, dist) for all cross-side pairs with edit distance ≤
    * `maxDist` among candidates sharing a q-gram with combined
    * document frequency ≤ `maxDf`.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, maxDf: Int, q: Int = 3): DataFrame = {
    // lg/rg are each referenced twice (df pass, candidate pass) and
    // deliberately NOT persisted: at the target scale the exploded
    // q-gram stream is a multiple of the input and doesn't fit a
    // cache — re-deriving it from the scan is the same two-pass choice
    // jaccardPairs makes for its df cap, and the per-row explode is
    // cheap relative to the shuffles it feeds. (Batch-sized callers
    // that want one pass can persist their inputs around the call.)
    val lg = left.select(col(leftId).as("lid"), col(leftKey).as("lk"),
      explode(charGrams(col(leftKey), q)).as("g"))
    val rg = right.select(col(rightId).as("rid"), col(rightKey).as("rk"),
      explode(charGrams(col(rightKey), q)).as("g"))
    // df across BOTH sides: a gram hot on either side floods the join
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
    // within one edit, identically on both engines. q = 5: the count
    // filter keeps 18-char-name blocking complete for d ≤ 2, the 50-df
    // cap drops only the "Custo…#0000" boilerplate grams, and 5-gram
    // dfs stay flat as the corpus grows (sf1-smoke-proven) where
    // trigrams all went ubiquitous and blocked nothing.
    "r_fuzzy_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val l = c.select(col("c_custkey"), col("c_name"))
      val r = c.filter(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey"),
          concat(substring(col("c_name"), 1, 9),
            substring(col("c_name"), 11, 100)).as("typo_name"))
      fuzzyJoin(l, r, "c_custkey", "c_name", "c_custkey", "typo_name",
        1, 50, q = 5)
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
        |    range(1, len(lk) - 3),
        |    i -> substr(lk, CAST(i AS INT), 5)))) u(g)
        |  WHERE len(lk) >= 5),
        |rg AS (
        |  SELECT rid, rk, g
        |  FROM r, unnest(list_distinct(list_transform(
        |    range(1, len(rk) - 3),
        |    i -> substr(rk, CAST(i AS INT), 5)))) u(g)
        |  WHERE len(rk) >= 5),
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
