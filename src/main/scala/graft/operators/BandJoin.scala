package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Band (pure interval) join — pair rows whose timestamps lie within
  * ±delta of each other with NO equi-key. North-star operator: the
  * reference's only temporal tooling is per-shard arrival order
  * (SURVEY §2.6); correlating events across the whole stream by
  * time-proximity ("what happened near this?") has no twin there, and
  * Spark itself plans a bare `|l.ts − r.ts| <= δ` condition as a
  * BroadcastNestedLoopJoin — a full cross product at scale.
  *
  * Shape at 100 TB: quantize time into δ-wide buckets. A qualifying
  * pair's buckets differ by at most 1, so replicating the RIGHT side
  * into its own bucket and both neighbors turns the inequality into a
  * plain equi-join on the bucket key (one shuffle per side, 3× the
  * right side's rows), with the exact band predicate as the join
  * residual. Each qualifying pair matches EXACTLY once: the left row's
  * bucket is fixed, and precisely one of the right row's three
  * replicas carries it — so no post-join distinct is needed, and
  * `left_outer` semantics survive intact. Bucket population is bounded
  * by event density × δ (pick δ to the question, not the data); a
  * flash-crowd bucket is an ordinary shuffle-key skew, handled by AQE
  * skew-join splitting, never a nested-loop product.
  */
object BandJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Floor division of a (possibly negative) bigint column — subtract
    * the non-negative `pmod` remainder first so pre-epoch timestamps
    * land in the bucket BELOW zero, not truncated toward it. The final
    * division must be INTEGRAL (`div`): Column `/` on longs is double
    * division, exact only below 2^53 — bucketing would silently drift
    * at extreme magnitudes, and BandJoinRewrite's IntegralDivide path
    * would bucket the same value differently.
    */
  private def floorDiv(us: Column, width: Long): Column =
    call_function("div", us - pmod(us, lit(width)), lit(width))

  /** All (left, right) pairs with `|left(leftUs) − right(rightUs)| <=
    * deltaUs`, microsecond columns, no equi-key. `joinType` `inner` or
    * `left_outer` (unmatched lefts survive with null right columns —
    * exactly-once matching makes that safe).
    */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftUs: String, rightUs: String, deltaUs: Long,
      joinType: String = "inner"): DataFrame = {
    require(deltaUs > 0, s"deltaUs=$deltaUs: band width must be positive")
    val l = left.withColumn("__lband", floorDiv(col(leftUs), deltaUs))
    val r = right
      .withColumn("__rband0", floorDiv(col(rightUs), deltaUs))
      .withColumn("__rband", explode(array(
        col("__rband0") - 1, col("__rband0"), col("__rband0") + 1)))
      .drop("__rband0")
    l.join(r,
        col("__lband") === col("__rband") &&
          abs(col(leftUs) - col(rightUs)) <= deltaUs,
        joinType)
      .drop("__lband", "__rband")
  }

  val queries: Map[String, Q] = Map(
    // For every purchase, how many clicks landed within ±60 s — across
    // ALL users (no equi-key: cross-stream temporal correlation, e.g.
    // load spikes around conversions). left_outer keeps zero-click
    // purchases as honest zeros.
    "r_join_band" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val delta = 60L * 1000000L
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_event"),
          unix_micros(col("ts")).as("lus"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_event"),
          unix_micros(col("ts")).as("rus"))
      bandJoin(p, c, "lus", "rus", delta, "left_outer")
        .groupBy(col("purchase_event"))
        .agg(count(col("click_event")).as("n_nearby_clicks"))
        .orderBy("purchase_event")
    },
    // Nearest-neighbor temporal join: THE closest click within ±60 s of
    // each purchase (ties → smaller click id) — the "nearest reading"
    // lookup as-of joins can't express (as-of looks only backward).
    // Composition: band join bounds the candidates, then the
    // bounded-heap TopKPerKey takes k=1 per purchase with NO per-key
    // sort — the reduction streams, never materializing the band pairs.
    "r_join_nearest" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val delta = 60L * 1000000L
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_event"),
          unix_micros(col("ts")).as("lus"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_event"),
          unix_micros(col("ts")).as("rus"))
      val pairs = bandJoin(p, c, "lus", "rus", delta)
        .select(col("purchase_event"), col("click_event"),
          abs(col("lus") - col("rus")).as("adt_us"))
      graft.plans.TopKPerKey.topKPerKey(pairs,
        Seq("purchase_event"),
        Seq(("adt_us", false), ("click_event", false)), 1)
        .orderBy("purchase_event")
    })

  val oracles: Map[String, String] = Map(
    // DuckDB plans the raw inequality join directly (fixture-sized);
    // epoch_us == Spark's unix_micros, both exact bigints.
    "r_join_band" ->
      """WITH p AS (
        |  SELECT event_id pe, epoch_us(ts) us FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id ce, epoch_us(ts) us FROM events
        |  WHERE event_type = 'click')
        |SELECT p.pe AS purchase_event, count(c.ce) AS n_nearby_clicks
        |FROM p LEFT JOIN c ON abs(p.us - c.us) <= 60000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_join_nearest" ->
      """WITH p AS (
        |  SELECT event_id pe, epoch_us(ts) us FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id ce, epoch_us(ts) us FROM events
        |  WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.pe, c.ce, abs(p.us - c.us) adt
        |  FROM p JOIN c ON abs(p.us - c.us) <= 60000000)
        |SELECT pe AS purchase_event, ce AS click_event, adt AS adt_us
        |FROM (
        |  SELECT pe, ce, adt, row_number() OVER (
        |    PARTITION BY pe ORDER BY adt, ce) rk
        |  FROM pairs)
        |WHERE rk = 1 ORDER BY purchase_event""".stripMargin)
}
