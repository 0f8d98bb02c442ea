package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval-OVERLAP join — pair rows whose [start, end] ranges
  * intersect, no equi-key. The variable-length sibling of [[BandJoin]]
  * (which correlates point timestamps within ±δ): sessions × outages,
  * campaign windows × order spans, shift rosters × incidents. Spark
  * plans a bare `ls <= re AND rs <= le` condition as a
  * BroadcastNestedLoopJoin — a cross product at scale — and
  * `BandJoinRewrite` cannot save it: its one-bucket-apart proof is for
  * points, while two overlapping INTERVALS can start arbitrarily many
  * buckets apart.
  *
  * Shape at 100 TB: quantize time into fixed-width buckets and
  * replicate EACH side to every bucket its interval covers, turning
  * overlap into a plain equi-join on the bucket key. A pair of
  * overlapping intervals shares every bucket of the intersection, so
  * matched-once semantics come from the standard canonical-bucket
  * rule: keep the pair only in the bucket containing
  * `max(left.start, right.start)` — that bucket is covered by BOTH
  * intervals exactly when they overlap (max(ls, rs) <= min(le, re)
  * puts it inside each range), and it is unique, so no post-join
  * DISTINCT is ever needed. Costs: replication factor is
  * len/bucketWidth + 1 per row — pick the width at the expected
  * interval scale and the factor is a small constant; a per-row
  * fail-loud guard (`maxReplicas`) turns a surprise month-long
  * interval into an error naming the fix instead of a silent
  * explosion (the BandJoinRewrite magnitude-guard discipline). Bucket
  * population is density × width — a hot bucket is ordinary
  * shuffle-key skew for AQE, never a nested-loop product.
  */
object IntervalJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Floor division of a (possibly negative) bigint column — the
    * BandJoin.floorDiv idiom: subtract the non-negative pmod first,
    * divide integrally.
    */
  private def floorDiv(us: Column, width: Long): Column =
    call_function("div", us - pmod(us, lit(width)), lit(width))

  /** All (left, right) pairs with `[leftStart, leftEnd] ∩ [rightStart,
    * rightEnd] != ∅` (closed intervals, microsecond BIGINT columns),
    * no equi-key. Inner join only: replicating BOTH sides makes
    * unmatched-row passthrough ill-defined (an unmatched left exists
    * once per replica); outer semantics belong to a downstream left
    * join against the distinct left keys, which the registered query
    * demonstrates.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketUs: Long, maxReplicas: Int = 64): DataFrame = {
    require(bucketUs > 0, s"bucketUs=$bucketUs: width must be positive")
    require(maxReplicas >= 2 && maxReplicas <= 4096,
      s"maxReplicas=$maxReplicas: the replication guard must be a small" +
        " bounded constant")
    def replicate(df: DataFrame, s: String, e: String, tag: String) = {
      val b0 = floorDiv(col(s), bucketUs)
      val b1 = floorDiv(col(e), bucketUs)
      // b1 >= b0 is part of the guard: an INVERTED interval (end <
      // start, swapped or corrupt columns) passes a pure width check
      // with a negative difference, and two-arg sequence() would then
      // step -1 and silently replicate the row |b0-b1|+1 times — the
      // exact explosion this guard exists to turn into an error
      val guarded = when(b1 >= b0 && b1 - b0 < lit(maxReplicas.toLong), b1)
        .otherwise(raise_error(concat(lit(
          s"IntervalJoin: [$s, $e] interval is inverted (end < start) " +
            s"or covers > $maxReplicas buckets of $bucketUs us - fix " +
            "the span columns, widen bucketUs, or raise maxReplicas; " +
            "offending start us: "), col(s))))
      df.withColumn(s"__${tag}b", explode(sequence(b0, guarded)))
    }
    val l = replicate(left, leftStart, leftEnd, "l")
    val r = replicate(right, rightStart, rightEnd, "r")
    l.join(r,
        col("__lb") === col("__rb") &&
          col(leftStart) <= col(rightEnd) &&
          col(rightStart) <= col(leftEnd) &&
          col("__lb") === floorDiv(
            greatest(col(leftStart), col(rightStart)), bucketUs))
      .drop("__lb", "__rb")
  }

  /** Deterministic fixture intervals: each event opens a window of
    * 1 + (event_id mod m) minutes from its timestamp — synthesized
    * from the row's own columns (the t_pii_redact planting discipline)
    * so both engines derive identical spans.
    */
  private def spans(ev: DataFrame, typ: String, idAs: String,
      modMinutes: Int): DataFrame =
    ev.filter(col("event_type") === typ)
      .select(col("event_id").as(idAs),
        unix_micros(col("ts")).as(s"${idAs}_s"),
        (unix_micros(col("ts")) +
          (lit(1L) + pmod(col("event_id"), lit(modMinutes.toLong))) *
            lit(60000000L)).as(s"${idAs}_e"))

  val queries: Map[String, Q] = Map(
    // For every purchase WINDOW (1-7 min), how many click WINDOWS
    // (1-5 min) overlap it — across all users. Honest zeros via a left
    // join of the distinct purchase list against the inner pair
    // counts (outer passthrough cannot ride the replicated join).
    "r_join_interval" -> { (s, d) =>
      val ev = Tables.events(s, d)
      // the purchase spans feed two consumers (the replicated overlap
      // join and the honest-zeros left join) — persist per the
      // diamond-reuse rule; the frame is one filtered id+span slice
      val p = spans(ev, "purchase", "purchase_event", 7).persist()
      val c = spans(ev, "click", "click_event", 5)
      val pairs = intervalOverlapJoin(p, c,
        "purchase_event_s", "purchase_event_e",
        "click_event_s", "click_event_e",
        bucketUs = 5L * 60000000L)
      val counts = pairs.groupBy(col("purchase_event"))
        .agg(count(lit(1)).as("n"))
      p.select("purchase_event")
        .join(counts, Seq("purchase_event"), "left")
        .select(col("purchase_event"),
          coalesce(col("n"), lit(0L)).as("n_overlapping_clicks"))
        .orderBy("purchase_event")
    })

  val oracles: Map[String, String] = Map(
    // DuckDB plans the raw overlap inequality directly (IEJoin,
    // fixture-sized); identical closed-interval spans from epoch_us.
    "r_join_interval" ->
      """WITH p AS (
        |  SELECT event_id pe, epoch_us(ts) s,
        |    epoch_us(ts) + (1 + event_id % 7) * 60000000 e
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id ce, epoch_us(ts) s,
        |    epoch_us(ts) + (1 + event_id % 5) * 60000000 e
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.pe FROM p JOIN c ON p.s <= c.e AND c.s <= p.e)
        |SELECT p.pe AS purchase_event,
        |  coalesce(n, 0) AS n_overlapping_clicks
        |FROM p LEFT JOIN (
        |  SELECT pe, CAST(count(*) AS BIGINT) n FROM pairs GROUP BY 1)
        |  USING (pe)
        |ORDER BY purchase_event""".stripMargin)
}
