package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time windowing (SURVEY §2.6 ST14 — [ABSENT] in the reference,
  * whose only time field is pass-through metadata; engine extension).
  *
  * Batch-checkable twins of the streaming operators: the same
  * `window`/`session_window` expressions run identically under
  * `readStream` + `withWatermark` (StreamingRuntime wires that path);
  * running them in batch lets the DuckDB oracle pin the bucketing and
  * session-merge semantics.
  */
object EventWindows {
  type Q = (SparkSession, String) => DataFrame

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Conversion funnel: per user, stage i's timestamp is the earliest
    * stage-i event STRICTLY AFTER the user's stage-(i-1) timestamp
    * (ordered progression, the standard product-analytics semantics —
    * a purchase before the signup does not count). Emits one row per
    * stage: users reaching it and the total seconds spent converting
    * from the previous stage (epoch-second truncation per timestamp, so
    * the sum is an exact BIGINT).
    *
    * Shape at 100 TB: #stages is a human-picked constant; each step is
    * a map-side `event_type` filter (reaches the parquet scan) followed
    * by one min-aggregation keyed by user — the stages partition the
    * event stream into disjoint slices, so all steps together shuffle
    * about one full copy of the relevant events, and each step's build
    * side shrinks monotonically (users who fell out of the funnel stop
    * flowing). No per-user event list is ever materialized — state per
    * user is one timestamp per stage.
    */
  /** Multi-touch conversion attribution — the credit-assignment step
    * downstream of the funnel: each conversion event looks back
    * `lookbackDays` over the SAME user's touch events and splits credit
    * across the touching channels under two standard models at once:
    *
    *  - LAST-TOUCH: the latest touch (microsecond order, event_id
    *    tie-break — a total order both engines share) takes the whole
    *    conversion;
    *  - LINEAR: each of the k touches takes 10⁶ DIV k micro-credits,
    *    with the remainder assigned to the last touch so every
    *    conversion's credits sum to EXACTLY 10⁶ (spec-pinned
    *    invariant) — integer arithmetic end to end, so the twin
    *    hash-matches.
    *
    * Timestamps compare as `unix_micros` integers (epoch seconds would
    * erase sub-second order inside the last-touch rank). Shape at
    * scale: the touch-conversion join keys on user_id — per-user pair
    * mass, the funnel family's budget; a skew-heavy log would cap
    * touches per (user, day) first, the [[Preference]] cappedEvents
    * discipline. Windows partition by conversion id — bounded by that
    * conversion's own touch count. Output is |channels|-sized.
    */
  def attribution(events: DataFrame, touchTypes: Seq[String],
      convType: String, lookbackDays: Int = 7): DataFrame = {
    require(touchTypes.nonEmpty && lookbackDays >= 1)
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id"), unix_micros(col("ts")).as("cus"),
        col("event_id").as("cid"))
    val touch = events.filter(col("event_type").isInCollection(touchTypes))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id").as("tid"), col("event_type"))
    attributionFromMicros(conv, touch, lookbackDays * 86400000000L)
  }

  /** The credit derivation on micros frames — the seam the streaming
    * twin ([[graft.streaming.AttributionStream]]) shares with the batch
    * operator, so stream ≡ batch cannot drift. `conv`: (user_id, cus,
    * cid); `touch`: (user_id, tus, tid, event_type). The per-channel
    * output aggregate is ADDITIVE across disjoint conversion sets
    * (each conversion's credits are computed within its own rows) —
    * what makes the twin's finalize-then-vacuum compaction exact.
    */
  def attributionFromMicros(conv: DataFrame, touch: DataFrame,
      lookbackUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("tus") <= col("cus") &&
        col("tus") > col("cus") - lookbackUs)
    val byConv = Window.partitionBy("cid")
    val order = Window.partitionBy("cid")
      .orderBy(col("tus").desc, col("tid").desc)
    val credited = joined
      .withColumn("k", count(lit(1)).over(byConv))
      .withColumn("rn", row_number().over(order))
      .withColumn("linear_micro",
        when(col("rn") === 1,
          lit(1000000L) - (col("k") - 1L) * expr("1000000 DIV k"))
          .otherwise(expr("1000000 DIV k")))
      // position-based (U-shaped) model: 40% to the FIRST touch
      // (rn = k in the desc rank), 40% to the LAST (rn = 1), the middle
      // 20% split evenly with the integer remainder assigned to the
      // last touch — so U credits also sum to exactly 10⁶ per
      // conversion. k = 1 takes everything; k = 2 splits 50/50.
      .withColumn("u_micro",
        when(col("k") === 1L, lit(1000000L))
          .when(col("k") === 2L, lit(500000L))
          .when(col("rn") === col("k"), lit(400000L))
          .when(col("rn") === 1L,
            lit(400000L) + lit(200000L) -
              (col("k") - 2L) * expr("200000 DIV (k - 2)"))
          .otherwise(expr("200000 DIV (k - 2)")))
    credited.groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn") === 1, 1L).otherwise(0L))
          .as("last_touch_conversions"),
        sum(col("linear_micro")).as("linear_credit_micro"),
        sum(col("u_micro")).as("u_credit_micro"))
  }

  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    val s0 = events.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t0"))
    val times = stages.zipWithIndex.tail.foldLeft(s0) {
      case (acc, (st, i)) =>
        val nxt = events.filter(col("event_type") === st)
          .join(acc.select(col("user_id"), col(s"t${i - 1}")),
            Seq("user_id"))
          .filter(col("ts") > col(s"t${i - 1}"))
          .groupBy("user_id").agg(min("ts").as(s"t$i"))
        acc.join(nxt, Seq("user_id"), "left")
    }
    val aggs = stages.indices.flatMap { i =>
      Seq(count(col(s"t$i")).as(s"u$i")) ++
        (if (i == 0) Nil
         else Seq(coalesce(sum(col(s"t$i").cast("long") -
           col(s"t${i - 1}").cast("long")), lit(0L)).as(s"l$i")))
    }
    val one = times.agg(aggs.head, aggs.tail: _*)
    val stackArgs = stages.zipWithIndex.map { case (st, i) =>
      val lag = if (i == 0) "CAST(0 AS BIGINT)" else s"l$i"
      s"${i + 1}, '$st', u$i, $lag"
    }.mkString(", ")
    one.selectExpr(s"stack(${stages.size}, $stackArgs) " +
      "AS (stage, event_type, users, lag_s)")
  }

  /** Cohort retention: users bucketed by the epoch-week of their first
    * `cohortType` event; a cohort's week-k cell counts members active
    * (any event) k weeks later. Week = FLOOR-exact epoch bucket
    * ([[graft.TimeBuckets]] — twin-consistent pre-epoch too) —
    * integer arithmetic, no calendar-truncation semantics to disagree
    * on across engines.
    *
    * Shape at 100 TB: one user-keyed min-agg for cohorts, one
    * (user, week) distinct — activity collapses to ≤ #weeks rows per
    * user BEFORE the join — then a cells-sized final aggregate. The
    * matrix itself is #cohorts × #weeks: driver-trivial.
    */
  def cohortRetention(events: DataFrame, cohortType: String): DataFrame = {
    val wk = graft.TimeBuckets.epochWeek()
    retentionFrom(
      events.filter(col("event_type") === cohortType)
        .groupBy("user_id").agg(min(wk).as("cw")),
      events.select(col("user_id"), wk.as("wk")).distinct())
  }

  /** The retention fold shared by the batch operator above and
    * [[graft.streaming.RetentionStream]]'s cumulative view, so the two
    * cannot drift: `cohorts` = (user_id, cw) first-cohort week per
    * user, `active` = DISTINCT (user_id, wk) activity pairs — both are
    * idempotent-mergeable statistics (min; set union), which is what
    * makes the streaming twin exact under any batch split.
    */
  def retentionFrom(cohorts: DataFrame, active: DataFrame): DataFrame =
    active.join(cohorts, "user_id")
      .filter(col("wk") >= col("cw"))
      .groupBy(col("cw").as("cohort_week"),
        (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** Next-event transition counts (first-order Markov structure of the
    * event stream): for each user's ts-ordered events, count
    * (event_type → next event_type) pairs. Ordering ties break by
    * event_id so the lead() is deterministic. One shuffle (user-keyed
    * window), then a #types²-sized aggregate.
    */
  def transitions(events: DataFrame): DataFrame =
    transitionsFromMicros(events.select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      col("event_type")))

  /** The transition fold shared by the batch operator above and
    * [[graft.streaming.TransitionsStream]]'s live view, on the
    * micros-projected frame the stream persists — ordering by
    * (us, event_id) is ordering by (ts, event_id) exactly (micros are
    * the timestamp's full precision), so the two cannot drift.
    */
  def transitionsFromMicros(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .select(col("event_type"),
        lead("event_type", 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Trailing-window distinct active users (the DAU/WAU dashboard
    * metric): for each observed epoch-day, how many distinct users had
    * any event in the `windowDays` days ending on it. Day = FLOOR-exact
    * epoch bucket ([[graft.TimeBuckets]]), same contract as
    * [[cohortRetention]]'s weeks.
    *
    * Shape at 100 TB: activity first collapses to DISTINCT (user, day) —
    * ≤ #days rows per user — then each pair fans out to the constant
    * `windowDays` report days it supports (a bounded explode, not a
    * range join), and one (report_day, user)-keyed distinct-count
    * shuffle finishes. The observed-day filter is a broadcast semi join
    * against a ≤ #days-row frame. Nothing in the plan holds a per-day
    * user SET in memory; the distinct is Spark's partial-then-final
    * HashAggregate. An approximate twin at extreme scale would swap the
    * final distinct for HLL (`approx_count_distinct`) — same first
    * collapse, sketch-sized state — the exact tier here is what the
    * oracle can pin.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int): DataFrame = {
    val day = graft.TimeBuckets.epochDay()
    rollingActiveUsersFromPairs(
      events.select(col("user_id"), day.as("day")).distinct(), windowDays)
  }

  /** The trailing-window fold shared by the batch operator above and
    * [[graft.streaming.ActiveUsersStream]]'s cumulative view: `pairs`
    * is the DISTINCT (user_id, day) activity set — an
    * idempotent-mergeable statistic (set union), which is what makes
    * the streaming twin exact under any batch split.
    */
  def rollingActiveUsersFromPairs(pairs: DataFrame,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val observed = pairs.select(col("day").as("report_day")).distinct()
    pairs
      .select(col("user_id"), explode(
        array((0 until windowDays).map(lit(_)): _*)).as("off"), col("day"))
      .select(col("user_id"), (col("day") + col("off")).as("report_day"))
      .join(broadcast(observed), Seq("report_day"), "left_semi")
      .groupBy("report_day")
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Event-rate anomaly flags: per (event_type, hour-bucket) counts,
    * each tested against its trailing `baseline` OBSERVED hours (rows,
    * not calendar hours — hours with zero events don't exist in the
    * frame, and both engines agree on row-frame semantics). The test is
    * the two-sigma population z-test with the division cleared out:
    *
    *   (b·n − S)² > sigmas² · (b·S2 − S²)     [b = baseline size,
    *                                           S = Σxᵢ, S2 = Σxᵢ²]
    *
    * — pure integer arithmetic, so the FLAG DECISION is exact and
    * engine-portable (no float z-score crossing a threshold differently
    * under a different summation order). Operands ride DECIMAL(38,0):
    * (b·n − S)² at n ≈ 2³¹ events/hour is ~10²², past BIGINT but far
    * inside 38 digits. Rows with an incomplete baseline emit NULL
    * baseline_sum and flagged=false.
    *
    * Shape at 100 TB: the count collapse is one map-side-partial
    * aggregate to #types × #hours rows — driver-trivial forever — and
    * the window runs per type over that tiny frame. The heavy input
    * never reaches a window function.
    */
  def hourlyAnomalies(events: DataFrame, baseline: Int = 24,
      sigmas: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .groupBy(col("event_type"),
        graft.TimeBuckets.epochHour().as("hour_bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour_bucket")
      .rowsBetween(-baseline, -1)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val s = sum(col("n")).over(w)
    val s2 = sum(col("n") * col("n")).over(w)
    val full = count(col("n")).over(w) === baseline
    val lhs = dec(lit(baseline)) * dec(col("n")) - dec(s)
    val rhs = dec(lit(baseline)) * dec(s2) - dec(s) * dec(s)
    counts.select(col("event_type"), col("hour_bucket"), col("n"),
      when(full, s).as("baseline_sum"),
      (full && lhs * lhs > dec(lit(sigmas * sigmas)) * rhs).as("flagged"))
  }

  /** Hourly gap-fill: per-type counts on a COMPLETE hour grid, missing
    * hours as honest zeros — the resample step every downstream
    * time-series consumer (anomaly baselines, rate charts, forecast
    * features) silently assumes; a groupBy alone emits nothing for an
    * empty hour and a zero-traffic outage becomes invisible. Shape at
    * scale: one hash aggregate over the events (the only corpus-sized
    * stage); the grid is |types| × |hours| — generated from a one-row
    * min/max broadcast and a broadcast-joined distinct-type list, so
    * densifying adds NO shuffle of the fact stream, and at any corpus
    * size the grid stays calendar-sized, not data-sized.
    */
  def gapFillHourly(ev0: DataFrame): DataFrame =
    densifyHourly(hourlyCounts(ev0))

  /** The corpus-sized half: one hash aggregate to (type, hour, n). */
  def hourlyCounts(ev0: DataFrame): DataFrame =
    ev0.select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("n0"))

  /** The calendar-sized half: densify a (type, hour, n) table onto the
    * complete grid spanned by ITS OWN min/max hour. Shared verbatim by
    * the batch operator and [[graft.streaming.GapFillStream]]'s view,
    * so the streaming twin cannot drift from the batch grid semantics.
    */
  def densifyHourly(counts: DataFrame): DataFrame =
    densifyHourlyTs(counts)
      .select(col("event_type"), fmt(col("h")).as("hour"), col("n"))

  /** Timestamp-typed densify — the form the downstream time-series
    * operators (EMA, CUSUM) consume, so they derive the hour index
    * from the TIMESTAMP itself. Re-parsing the formatted string is
    * only correct in fixed-offset session zones: in a DST zone the
    * fall-back hour renders two distinct hours to the same string,
    * which would silently break the window frame. The public
    * [[densifyHourly]] formats at the query edge only.
    */
  def densifyHourlyTs(counts: DataFrame): DataFrame = {
    val bounds = counts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n0"), lit(0L)).as("n"))
  }

  /** Seasonal (hour-of-week) anomaly flags — the PERIODIC member of the
    * anomaly family: w_anomaly asks "unusual vs the trailing 24
    * observed hours", w_ema_anomaly "vs the smoothed recent level",
    * CUSUM "sustained shift vs the series mean"; this asks "unusual vs
    * the SAME weekly slot's other observations", so a weekly rhythm
    * (quiet Sundays, 9am spikes) never flags and a deviation from the
    * rhythm does. Runs over the SHARED dense grid ([[densifyHourlyTs]]
    * — zero hours must exist, or a quiet-slot outage is invisible and
    * slot means are biased): slot = epoch-hour mod 168, baseline =
    * LEAVE-ONE-OUT mean of the slot's other observations, and the flag
    * `n > mult·mean + add` is evaluated as the cross-multiplied
    * integer predicate `n·den > mult·(sum − n) + add·den` (den =
    * cnt − 1) — exact and engine-portable, the w_anomaly
    * division-clearing discipline. A slot observed once (den = 0)
    * never flags: an honest can't-know, like w_anomaly's incomplete
    * baseline. Shape at 100 TB: the only corpus-sized stage is the
    * count aggregate it inherits from [[hourlyCounts]]; the slot
    * window runs on the calendar-sized grid and the slot table is
    * ≤ 168·|types| rows.
    */
  def seasonalFromCounts(counts: DataFrame, mult: Long = 2L,
      add: Long = 3L, periodHours: Long = 168L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(mult >= 1 && add >= 0 && periodHours >= 1,
      s"seasonal test needs mult>=1, add>=0, period>=1; " +
        s"got ($mult, $add, $periodHours)")
    val how = pmod(graft.TimeBuckets.epochHour("h"), lit(periodHours))
    val w = Window.partitionBy("event_type", "how")
    val ssum = sum(col("n")).over(w)
    val den = count(lit(1)).over(w) - lit(1L)
    densifyHourlyTs(counts)
      .withColumn("how", how)
      .select(col("event_type"), fmt(col("h")).as("hour"), col("n"),
        col("how"),
        (ssum - col("n")).as("others_sum"),
        den.as("others_cnt"),
        (den > 0 && col("n") * den >
          lit(mult) * (ssum - col("n")) + lit(add) * den).as("flagged"))
  }

  def seasonalAnomalies(ev0: DataFrame): DataFrame =
    seasonalFromCounts(hourlyCounts(ev0))

  /** Truncated exponential moving average over the GAP-FILLED hourly
    * series (composition: smoothing a sparse groupBy output instead
    * would silently skip empty hours and decay against the wrong
    * clock). Adjusted-EMA form over the trailing `K` hours with decay
    * 0.7, kept INTEGER-EXACT: weight of the element `rev` hours back in
    * an m-row window is 7^rev·10^(m−1−rev), folded oldest→newest by the
    * recurrence (N, D, p) ← (7N + p·x, 7D + p, 10p), so
    * ema = N/D is one exact-BIGINT division and the 1e-4-grid result is
    * engine-identical — no pow() ulp drift, the kNN-mean/MMR integer
    * discipline. Shape at scale: runs entirely on the calendar-sized
    * densified frame; the only corpus-sized stage is the count
    * aggregate it inherits from [[hourlyCounts]].
    */
  def emaHourly(ev0: DataFrame, k: Int = 8): DataFrame =
    emaFromCounts(hourlyCounts(ev0), k)

  /** EMA over an already-aggregated (event_type, h, n0) counts frame —
    * shared verbatim with [[graft.streaming.GapFillStream.emaView]].
    */
  def emaFromCounts(counts: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dense = densifyHourlyTs(counts)
      .select(col("event_type"), col("h"), col("n"),
        expr("CAST(unix_timestamp(h) AS BIGINT) DIV 3600").as("idx"))
    val w = Window.partitionBy("event_type").orderBy("idx")
      .rowsBetween(-(k - 1), 0)
    val zero = struct(lit(0L).as("num"), lit(0L).as("den"),
      lit(1L).as("p"))
    dense
      .withColumn("lst", collect_list(col("n")).over(w))
      .withColumn("acc", aggregate(col("lst"), zero, (acc, x) =>
        struct(
          (acc.getField("num") * 7L + acc.getField("p") * x).as("num"),
          (acc.getField("den") * 7L + acc.getField("p")).as("den"),
          (acc.getField("p") * 10L).as("p"))))
      .select(col("event_type"), fmt(col("h")).as("hour"), col("n"),
        round(col("acc.num").cast("double") /
          col("acc.den").cast("double"), 4).as("ema"))
  }

  /** Adaptive spike flags against the SMOOTHED baseline over an
    * already-aggregated counts frame — shared verbatim with
    * [[graft.streaming.GapFillStream.emaAnomalyView]] (the
    * emaFromCounts sharing discipline): hour flagged when its count
    * exceeds 3× the previous hour's EMA + 3 — the adaptive twin of
    * w_anomaly's fixed two-sigma test (the EMA baseline tracks drift,
    * so a ramp doesn't stay flagged forever; the +3 floor keeps
    * near-zero baselines from flagging single events; the first grid
    * hour never flags). Exactness: ema is grid-rounded, 3x+3 is the
    * same IEEE ops in both engines. The lag/compare runs on the
    * calendar-sized smoothed frame.
    */
  def emaAnomalyFromCounts(counts: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("hour")
    emaFromCounts(counts, k)
      .withColumn("ema_prev", lag(col("ema"), 1).over(w))
      .select(col("event_type"), col("hour"), col("n"),
        (col("ema_prev").isNotNull &&
          col("n").cast("double") >
            lit(3.0) * col("ema_prev") + lit(3.0)).as("flagged"))
  }

  /** CUSUM change-point detection over the gap-filled hourly series
    * (Page 1954 — the sequential test that catches a SUSTAINED rate
    * shift long before any single hour trips a spike test, and the
    * complement of w_ema_anomaly's instantaneous flags): per type,
    * S_t = max(0, S_{t−1} + x_t − μ − k) accumulates evidence that the
    * rate sits above μ + k; S_t > h·μ flags. INTEGER-EXACT end to end —
    * counts in micro-units, μ = (10⁶·Σx) DIV m, slack k = μ DIV
    * slackDiv — so the recurrence is the same BIGINT everywhere.
    *
    * COMPUTED IN CLOSED FORM, not as a fold: with yₜ = 10⁶·xₜ − μ − k
    * and prefix Pₜ = Σ_{j≤t} yⱼ, the recurrence telescopes to
    * Sₜ = Pₜ − least(0, min_{j≤t} Pⱼ) — one running-sum window plus one
    * running-min window over the same (type, hour) ordering. Both
    * engines evaluate the identical two window functions (no array
    * fold, no recursive CTE — the round-7 red row traced to
    * WITH RECURSIVE environment sensitivity in the comparator), one
    * sort serves both frames, and the calendar-sized series never
    * materializes as a per-type array. The corpus only feeds the count
    * aggregate.
    */
  def cusumHourly(ev0: DataFrame): DataFrame =
    cusumFromCounts(hourlyCounts(ev0))

  /** CUSUM over an already-aggregated counts frame — shared verbatim
    * with [[graft.streaming.GapFillStream.cusumView]].
    *
    * @param slackDiv   slack k = μ DIV slackDiv (Page's reference
    *                   value; default μ/2)
    * @param hMult      decision interval — flag when S > hMult·μ
    * @param twoSided   also run the downward test Lₜ = max(0,
    *                   Lₜ₋₁ + μ − k − 10⁶·xₜ) (detects a sustained
    *                   rate DROP — e.g. a silent outage that never
    *                   trips a spike test); emits lo_micro /
    *                   flagged_lo columns
    */
  def cusumFromCounts(counts: DataFrame, slackDiv: Long = 2L,
      hMult: Long = 5L, twoSided: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slackDiv >= 1L, "slackDiv must be >= 1")
    require(hMult >= 1L, "hMult must be >= 1")
    val dense = densifyHourlyTs(counts)
    val stats = dense.groupBy("event_type")
      .agg((lit(1000000L) * sum(col("n"))).as("tot"),
        count(lit(1)).as("m"))
      .select(col("event_type"), expr("tot DIV m").as("mu"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = expr(s"mu DIV $slackDiv")
    val base = dense.join(broadcast(stats), "event_type")
      .withColumn("y", col("n") * lit(1000000L) - col("mu") - k)
      .withColumn("p", sum(col("y")).over(w))
      .withColumn("s",
        col("p") - least(lit(0L), min(col("p")).over(w)))
    val hi = Seq(col("s").as("s_micro"),
      (col("s") > lit(hMult) * col("mu")).as("flagged"))
    val lo = if (!twoSided) Nil else Seq(
      col("sl").as("lo_micro"),
      (col("sl") > lit(hMult) * col("mu")).as("flagged_lo"))
    val withLo = if (!twoSided) base else base
      .withColumn("yl", col("mu") - k - col("n") * lit(1000000L))
      .withColumn("pl", sum(col("yl")).over(w))
      .withColumn("sl",
        col("pl") - least(lit(0L), min(col("pl")).over(w)))
    withLo.select(Seq(col("event_type"), fmt(col("h")).as("hour"),
      col("n")) ++ hi ++ lo: _*)
  }

  val queries: Map[String, Q] = Map(
    // hourly resample with zero-filled gaps (grid from the data's own
    // min/max hour — calendar-sized, never data-sized)
    "w_gapfill" -> { (s, d) =>
      gapFillHourly(Tables.events(s, d)).orderBy("event_type", "hour")
    },
    // CUSUM sustained-shift flags over the densified series
    "w_cusum" -> { (s, d) =>
      cusumHourly(Tables.events(s, d)).orderBy("event_type", "hour")
    },
    // two-sided CUSUM with an explicit (k, h) parameterization — the
    // downward test catches a sustained rate DROP (silent outage)
    "w_cusum_twosided" -> { (s, d) =>
      cusumFromCounts(hourlyCounts(Tables.events(s, d)),
        slackDiv = 4L, hMult = 4L, twoSided = true)
        .orderBy("event_type", "hour")
    },
    // EMA-smoothed hourly rates over the densified grid (integer-exact
    // truncated decay — see emaHourly)
    "w_ema" -> { (s, d) =>
      emaHourly(Tables.events(s, d)).orderBy("event_type", "hour")
    },
    // Spike flags against the SMOOTHED baseline: hour flagged when its
    // count exceeds 3× the previous hour's EMA + 3 — the adaptive twin
    // of w_anomaly's fixed two-sigma test (the EMA baseline tracks
    // drift, so a ramp doesn't stay flagged forever; the +3 floor keeps
    // near-zero baselines from flagging single events). The lag/compare
    // runs on the calendar-sized smoothed frame; exactness: ema is
    // grid-rounded, 3x+3 is the same IEEE ops in both engines
    "w_ema_anomaly" -> { (s, d) =>
      emaAnomalyFromCounts(hourlyCounts(Tables.events(s, d)))
        .orderBy("event_type", "hour")
    },
    // tumbling 1-hour windows per event type
    "w_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.pipeline.TextAnalysis.roundHalfUp(sum(col("value")), 2)
            .as("total"))
        .select(fmt(col("w.start")).as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("window_start", "event_type")
    },
    // sliding 1-hour windows every 30 minutes (each event in 2 windows)
    "w_sliding" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(fmt(col("w.start")).as("window_start"), col("n"))
        .orderBy("window_start")
    },
    // signup-cohort weekly retention matrix
    "w_retention" -> { (s, d) =>
      cohortRetention(Tables.events(s, d), "signup")
        .orderBy("cohort_week", "week_offset")
    },
    // first-order event-type transition counts
    "w_transitions" -> { (s, d) =>
      transitions(Tables.events(s, d)).orderBy("event_type", "next_type")
    },
    // ordered conversion funnel signup → view → click → purchase
    "w_funnel" -> { (s, d) =>
      funnel(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase")).orderBy("stage")
    },
    // last-touch + exact-integer linear credit over a 7-day lookback
    "w_attribution" -> { (s, d) =>
      attribution(Tables.events(s, d), Seq("view", "click"), "purchase")
        .orderBy("event_type")
    },
    // trailing-7-day distinct active users per observed day
    "w_active_users" -> { (s, d) =>
      rollingActiveUsers(Tables.events(s, d), 7).orderBy("report_day")
    },
    // two-sigma hourly event-rate anomalies vs trailing 24 observed hours
    "w_anomaly" -> { (s, d) =>
      hourlyAnomalies(Tables.events(s, d))
        .orderBy("event_type", "hour_bucket")
    },
    // hour-of-week seasonal anomalies: each hour vs the SAME weekly
    // slot's other observations (leave-one-out), integer-exact flag
    "w_seasonal_anomaly" -> { (s, d) =>
      seasonalAnomalies(Tables.events(s, d)).orderBy("event_type", "hour")
    },
    // session windows per user: 12-hour inactivity gap
    "w_session" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "12 hours").as("w"))
        .agg(count(lit(1)).as("n"),
          graft.pipeline.TextAnalysis.roundHalfUp(sum(col("value")), 2)
            .as("total"))
        .select(col("user_id"), fmt(col("w.start")).as("session_start"),
          col("n"), col("total"))
        .orderBy("user_id", "session_start")
    })

  /** Shared CTE chain for the w_ema / w_ema_anomaly oracles — through
    * the `agg` (num, den) frame; callers append their final SELECT.
    */
  /** The densified-grid CTE chain (through `dense`) shared by every
    * oracle that consumes the gap-filled hourly series.
    */
  private val DenseCtes =
    """WITH ev AS (
      |  SELECT event_type, date_trunc('hour', ts) h FROM events),
      |counts AS (
      |  SELECT event_type, h, count(*) n FROM ev GROUP BY 1, 2),
      |bounds AS (SELECT min(h) h0, max(h) h1 FROM ev),
      |hours AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM bounds),
      |grid AS (
      |  SELECT t.event_type, hours.h
      |  FROM (SELECT DISTINCT event_type FROM ev) t, hours),
      |dense AS (
      |  SELECT grid.event_type, grid.h, coalesce(counts.n, 0) AS n,
      |    CAST(epoch(grid.h) / 3600 AS BIGINT) AS idx
      |  FROM grid LEFT JOIN counts
      |    ON counts.event_type = grid.event_type AND counts.h = grid.h)"""
      .stripMargin

  private val EmaCtes = DenseCtes +
    """,
      |lo AS (SELECT event_type, min(idx) AS idx0 FROM dense GROUP BY 1),
      |pw AS (SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
      |  (1, 7, 10), (2, 49, 100), (3, 343, 1000), (4, 2401, 10000),
      |  (5, 16807, 100000), (6, 117649, 1000000),
      |  (7, 823543, 10000000)) t(i, p7, p10)),
      |terms AS (
      |  SELECT t.event_type, t.h, s.n AS x, (t.idx - s.idx) AS rev,
      |    least(t.idx - lo.idx0 + 1, 8) AS m
      |  FROM dense t
      |  JOIN lo USING (event_type)
      |  JOIN dense s ON s.event_type = t.event_type
      |    AND s.idx BETWEEN t.idx - 7 AND t.idx),
      |agg AS (
      |  SELECT event_type, h,
      |    sum(x * a.p7 * b.p10) AS num, sum(a.p7 * b.p10) AS den
      |  FROM terms
      |  JOIN pw a ON a.i = rev
      |  JOIN pw b ON b.i = m - 1 - rev
      |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    // microsecond-exact lookback join, last-touch rank by (tus, tid)
    // desc, linear credit with the remainder-to-last-touch rule
    "w_attribution" ->
      """WITH conv AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) cus,
        |    event_id cid
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) tus,
        |    event_id tid, event_type
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT c.cid, t.tid, t.tus, t.event_type
        |  FROM conv c JOIN touch t ON t.user_id = c.user_id
        |  WHERE t.tus <= c.cus AND t.tus > c.cus - 604800000000),
        |cr AS (
        |  SELECT event_type,
        |    row_number() OVER (
        |      PARTITION BY cid ORDER BY tus DESC, tid DESC) rn,
        |    count(*) OVER (PARTITION BY cid) k
        |  FROM j)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) n_touches,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    last_touch_conversions,
        |  CAST(sum(CASE WHEN rn = 1
        |      THEN 1000000 - (k - 1) * (1000000 // k)
        |      ELSE 1000000 // k END) AS BIGINT) linear_credit_micro,
        |  CAST(sum(CASE WHEN k = 1 THEN 1000000
        |      WHEN k = 2 THEN 500000
        |      WHEN rn = k THEN 400000
        |      WHEN rn = 1
        |        THEN 400000 + 200000 - (k - 2) * (200000 // (k - 2))
        |      ELSE 200000 // (k - 2) END) AS BIGINT) u_credit_micro
        |FROM cr GROUP BY 1 ORDER BY event_type""".stripMargin,
    "w_gapfill" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) h FROM events),
        |counts AS (
        |  SELECT event_type, h, count(*) n FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT min(h) h0, max(h) h1 FROM ev),
        |hours AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM bounds),
        |grid AS (
        |  SELECT t.event_type, hours.h
        |  FROM (SELECT DISTINCT event_type FROM ev) t, hours)
        |SELECT grid.event_type,
        |  strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  coalesce(counts.n, 0) AS n
        |FROM grid LEFT JOIN counts
        |  ON counts.event_type = grid.event_type AND counts.h = grid.h
        |ORDER BY 1, 2""".stripMargin,
    // the leave-one-out slot test replayed on the shared dense grid:
    // identical window pair, identical cross-multiplied predicate
    "w_seasonal_anomaly" -> (DenseCtes +
      """,
        |slot AS (
        |  SELECT event_type, h, n,
        |    ((idx % 168) + 168) % 168 AS how,
        |    CAST(sum(n) OVER (PARTITION BY event_type,
        |      ((idx % 168) + 168) % 168) AS BIGINT) AS ssum,
        |    CAST(count(*) OVER (PARTITION BY event_type,
        |      ((idx % 168) + 168) % 168) AS BIGINT) AS scnt
        |  FROM dense)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, n,
        |  CAST(how AS BIGINT) AS how,
        |  CAST(ssum - n AS BIGINT) AS others_sum,
        |  CAST(scnt - 1 AS BIGINT) AS others_cnt,
        |  (scnt - 1 > 0 AND n * (scnt - 1) > 2 * (ssum - n)
        |    + 3 * (scnt - 1)) AS flagged
        |FROM slot ORDER BY 1, 2""".stripMargin),
    // the CUSUM recurrence in CLOSED FORM — Sₜ = Pₜ − least(0, min Pⱼ)
    // over running-sum/running-min windows; the same two window
    // functions the engine runs, no recursion anywhere
    "w_cusum" -> (DenseCtes +
      """,
        |st AS (
        |  SELECT event_type, (1000000 * sum(n)) // count(*) AS mu
        |  FROM dense GROUP BY 1),
        |pre AS (
        |  SELECT d.event_type, d.h, d.n, d.idx, st.mu,
        |    sum(d.n * 1000000 - st.mu - st.mu // 2) OVER (
        |      PARTITION BY d.event_type ORDER BY d.idx) AS p
        |  FROM dense d JOIN st USING (event_type)),
        |cs AS (
        |  SELECT event_type, h, n, mu,
        |    p - least(CAST(0 AS BIGINT), min(p) OVER (
        |      PARTITION BY event_type ORDER BY idx)) AS s
        |  FROM pre)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  n, CAST(s AS BIGINT) AS s_micro, s > 5 * mu AS flagged
        |FROM cs ORDER BY 1, 2""".stripMargin),
    // two-sided variant at (k = μ/4, h = 4μ): the low side is the
    // mirrored closed form over y' = μ − k − 10⁶·n
    "w_cusum_twosided" -> (DenseCtes +
      """,
        |st AS (
        |  SELECT event_type, (1000000 * sum(n)) // count(*) AS mu
        |  FROM dense GROUP BY 1),
        |pre AS (
        |  SELECT d.event_type, d.h, d.n, d.idx, st.mu,
        |    sum(d.n * 1000000 - st.mu - st.mu // 4) OVER (
        |      PARTITION BY d.event_type ORDER BY d.idx) AS p,
        |    sum(st.mu - st.mu // 4 - d.n * 1000000) OVER (
        |      PARTITION BY d.event_type ORDER BY d.idx) AS pl
        |  FROM dense d JOIN st USING (event_type)),
        |cs AS (
        |  SELECT event_type, h, n, mu,
        |    p - least(CAST(0 AS BIGINT), min(p) OVER (
        |      PARTITION BY event_type ORDER BY idx)) AS s,
        |    pl - least(CAST(0 AS BIGINT), min(pl) OVER (
        |      PARTITION BY event_type ORDER BY idx)) AS sl
        |  FROM pre)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  n, CAST(s AS BIGINT) AS s_micro, s > 4 * mu AS flagged,
        |  CAST(sl AS BIGINT) AS lo_micro, sl > 4 * mu AS flagged_lo
        |FROM cs ORDER BY 1, 2""".stripMargin),
    // the closed form of the fold: the element `rev` hours back in an
    // m-row window carries weight 7^rev · 10^(m−1−rev) (exact-BIGINT
    // literals), so the windowed pair join + the power lookup replays
    // the engine's (7N+px, 7D+p, 10p) recurrence term-for-term
    "w_ema" -> (EmaCtes +
      """
        |SELECT d.event_type, strftime(d.h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  d.n, round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS ema
        |FROM dense d JOIN agg
        |  ON agg.event_type = d.event_type AND agg.h = d.h
        |ORDER BY 1, 2""".stripMargin),
    "w_ema_anomaly" -> (EmaCtes +
      """,
        |sm AS (
        |  SELECT d.event_type, strftime(d.h, '%Y-%m-%d %H:%M:%S') AS hour,
        |    d.n, round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS ema
        |  FROM dense d JOIN agg
        |    ON agg.event_type = d.event_type AND agg.h = d.h)
        |SELECT event_type, hour, n,
        |  (ema_prev IS NOT NULL AND
        |   CAST(n AS DOUBLE) > 3.0 * ema_prev + 3.0) AS flagged
        |FROM (
        |  SELECT event_type, hour, n, lag(ema) OVER (
        |    PARTITION BY event_type ORDER BY hour) AS ema_prev
        |  FROM sm)
        |ORDER BY 1, 2""".stripMargin),
    "w_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |         AS window_start,
        |       event_type, count(*) AS n, floor(sum(value) * 100 + 0.5) / 100.0 AS total
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "w_sliding" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       count(*) AS n
        |FROM (
        |  SELECT unnest([
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |      - INTERVAL '30 minutes']) AS ws
        |  FROM events)
        |GROUP BY ws ORDER BY window_start""".stripMargin,
    "w_session" ->
      """WITH ordered AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN epoch(CAST(ts AS TIMESTAMP)
        |           - lag(CAST(ts AS TIMESTAMP)) OVER w) >= 43200
        |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |, sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM ordered)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n, floor(sum(value) * 100 + 0.5) / 100.0 AS total
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "w_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id,
        |    min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |        // 604800) cw
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |      // 604800 wk
        |  FROM events)
        |SELECT cw AS cohort_week, wk - cw AS week_offset,
        |       count(*) AS n_users
        |FROM active JOIN cohorts USING (user_id)
        |WHERE wk >= cw
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "w_active_users" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |      // 86400 AS day
        |  FROM events),
        |expl AS (
        |  SELECT user_id, day + o.off AS report_day
        |  FROM pairs CROSS JOIN
        |    (SELECT unnest([0,1,2,3,4,5,6]) AS off) o)
        |SELECT report_day, count(DISTINCT user_id) AS active_users
        |FROM expl
        |WHERE report_day IN (SELECT day FROM pairs)
        |GROUP BY 1 ORDER BY report_day""".stripMargin,
    "w_anomaly" ->
      """WITH counts AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |      // 3600 AS hour_bucket,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, hour_bucket, n,
        |    CAST(sum(n) OVER w AS BIGINT) AS s,
        |    CAST(sum(n * n) OVER w AS BIGINT) AS s2,
        |    count(n) OVER w AS c
        |  FROM counts
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour_bucket, n,
        |  CASE WHEN c = 24 THEN s END AS baseline_sum,
        |  (c = 24 AND
        |    (24 * CAST(n AS HUGEINT) - s) * (24 * CAST(n AS HUGEINT) - s)
        |      > 4 * (24 * CAST(s2 AS HUGEINT)
        |             - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)))
        |    AS flagged
        |FROM win ORDER BY event_type, hour_bucket""".stripMargin,
    "w_transitions" ->
      """SELECT event_type, next_type, count(*) AS n FROM (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, next_type""".stripMargin,
    "w_funnel" ->
      """WITH t0 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t1 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) t1
        |  FROM events e JOIN t0 ON e.user_id = t0.user_id
        |    AND CAST(e.ts AS TIMESTAMP) > t0.t0
        |  WHERE e.event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) t2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |    AND CAST(e.ts AS TIMESTAMP) > t1.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) t3
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |    AND CAST(e.ts AS TIMESTAMP) > t2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |base AS (
        |  SELECT count(t0.t0) u0, count(t1.t1) u1,
        |         count(t2.t2) u2, count(t3.t3) u3,
        |    coalesce(CAST(sum(CAST(floor(epoch(t1.t1)) AS BIGINT)
        |      - CAST(floor(epoch(t0.t0)) AS BIGINT)) AS BIGINT),
        |      0) l1,
        |    coalesce(CAST(sum(CAST(floor(epoch(t2.t2)) AS BIGINT)
        |      - CAST(floor(epoch(t1.t1)) AS BIGINT)) AS BIGINT),
        |      0) l2,
        |    coalesce(CAST(sum(CAST(floor(epoch(t3.t3)) AS BIGINT)
        |      - CAST(floor(epoch(t2.t2)) AS BIGINT)) AS BIGINT),
        |      0) l3
        |  FROM t0 LEFT JOIN t1 USING (user_id)
        |    LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id))
        |SELECT * FROM (
        |  SELECT 1 stage, 'signup' event_type, u0 users,
        |         CAST(0 AS BIGINT) lag_s FROM base
        |  UNION ALL SELECT 2, 'view', u1, l1 FROM base
        |  UNION ALL SELECT 3, 'click', u2, l2 FROM base
        |  UNION ALL SELECT 4, 'purchase', u3, l3 FROM base)
        |ORDER BY stage""".stripMargin)
}
