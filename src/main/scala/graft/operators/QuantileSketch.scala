package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable fixed-grid quantile sketch — the scale path next to the
  * exact `r_percentiles` (which collect_lists each group: exact, but
  * group-array-sized memory). The sketch is the quantile member of the
  * engine's portable-sketch family (`t_cms_portable`, `t_hll_portable`):
  *
  *  - STATE: one (key, bin, count) row per occupied bin, where bin =
  *    integer cents DIV a fixed bin width. Bin count is bounded by the
  *    VALUE RANGE over the width — corpus-size-independent.
  *  - MERGE: bin-wise count addition. Two engines, two days, or two
  *    thousand executors produce sketches that combine with a plain
  *    groupBy-sum — the linearity CmsStream demonstrates live for CMS.
  *  - QUERY: quantile q reads the smallest bin whose running count
  *    reaches ceil(q·N) and reports the bin's LOWER BOUND — a
  *    deterministic under-estimate with error < one bin width, the
  *    documented accuracy contract (tighten by shrinking the width;
  *    the t-digest/KLL family trades adaptive bins for a merge step no
  *    SQL twin can replay, so the fixed grid is the portable choice).
  *
  * Everything is integer: cents land on the half-up 1e-2 grid (the
  * round4HalfUp float contract — floor(x·100 + 0.5) on IEEE doubles is
  * engine-identical), targets use the exact ceil division
  * (q·N + 99) DIV 100, so the DuckDB twin hash-matches.
  *
  * Scale shape: one (key, bin) aggregation with map-side partials over
  * the scan; the quantile read runs a window over the OCCUPIED-BIN
  * frame — bounded by range/width per key, never by corpus size.
  */
object QuantileSketch {
  type Q = (SparkSession, String) => DataFrame

  /** Integer-cents projection on the half-up grid. */
  def cents(x: Column): Column =
    floor(x * lit(100.0) + lit(0.5)).cast("long")

  /** The sketch: (key, bin, n) per occupied bin. `binCents` fixes the
    * accuracy contract (error < binCents/100 currency units).
    */
  def sketch(rows: DataFrame, key: Column, value: Column,
      binCents: Long): DataFrame = {
    require(binCents >= 1, s"binCents=$binCents")
    // FLOOR division (the pmod idiom), not DIV: DIV truncates toward
    // zero, so for negative cents bin 0 would span (−binCents, +binCents)
    // — two widths — and bin·binCents would no longer be a lower bound,
    // breaking the "deterministic under-estimate, error < one bin width"
    // contract for any negative-valued use. pmod's remainder is always
    // non-negative, so (c − pmod(c, w)) is the largest multiple of w ≤ c
    // on both signs; the twin floors the same way explicitly.
    rows.select(key.as("k"), cents(value).as("c"))
      .select(col("k"),
        expr(s"(c - pmod(c, $binCents)) DIV $binCents").as("bin"))
      .groupBy("k", "bin")
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile read: for each key and each q in `qPcts` (integer
    * percents), the lower bound in cents of the bin holding the
    * ceil(q·N/100)-th value. Input may be ONE sketch or a bag of
    * sketches to merge — the first aggregation is the merge.
    */
  def quantiles(sk: DataFrame, binCents: Long,
      qPcts: Seq[Int]): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100))
    val merged = sk.groupBy("k", "bin").agg(sum(col("n")).as("n"))
    val w = Window.partitionBy("k").orderBy("bin")
    val cum = merged
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(Window.partitionBy("k")))
    val qCols = qPcts.map { q =>
      min(when(col("cum") >= expr(s"($q * total + 99) DIV 100"),
        col("bin") * binCents)).as(s"q${q}_cents")
    }
    cum.groupBy(col("k"))
      .agg(max(col("total")).as("n_rows"), qCols: _*)
      .select(col("k") +: col("n_rows") +:
        qPcts.map(q => col(s"q${q}_cents")): _*)
  }

  val queries: Map[String, Q] = Map(
    // per-returnflag p50/p90/p99 of l_extendedprice through the $10-bin
    // sketch (the merge is exercised by building the sketch per
    // linestatus slice first — the union of slice sketches must answer
    // identically to one global pass, QuantileSketchSpec pins it)
    "r_quantile_portable" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val sk = sketch(li, col("l_returnflag"), col("l_extendedprice"),
        1000L)
      quantiles(sk, 1000L, Seq(50, 90, 99))
        .withColumnRenamed("k", "l_returnflag")
        .orderBy("l_returnflag")
    })

  val oracles: Map[String, String] = Map(
    "r_quantile_portable" ->
      """WITH cs AS (
        |  SELECT l_returnflag AS k,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM lineitem),
        |-- explicit pmod floor: DuckDB's // truncates toward zero on
        |-- negatives (like Spark's DIV), so both engines floor the same
        |-- way by subtracting the non-negative remainder first
        |sk AS (
        |  SELECT k, (c - ((c % 1000) + 1000) % 1000) // 1000 AS bin,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM cs GROUP BY 1, 2),
        |cum AS (
        |  SELECT k, bin, n,
        |    CAST(sum(n) OVER (PARTITION BY k ORDER BY bin) AS BIGINT)
        |      AS cum,
        |    CAST(sum(n) OVER (PARTITION BY k) AS BIGINT) AS total
        |  FROM sk)
        |SELECT k AS l_returnflag, max(total) AS n_rows,
        |  min(CASE WHEN cum >= (50 * total + 99) // 100
        |      THEN bin * 1000 END) AS q50_cents,
        |  min(CASE WHEN cum >= (90 * total + 99) // 100
        |      THEN bin * 1000 END) AS q90_cents,
        |  min(CASE WHEN cum >= (99 * total + 99) // 100
        |      THEN bin * 1000 END) AS q99_cents
        |FROM cum GROUP BY k
        |ORDER BY l_returnflag""".stripMargin)
}
