package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HilbertValue

/** Hilbert-curve clustering for two-dimensional data skipping — the
  * better-locality sibling of [[ZOrderLayout]] (see
  * [[graft.functions.HilbertValue]] for the curve and the locality
  * argument). Same write shape: one range shuffle on the curve value
  * (sampled boundaries, so files tile consecutive curve runs), one
  * local sort, stats-tight files out.
  */
object HilbertLayout {
  /** 16 bits per dimension = a 4.3-billion-cell grid; wider domains
    * range-rank or bucket first (same contract as z-order's 31-bit
    * clamp, tighter here because d = 4^bits must also leave room for
    * the oracle's intermediate s*s products in BIGINT).
    */
  val Bits = 16

  def hvalue(a: Column, b: Column): Column =
    HilbertValue.hilbert_value(a, b, Bits)

  /** The identical computation as chained ANSI-SQL CTEs — one per
    * level, UNROLLED from the same constants the expression compiles
    * from, so the oracle and the engine share one definition of the
    * curve. `src` must expose columns `x`, `y` (pre-clamped or not —
    * the first step clamps) plus `carry` columns to thread through.
    * Returns the full `WITH`-clause body (caller appends the final
    * SELECT reading from the returned last CTE name, column `d`).
    */
  def hvalueCtes(src: String, carry: Seq[String]): (String, String) = {
    val mask = (1L << Bits) - 1L
    val cols = carry.mkString(", ")
    val base = s"""h0 AS (
       |  SELECT $cols, x & ${mask} AS x, y & ${mask} AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM $src)""".stripMargin
    val steps = (1 to Bits).map { k =>
      val s = 1L << (Bits - k)
      val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h$k AS (
         |  SELECT $cols,
         |    CASE WHEN $ry = 0
         |         THEN CASE WHEN $rx = 1 THEN $s - 1 - y ELSE y END
         |         ELSE x END AS x,
         |    CASE WHEN $ry = 0
         |         THEN CASE WHEN $rx = 1 THEN $s - 1 - x ELSE x END
         |         ELSE y END AS y,
         |    d + ${s * s} * xor(3 * $rx, $ry) AS d
         |  FROM h${k - 1})""".stripMargin
    }
    ((base +: steps).mkString(",\n"), s"h$Bits")
  }

  /** Write `df` Hilbert-ordered on two integer columns (same
    * layout-maintenance shape as [[ZOrderLayout.writeZOrdered]]).
    */
  def writeHilbertOrdered(df: DataFrame, colA: String, colB: String,
      path: String, partitions: Int): Unit = {
    df.withColumn("__h", hvalue(col(colA), col(colB)))
      .repartitionByRange(partitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
