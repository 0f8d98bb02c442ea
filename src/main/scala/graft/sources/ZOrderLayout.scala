package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * Partitioned directories prune on ONE low-cardinality column and
  * bucketing co-locates ONE join key; neither helps a scan that filters
  * on two range dimensions at once (`user_id BETWEEN … AND ts BETWEEN …`).
  * Sorting the layout by the interleaved-bit z-value keeps rows close in
  * BOTH dimensions close in file order, so per-file (and per-row-group)
  * min/max stats become tight rectangles and Parquet's stats-based
  * skipping prunes files for predicates on EITHER column — the standard
  * lakehouse OPTIMIZE ZORDER BY layout, built here from plain Spark
  * primitives: a codegen'd z-value expression + repartitionByRange +
  * sortWithinPartitions.
  *
  * The z-value is pure 64-bit shift/mask arithmetic (no UDF, no RNG):
  * each 31-bit input spreads its bits to even positions via the classic
  * mask cascade, and the two spreads interleave into a 62-bit z. Every
  * constant and intermediate stays a positive signed long, so any
  * engine recomputes the curve bit-identically — the oracle SQL is
  * generated from the SAME step list as the Column expression and
  * cannot drift from it.
  */
object ZOrderLayout {
  /** (shift, mask) cascade that spreads the low 32 bits of a long to
    * even bit positions: after step (s, m), x = (x | x << s) & m.
    */
  private val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Inputs clamp to 31 bits, NOT 32: with a full 32-bit second
    * dimension, spread(b)'s top bit sits at position 62 and the final
    * `<< 1` lands on the SIGN bit — an overflow error in ANSI SQL
    * engines (DuckDB rejects the shift) and, where it wraps, a negative
    * z that range-partitions all high-`b` rows before the rest,
    * breaking curve locality exactly at the boundary. 31 bits per
    * dimension keeps every intermediate and the final z positive in
    * signed 64-bit everywhere.
    */
  private val DimMask = 0x7FFFFFFFL

  private def spread(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(DimMask))) {
      case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** 62-bit Morton interleave of two non-negative 31-bit dimensions
    * (callers clamp/rank wider domains first): bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1.
    */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The interleave as a raw catalyst tree (for the `graft_zvalue` SQL
    * registration) — generated from the same [[SpreadSteps]].
    */
  def zvalueExpr(a: org.apache.spark.sql.catalyst.expressions.Expression,
      b: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    def spreadE(e: Expression): Expression =
      SpreadSteps.foldLeft[Expression](
        BitwiseAnd(Cast(e, LongType), Literal(DimMask))) {
        case (x, (s, m)) =>
          BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(s))), Literal(m))
      }
    BitwiseOr(spreadE(a), ShiftLeft(spreadE(b), Literal(1)))
  }

  /** The identical computation as ANSI SQL over expressions `a` and `b`
    * — generated from [[SpreadSteps]], so the oracle and the engine
    * share one definition of the curve.
    */
  def zvalueSql(a: String, b: String): String = {
    def spreadSql(e: String): String =
      SpreadSteps.foldLeft(s"($e & $DimMask)") { case (x, (s, m)) =>
        s"(($x | ($x << $s)) & $m)"
      }
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
  }

  /** Write `df` z-ordered on two integer columns: range-partition on the
    * z-value (so files tile the curve — a hash repartition would scatter
    * it), sort within each partition, drop the helper column. At 100 TB
    * this is the layout-maintenance job's shape: one range shuffle
    * (sampled boundaries), one local sort, stats-tight files out.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, partitions: Int): Unit = {
    df.withColumn("__z", zvalue(col(colA), col(colB)))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
