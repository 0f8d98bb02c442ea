package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** FLOOR-exact epoch bucketing of TIMESTAMP columns — the one shared
  * definition every operator and streaming twin must use (round-10
  * ADVICE class): Spark's `CAST(ts AS LONG)` truncates pre-epoch
  * fractional seconds toward zero and `DIV` truncates the quotient,
  * while the DuckDB twins' `floor(epoch(ts)) // n` floors both steps —
  * so the naive spelling shifts bucket boundaries for pre-epoch
  * timestamps. Computing on microseconds and subtracting the
  * always-non-negative `pmod` first makes the quotient exact and
  * floor-consistent on both engines for ALL timestamps (floor∘floor
  * composes: ⌊⌊x/a⌋/b⌋ = ⌊x/(ab)⌋ for integer a, b > 0).
  */
object TimeBuckets {
  /** Epoch bucket index of width `seconds` for TIMESTAMP column
    * `tsCol`, as exact integer floor division on microseconds.
    */
  def epochBucket(tsCol: String, seconds: Long): Column = {
    val us = seconds * 1000000L
    expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), $us)) DIV $us")
  }

  def epochDay(tsCol: String = "ts"): Column = epochBucket(tsCol, 86400L)
  def epochWeek(tsCol: String = "ts"): Column = epochBucket(tsCol, 604800L)
  def epochHour(tsCol: String = "ts"): Column = epochBucket(tsCol, 3600L)
}
