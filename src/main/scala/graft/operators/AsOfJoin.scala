package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row with
  * `rightTime <= leftTime` within the same key. Spark has no native as-of
  * join; per the engine's preference order (SURVEY §7: compose built-ins
  * before custom Catalyst), this composes it from a tagged union + one
  * windowed `last(ignoreNulls)` pass:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window per key ordered by (time, tag): carry-forward the last
  *       right payload seen so far
  *     → keep left rows; the carried value IS the as-of match.
  *
  * Cost: ONE shuffle on the key (the window sort), independent of match
  * distance — no range-explosion like an inequality join, no per-row
  * probe. At 100 TB this is the shape you want: both sides hash-partition
  * by key once, sort locally, stream merge. Right rows at exactly leftTime
  * sort BEFORE left rows (tag 0 < 1), so equality matches, like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`. Left rows with no prior right row get
  * nulls (left-join semantics).
  */
object AsOfJoin {
  /** @param left      left rows (all columns preserved)
    * @param right     right rows
    * @param key       equi-key column name present on both sides
    * @param time      event-time column name present on both sides
    * @param rightVals (rightColumn, outputName) pairs to carry over;
    *                  outputName must not collide with a left column
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      rightVals: Seq[(String, String)]): DataFrame = {
    val lCols = left.columns.toSeq
    val lOther = lCols.filterNot(Set(key, time))
    require(rightVals.map(_._2).forall(!lCols.contains(_)),
      "as-of output names must not collide with left columns")
    val taggedLeft = left.select(
      Seq(col(key), col(time), lit(1).as("__tag")) ++
        rightVals.map { case (src, out) =>
          lit(null).cast(right.schema(src).dataType).as(s"__r_$out") } ++
        lOther.map(col): _*)
    val taggedRight = right.select(
      Seq(col(key), col(time), lit(0).as("__tag")) ++
        rightVals.map { case (src, out) => col(src).as(s"__r_$out") } ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .select((lCols.map(col) :+ col("__tag")) ++
        rightVals.map { case (_, out) =>
          last(col(s"__r_$out"), ignoreNulls = true).over(w).as(out) }: _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }
}
