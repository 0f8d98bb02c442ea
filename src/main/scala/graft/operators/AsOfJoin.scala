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
    // All carried columns travel as ONE struct per right row. The struct
    // is non-null by construction even when every payload field is null,
    // so `last(ignoreNulls)` skips exactly the interleaved LEFT rows and
    // never a genuine null right payload (which would otherwise carry a
    // stale older value forward) — and multi-column carries are guaranteed
    // to come from the SAME right row.
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map { case (src, out) =>
        org.apache.spark.sql.types.StructField(out,
          right.schema(src).dataType, nullable = true) })
    val taggedLeft = left.select(
      Seq(col(key), col(time), lit(1).as("__tag"),
        lit(null).cast(rvType).as("__rv")) ++
        lOther.map(col): _*)
    // a right row with a NULL time can never be an as-of match (DuckDB
    // ASOF's l.t >= r.t is false for null r.t) — but ascending
    // nulls-first ordering would sort it before every real row and make
    // it the carried match for early left rows; exclude it up front
    val taggedRight = right.filter(col(time).isNotNull).select(
      Seq(col(key), col(time), lit(0).as("__tag"),
        struct(rightVals.map { case (src, out) => col(src).as(out) }: _*)
          .as("__rv")) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__rvc", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(col) ++
        rightVals.map { case (_, out) => col(s"__rvc.$out").as(out) }: _*)
  }
}
