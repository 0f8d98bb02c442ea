package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_rolling_hash(text) ...")` works alongside the
  * Column API.
  *
  * Two routes:
  *   - [[GraftExtensions]]: `SparkSessionExtensions` for new sessions —
  *     `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *     `spark.sql.extensions=graft.functions.GraftExtensions`;
  *   - [[GraftFunctions.register]]: imperative registration on an
  *     existing session (what `SparkEntry.queries` uses).
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)),
    (FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_array_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_array_normalize"),
      new ExpressionInfo(classOf[ArrayNormalize].getName,
        "graft_array_normalize"),
      (exprs: Seq[Expression]) => ArrayNormalize(exprs.head)))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.Bridge.registerFunctions(spark, all)
}

/** Extensions entry point for `withExtensions` / `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (id, info, builder) =>
      e.injectFunction((id, info, builder))
    }
}
