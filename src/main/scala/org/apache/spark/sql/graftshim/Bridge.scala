package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column ↔ catalyst-Expression bridge behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). This
  * shim lives inside the `org.apache.spark.sql` namespace solely to
  * re-export the two conversions the engine's custom Expressions need.
  * No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register catalyst function builders on a live session's registry
    * (`sessionState` is private[sql] in Spark 4).
    */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    fns.foreach { case (id, info, builder) =>
      classic.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
  }
}
