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

  /** Materialize a DataFrame from a logical plan (`Dataset.ofRows` is
    * private[sql]).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
  }

  /** Logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Add a planner strategy to a live session (public `experimental`
    * surface, reached through the classic session type).
    */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(s))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ s
  }

  /** Add optimizer rules to a live session's `experimental
    * .extraOptimizations` batch (public experimental surface; idempotent).
    */
  def addOptimizations(spark: org.apache.spark.sql.SparkSession,
      rules: Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val missing = rules.filterNot(
      classic.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations ++ missing
  }

  /** Introspect a `SparkSessionExtensions` (its build* methods are
    * private[sql]) — lets specs assert what an extensions class injects
    * without the getOrCreate-shares-the-session trap.
    */
  def extensionOptimizerRules(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    e.buildOptimizerRules(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  def extensionStrategies(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** The function identifiers a `SparkSessionExtensions` would register
    * on a new session — applied to a scratch registry via the public
    * `registerFunctions` hook (the registry class itself is
    * private[sql]). Lets a spec assert extension-path ≡ register()-path
    * without the getOrCreate-shares-the-session trap.
    */
  def extensionFunctionIds(e: org.apache.spark.sql.SparkSessionExtensions)
      : Seq[org.apache.spark.sql.catalyst.FunctionIdentifier] = {
    val reg =
      new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    e.registerFunctions(reg)
    reg.listFunction()
  }

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
