package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the classic (non-Connect) API.
  *
  * Spark 4 made `ExpressionUtils` `private[sql]`; custom-expression
  * libraries reach it through a shim in the `org.apache.spark.sql`
  * namespace (the documented extension-point escape hatch — the public
  * alternative, session-registered SQL functions, is also provided via
  * `graft.expr.GraftExtensions`).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (`Dataset.ofRows` went
    * private[sql] with the classic/Connect split) — the construction
    * step every whole-operator extension needs.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session planner's full strategy list (built-ins + extension-
    * injected + experimental) — lets extension code probe whether a
    * strategy is ALREADY present before appending to extraStrategies.
    */
  def plannerStrategies(spark: SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    spark.sessionState.planner.strategies

  /** Names of extension-injected operator-optimization rules (the
    * injectOptimizerRule channel; experimental.extraOptimizations is
    * visible to callers directly).
    */
  def optimizerRuleNames(spark: SparkSession): Seq[String] =
    spark.sessionState.optimizer.extendedOperatorOptimizationRules
      .map(_.ruleName)

  /** Register a SQL function on an ALREADY-RUNNING session (the
    * extensions path requires configuring the session builder up front;
    * this covers notebooks/tests attaching to an existing one).
    * `sessionState` is private[sql], hence this lives in the shim.
    */
  def registerFunction(spark: SparkSession, name: String, info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(new FunctionIdentifier(name), info, builder)
}
