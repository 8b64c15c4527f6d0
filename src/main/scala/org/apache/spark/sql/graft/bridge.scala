package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
}
