package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and Catalyst `Expression` (Spark 4 classic
  * API — Column is node-backed; ExpressionUtils is private[sql], hence this
  * shim lives under org.apache.spark.sql).
  */
object ColumnBridge {
  def wrap(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
