package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4's Column wraps a ColumnNode
  * and the converter lives behind private[sql]; this shim exposes the
  * two conversions the engine's custom expressions need. Public-API
  * pattern: same role as `Column(expr)` in Spark 3.x.
  */
object bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
