package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Column↔Expression converters (the
  * Connect-era API hides `Column.expr`). Lives under org.apache.spark.sql so
  * the `private[sql]` ExpressionUtils is reachable; keeps all custom
  * Catalyst expressions in graft.functions publishable as Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
