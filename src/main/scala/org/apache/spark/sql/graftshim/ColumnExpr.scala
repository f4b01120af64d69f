package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column ↔ Catalyst Expression conversion
  * (Spark 4 removed the public `Column.expr`). Lives under
  * org.apache.spark.sql to satisfy `private[sql]` access. */
object ColumnExpr {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
