package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4's Column-node refactor removed the
  * `new Column(Expression)` constructor; the supported conversion lives
  * in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * package-private to org.apache.spark.sql — hence this one-file shim.
  */
object graftsql {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
