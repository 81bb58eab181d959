package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-mode bridge: lift a Catalyst [[Expression]] into a user-facing
  * [[Column]] (Spark 4 removed the public `new Column(expr)` constructor
  * when the Column API was decoupled for Connect).
  */
object graftcolumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
