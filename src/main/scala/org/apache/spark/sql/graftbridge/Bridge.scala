package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr: Expression)` constructor
  * (Column is now backed by ColumnNode for Connect parity). This bridge
  * lives under `org.apache.spark.sql` so it can reach the `private[sql]`
  * classic converter, giving graft's custom Catalyst expressions a typed
  * `Column` wrapper without reflection.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
