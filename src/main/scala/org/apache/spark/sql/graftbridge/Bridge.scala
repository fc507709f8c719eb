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

  /** Register a Catalyst function builder into a LIVE session's registry
    * (`sessionState` is private[sql]; the config-time path is
    * `spark.sql.extensions` = graft.functions.GraftExtensions).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
