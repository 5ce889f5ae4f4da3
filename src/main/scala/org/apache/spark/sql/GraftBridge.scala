package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made these conversions private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils); extensions that define
  * custom Catalyst expressions need this one-file shim in the sql package —
  * the conventional pattern for third-party expression libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
