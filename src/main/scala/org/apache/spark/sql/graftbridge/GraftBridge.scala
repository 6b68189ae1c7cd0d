package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This shim lives under `org.apache.spark.sql` so graft's
  * custom Catalyst expressions can surface as `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
