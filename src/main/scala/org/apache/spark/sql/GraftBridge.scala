package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` API: Column ⇄ Expression conversion for
  * the custom Catalyst expressions in `graft.plans`. Placing extension
  * shims in `org.apache.spark.sql` is the established pattern for
  * libraries that add native expressions (the classic-module converters
  * are not public in Spark 4). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
