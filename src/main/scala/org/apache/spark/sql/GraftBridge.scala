package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Bridge into `private[sql]` API: Column ⇄ Expression conversion, raw
  * logical-plan → DataFrame construction, and type orderings for the
  * custom Catalyst expressions / plans in `graft.plans`. Placing
  * extension shims in `org.apache.spark.sql` is the established pattern
  * for libraries that add native operators (the classic-module
  * converters are not public in Spark 4). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Interpreted ordering for an atomic type (null-unsafe: callers
    * handle nulls before comparing). */
  def interpretedOrdering(dt: DataType): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dt)

  /** Globally unique id of a session (`private[sql]` in classic) — the
    * collision-proof memo key for session-scoped caches. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
