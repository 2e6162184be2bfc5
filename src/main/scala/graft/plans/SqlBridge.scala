package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package-private bridge: turn a resolved LogicalPlan into a
  * DataFrame, and convert between Column and catalyst Expression.
  * `classic.Dataset.ofRows` / `classic.ExpressionUtils` are private[sql],
  * so extension operators (graft.plans.AsofJoin, graft.expressions) reach
  * them through this shim — the same pattern third-party Spark
  * connectors/operators use. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a catalyst Expression as a user-facing Column (e.g. a native
    * expression applied to literal arguments, where no SQL-text round-trip
    * through `expr(...)` should be needed). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
