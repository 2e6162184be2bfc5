package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package-private bridge: turn a resolved LogicalPlan into a
  * DataFrame. `classic.Dataset.ofRows` is private[sql], so extension
  * operators (graft.plans.AsofJoin) reach it through this shim — the
  * same pattern third-party Spark connectors/operators use. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
