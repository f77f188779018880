package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` hook a planner extension living outside
  * `org.apache.spark.sql` needs: wrapping a custom LogicalPlan node
  * (graft.plans.AsofJoin) into a public DataFrame. Everything else the
  * extension uses — SparkSessionExtensions, SparkStrategy, SparkPlan —
  * is public API; only the Dataset constructor is package-private, so
  * this bridge is the entire package-injection surface.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
