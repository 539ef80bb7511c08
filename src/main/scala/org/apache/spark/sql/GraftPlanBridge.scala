package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard
  * shim pattern Spark extension libraries use to materialize a DataFrame
  * from a custom LogicalPlan (Dataset.ofRows is package-private; this
  * object lives in org.apache.spark.sql solely to re-export it). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
