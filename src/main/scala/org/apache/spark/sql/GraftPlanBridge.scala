package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is private[sql]; custom logical operators built
  * outside the DSL (e.g. [[graft.plans.AsOfJoin]]) need this one-line
  * bridge to become DataFrames — the standard pattern used by every
  * Spark extension library that ships its own plan nodes.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
