package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge for constructing a DataFrame over a custom logical
  * plan node: in Spark 4 that constructor is
  * `classic.Dataset.ofRows(classic.SparkSession, LogicalPlan)`, scoped
  * `private[sql]` — so the one-line accessor lives in this package
  * (the standard technique for libraries shipping custom LogicalPlan
  * operators; everything else in graft stays outside Spark's
  * namespace).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
