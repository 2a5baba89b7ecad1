package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] escape hatch (the standard connector-library
  * pattern): build a DataFrame from a custom LogicalPlan and read a
  * frame's analyzed plan — both needed to offer graft.plans.AsOfJoin
  * behind a normal DataFrame-returning API. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
