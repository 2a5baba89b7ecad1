package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for third-party Catalyst extensions that need to
  * surface a custom Expression through the public Column API. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed LogicalPlan → DataFrame, preserving the plan's attribute
    * exprIds (a fresh read would re-number them and orphan every
    * reference held by a row-level SQL command's expressions). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch DataFrame as a STREAMING one — what a V1
    * streaming Source's getBatch must return (the micro-batch planner
    * asserts isStreaming). Same internalCreateDataFrame route Spark's
    * own FileStreamSource takes. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
