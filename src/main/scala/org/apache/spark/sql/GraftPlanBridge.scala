package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark's `private[sql]` Dataset <-> LogicalPlan converters,
  * the counterpart of [[GraftExprBridge]] for whole-plan extension
  * operators (custom LogicalPlan + Strategy + SparkPlan).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def planOf(df: Dataset[_]): LogicalPlan = df.queryExecution.analyzed
}
