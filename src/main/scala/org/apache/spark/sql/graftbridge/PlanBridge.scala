package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** Bridge into `Dataset.ofRows` (private[sql]) — the standard
  * extension-library way to hand a custom [[LogicalPlan]] node (built
  * against an already-analyzed child, so it arrives fully resolved) back
  * to a session for planning. Pairs with [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a frame (resolution source for
    * building custom nodes over it). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
