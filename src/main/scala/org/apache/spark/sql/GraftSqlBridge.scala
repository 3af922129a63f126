package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to `private[sql]` surface needed by the DML rules:
  * turning an analyzed LogicalPlan (the MERGE source) back into a
  * DataFrame. Lives in the org.apache.spark.sql package for visibility —
  * the standard connector pattern.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
