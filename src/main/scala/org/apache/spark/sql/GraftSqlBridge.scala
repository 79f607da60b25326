package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to two `private[sql]` seams the public API does not
  * expose: building a DataFrame from a custom LogicalPlan. Lives in the
  * org.apache.spark.sql package solely for access; contains no engine
  * logic (all graft code is under the graft.* packages).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
