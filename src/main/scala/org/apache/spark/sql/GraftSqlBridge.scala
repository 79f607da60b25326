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

  /** Column over a raw Catalyst Expression (r14): lets the graft codegen
    * expressions be used as Columns WITHOUT the session function
    * registry, so Column-level helpers (Synth.hexCoin, Dedup.wordIdArr,
    * ...) need no registration choreography at every call site. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse seam, for building graft expressions over Columns. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
