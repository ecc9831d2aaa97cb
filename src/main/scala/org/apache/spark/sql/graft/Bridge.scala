package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessor for `Dataset.ofRows` (private[sql]) — the supported way for a
  * Spark extension to turn a hand-built `LogicalPlan` (here: graft's
  * custom AS-OF join node) into a `DataFrame`. Living under
  * `org.apache.spark.sql` is the established pattern for open-source
  * Spark extensions that inject custom plan nodes (Delta, Qbeast, and
  * Iceberg all ship exactly this bridge); nothing else from the internal
  * API is touched.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Wrap a catalyst `Expression` as a user-facing `Column` (the Column
    * constructor is `private[sql]` since the Spark 4 Column refactor).
    * Used by the SQL DELETE front door to re-apply a parsed predicate
    * to the snapshot DataFrame.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
