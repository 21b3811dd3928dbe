package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, ExpressionUtils, SparkSession}

/** The ONE deliberate use of Spark's package-private surface in this
  * codebase: Scala has no public "logical plan → DataFrame" constructor
  * (`Dataset.ofRows` is `private[sql]`; the pandas-on-Spark and connect
  * frontends use it internally for exactly this purpose). Everything else
  * in graft sticks to the public API; custom logical plans built by
  * `graft.plans` go through this bridge.
  *
  * Kept to a single one-line entry point in a dedicated package so the
  * dependency on non-public API is auditable and trivially replaceable if
  * a public constructor ever appears.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 moved `Column.expr` behind the
    * classic converter; same auditability argument as `ofRows`). */
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
