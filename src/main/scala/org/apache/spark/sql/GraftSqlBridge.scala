package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access bridge for `private[sql]` helpers the SQL-DML surface
  * needs (`classic.Dataset.ofRows` to run a LogicalPlan, and
  * `classic.ExpressionUtils.column` to wrap a parsed Expression) — the
  * same package-bridge technique every Spark extension library uses
  * (delta-spark, iceberg-spark). Nothing else of the internal surface is
  * exposed. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
