package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column <-> catalyst Expression
  * conversions, so graft can define native Catalyst expressions and expose
  * them as Columns (the classic pre-4.x `new Column(expr)` path), plus the
  * plan-level Dataset.ofRows accessor the one-parse statement router uses
  * to execute a rewritten logical plan.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
