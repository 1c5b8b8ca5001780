package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions
  * (Spark 4 moved Column onto ColumnNode; classic converters are
  * package-private). Lives in org.apache.spark.sql by the usual
  * extension-library convention — the only code in this repo outside the
  * graft namespace. */
object GraftSqlBridge {
  def toExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def toColumn(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))

  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
