package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Expression converters, the
  * standard technique for Catalyst-extension libraries on Spark 4. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` Dataset.ofRows for building DataFrames from
  * custom logical plans. */
object DatasetBridge {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
