package org.apache.spark.sql.graftops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql package so graft can lift custom Catalyst
  * Expressions into user-facing Columns (ExpressionUtils is private[sql])
  * and custom LogicalPlans into DataFrames (Dataset.ofRows is
  * private[sql] in the classic module).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}

/** ExpectsInputTypes with two array<long> arguments — declared here
  * because AbstractDataType (the inputTypes element type) is private[sql];
  * graft expressions mix this in to get analysis-time type errors instead
  * of runtime ClassCastExceptions. */
trait LongArrayPairInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
}
