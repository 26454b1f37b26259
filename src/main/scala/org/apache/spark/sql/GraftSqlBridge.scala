package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into `private[sql]` Column↔Expression conversions for graft's
  * custom Catalyst expressions (Spark 4 removed the public
  * `new Column(expr)` constructor; `classic.ExpressionUtils` is the
  * supported internal path), plus the plan-level hooks a custom operator
  * needs: analyzed-plan access, Dataset-from-LogicalPlan, and runtime
  * strategy registration. Lives in the org.apache.spark.sql package
  * solely for access — no Spark internals are modified. */
object GraftSqlBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan as a DataFrame (the Dataset.ofRows path the
    * DataFrame API itself uses for every operator). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a live session (the runtime
    * form of `SparkSessionExtensions.injectPlannerStrategy`). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
