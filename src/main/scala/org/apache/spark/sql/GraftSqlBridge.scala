package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters —
  * the supported extension-point pattern for libraries that register
  * custom Catalyst expressions (Spark 4 wraps Columns in ColumnNodes;
  * `classic.ExpressionUtils` is the conversion shim).
  */
object GraftSqlBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Wrap a (possibly custom) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Register a custom SQL function on an ALREADY-CREATED session.
    * `SparkSessionExtensions` only applies at session construction; a
    * shared session (tests, notebooks) that predates the library load
    * needs direct registry access, which is `private[sql]`.
    */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark
      .asInstanceOf[classic.SparkSession]
      .sessionState
      .functionRegistry
      .registerFunction(name, info, builder)
}
