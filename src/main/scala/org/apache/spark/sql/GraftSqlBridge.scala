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
}
