package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column constructor for the library's
  * custom Catalyst expressions (Spark 4's Column wraps a ColumnNode,
  * not an Expression; `classic.ExpressionUtils` does the conversion but
  * is sql-private). Standard extension-library pattern — the same trick
  * third-party Spark connectors use to expose native expressions as
  * Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
