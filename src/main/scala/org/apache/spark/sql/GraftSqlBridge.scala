package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4's Column wraps a ColumnNode (Spark
  * Connect refactor) and the classic converters are private[sql]; placing
  * this shim in the sql package is the standard extension-library pattern
  * for exposing custom Catalyst expressions as Columns. */
object GraftSqlBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
