package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (the Column
  * API is now backend-agnostic); the supported classic-backend conversion
  * lives in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql]. This shim — compiled into the org.apache.spark.sql
  * namespace, the standard extension-library technique — re-exports just
  * the two conversions graft's typed column functions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
