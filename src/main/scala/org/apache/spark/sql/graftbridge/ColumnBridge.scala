package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column⇄Expression converters.
  *
  * Spark 4 wraps Column around ColumnNode and hides the catalyst
  * Expression constructors behind `org.apache.spark.sql.classic
  * .ExpressionUtils` (private[sql]). Custom native expressions (e.g.
  * graft.functions.TextKernels via StaticInvoke) need exactly these
  * two conversions; placing this object under org.apache.spark.sql
  * is the established extension-library pattern for reaching them.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
