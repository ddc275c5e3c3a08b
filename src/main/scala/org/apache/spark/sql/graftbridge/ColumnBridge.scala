package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column↔Expression conversion behind
  * `private[sql]` (the Connect refactor). This shim, living inside
  * the sql package namespace, re-exposes exactly the two calls graft
  * needs to attach its custom Catalyst expressions to DataFrames. */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
