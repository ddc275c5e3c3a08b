package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.codecs.{DecodeTensor, EncodeTensor}

/** Column-level facade over graft's custom Catalyst expressions
  * (Spark 4's `Column` hides `.expr` behind the classic bridge).
  */
object GraftFunctions {
  def expr(c: Column): Expression = ColumnBridge.expression(c)
  def column(e: Expression): Column = ColumnBridge.column(e)

  /** Encode an array column (+ dims) into a GRT1 binary tensor cell. */
  def encodeTensor(dims: Column, data: Column, dtype: String,
      compressed: Boolean = false): Column =
    column(EncodeTensor(expr(dims), expr(data), dtype, compressed))

  /** Decode a GRT1 binary cell → struct<dims: array<int>, data: array<T>>. */
  def decodeTensor(bin: Column, dtype: String): Column =
    column(DecodeTensor(expr(bin), dtype))
}
