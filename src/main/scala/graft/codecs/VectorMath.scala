package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels as codegen'd expressions. The HOF spelling
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is interpreted — per
  * element it allocates and walks lambda variables; at embedding
  * dims×corpus scale that is the difference between scan-speed and
  * 100× slower. The arithmetic contract is identical to the HOF
  * form and to the SQL oracle: accumulate in ELEMENT ORDER with a
  * 0.0 seed, every product/sum in double — bit-for-bit reproducible
  * on any engine. */
object VectorMath {

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** `dot(a, b)` over two equal-length float or double arrays → double.
  * Mixed float/double operands are not supported (cast first). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val elemType: DataType = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => FloatType
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => DoubleType
    case (l, r) => throw new IllegalArgumentException(
      s"dot expects two array<float> or two array<double>, got $l / $r")
  }

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    elemType // force validation
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def method: String =
    if (elemType == FloatType) "dotF" else "dotD"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (elemType == FloatType)
      VectorMath.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorMath.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.codecs.VectorMath.$method($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot"
}
