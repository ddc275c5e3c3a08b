package graft.codecs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pixel-level transforms over decoded image structs
  * (struct<dims, data>) — the feature-extraction stage of a
  * multimodal pipeline (reference exposes images only as decoded
  * ndarrays and leaves transforms to TransformSpec user code,
  * transform.py:27-57; here resize is a first-class codegen'd
  * expression so it stays inside whole-stage codegen).
  */
object ImageOps {

  /** Nearest-neighbor resize of (H,W) or (H,W,C) pixel data to
    * (newH, newW[, C]). Source index: floor(y*H/newH), floor(x*W/newW)
    * — pure integer arithmetic, bit-identical on any engine. */
  def resizeNearest(dims: ArrayData, data: ArrayData, newH: Int,
      newW: Int): InternalRow = {
    val d = dims.toIntArray()
    require(d.length == 2 || d.length == 3,
      s"resize expects (H,W) or (H,W,C) dims, got ${d.mkString("x")}")
    val (h, w) = (d(0), d(1))
    val c = if (d.length == 3) d(2) else 1
    require(h > 0 && w > 0 && newH > 0 && newW > 0, "empty image")
    val out = new Array[Short](newH * newW * c)
    var y = 0
    while (y < newH) {
      val sy = y.toLong * h / newH
      var x = 0
      while (x < newW) {
        val sx = x.toLong * w / newW
        val src = ((sy * w + sx) * c).toInt
        val dst = (y * newW + x) * c
        var k = 0
        while (k < c) { out(dst + k) = data.getShort(src + k); k += 1 }
        x += 1
      }
      y += 1
    }
    val outDims = if (d.length == 3) Array(newH, newW, c) else Array(newH, newW)
    InternalRow(UnsafeArrayData.fromPrimitiveArray(outDims),
      UnsafeArrayData.fromPrimitiveArray(out))
  }
}

/** `resize_nearest(img.dims, img.data)` → struct<dims, data> at
  * (newH, newW), channels preserved. */
case class ResizeNearest(left: Expression, right: Expression,
    newH: Int, newW: Int) extends BinaryExpression {
  require(newH > 0 && newW > 0, s"bad target size ${newH}x$newW")
  override def dataType: DataType = StructType(Seq(
    StructField("dims", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("data", ArrayType(ShortType, containsNull = false), nullable = false)))
  override def nullSafeEval(dims: Any, data: Any): Any =
    ImageOps.resizeNearest(dims.asInstanceOf[ArrayData],
      data.asInstanceOf[ArrayData], newH, newW)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dims, data) =>
      s"${ev.value} = graft.codecs.ImageOps.resizeNearest($dims, $data, $newH, $newW);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "resize_nearest"
}
