package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** PCM16LE audio decode: binary sample buffer → array<short>. Byte
  * reinterpretation only (real — PCM *is* the decoded form); lossy
  * audio codecs are out of scope for this container, and a column of
  * PCM cells plus [[graft.ops.Multimodal.frameSample]] gives the
  * windowing/feature plumbing a pipeline needs. */
object AudioCodec {
  def decodePcm16(bytes: Array[Byte]): UnsafeArrayData = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `decode_pcm16(bin)` → array<short> (little-endian samples;
  * trailing odd byte ignored). */
case class DecodePcm16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    AudioCodec.decodePcm16(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.AudioCodec.decodePcm16($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "decode_pcm16"
}
