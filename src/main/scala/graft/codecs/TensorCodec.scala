package graft.codecs

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Portable binary tensor layout — our NdarrayCodec equivalent
  * (reference semantics: codecs.py:133-212; byte-compat with numpy
  * `.npy` is explicitly a non-goal, see SURVEY §7.2).
  *
  * Layout (little-endian):
  * {{{
  *   magic   4B  'G','R','T','1'
  *   dtype   1B  code (see Dtype)
  *   flags   1B  bit0 = deflate-compressed payload
  *   ndim    1B
  *   dims    ndim × int32
  *   payload raw element bytes, C-order (deflated if flag set)
  * }}}
  *
  * Unsigned numpy dtypes widen to the next signed Spark type exactly
  * like the reference (unischema.py:128-154): uint8→Short,
  * uint16→Int, uint32→Long.
  */
object Dtype {
  final case class Spec(code: Byte, width: Int, sparkType: DataType)
  val ByName: Map[String, Spec] = Map(
    "int8"    -> Spec(1, 1, ByteType),
    "int16"   -> Spec(2, 2, ShortType),
    "int32"   -> Spec(3, 4, IntegerType),
    "int64"   -> Spec(4, 8, LongType),
    "float32" -> Spec(5, 4, FloatType),
    "float64" -> Spec(6, 8, DoubleType),
    "uint8"   -> Spec(7, 1, ShortType),
    "uint16"  -> Spec(8, 2, IntegerType),
    "uint32"  -> Spec(9, 4, LongType),
    "bool"    -> Spec(10, 1, BooleanType))
  val ByCode: Map[Byte, (String, Spec)] =
    ByName.map { case (n, s) => s.code -> (n, s) }
  def apply(name: String): Spec = ByName.getOrElse(name,
    throw new IllegalArgumentException(s"unknown tensor dtype: $name"))
}

object TensorCodec {
  val Magic: Int = ('G' << 24) | ('R' << 16) | ('T' << 8) | '1'

  def encode(dtype: String, dims: Array[Int], data: ArrayData,
      compressed: Boolean): Array[Byte] = {
    val spec = Dtype(dtype)
    val n = data.numElements()
    require(dims.isEmpty || dims.product == n,
      s"shape ${dims.mkString("x")} does not match $n elements")
    val payload = ByteBuffer.allocate(n * spec.width).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    spec.sparkType match {
      case ByteType    => while (i < n) { payload.put(data.getByte(i)); i += 1 }
      case ShortType   => while (i < n) { payload.putShort(data.getShort(i)); i += 1 }
      case IntegerType => while (i < n) { payload.putInt(data.getInt(i)); i += 1 }
      case LongType    => while (i < n) { payload.putLong(data.getLong(i)); i += 1 }
      case FloatType   => while (i < n) { payload.putFloat(data.getFloat(i)); i += 1 }
      case DoubleType  => while (i < n) { payload.putDouble(data.getDouble(i)); i += 1 }
      case BooleanType => while (i < n) { payload.put(if (data.getBoolean(i)) 1.toByte else 0.toByte); i += 1 }
      case t => throw new IllegalStateException(s"unsupported $t")
    }
    val raw = payload.array()
    val body = if (compressed) deflate(raw) else raw
    val out = ByteBuffer.allocate(7 + 4 * dims.length + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(Magic)
    out.put(spec.code)
    out.put(if (compressed) 1.toByte else 0.toByte)
    out.put(dims.length.toByte)
    dims.foreach(out.putInt)
    out.put(body)
    out.array()
  }

  /** @return (dtypeName, dims, elements) */
  def decode(bytes: Array[Byte]): (String, Array[Int], GenericArrayData) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic, "not a GRT1 tensor")
    val code = buf.get()
    val flags = buf.get()
    val ndim = buf.get().toInt
    val dims = Array.fill(ndim)(buf.getInt())
    val (name, spec) = Dtype.ByCode.getOrElse(code,
      throw new IllegalArgumentException(s"unknown dtype code $code"))
    val body0 = new Array[Byte](buf.remaining()); buf.get(body0)
    val body = if ((flags & 1) != 0) inflate(body0) else body0
    val n = body.length / spec.width
    val p = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val values = new Array[Any](n)
    var i = 0
    spec.sparkType match {
      case ByteType    => while (i < n) { values(i) = p.get(); i += 1 }
      case ShortType   => while (i < n) { values(i) = p.getShort(); i += 1 }
      case IntegerType => while (i < n) { values(i) = p.getInt(); i += 1 }
      case LongType    => while (i < n) { values(i) = p.getLong(); i += 1 }
      case FloatType   => while (i < n) { values(i) = p.getFloat(); i += 1 }
      case DoubleType  => while (i < n) { values(i) = p.getDouble(); i += 1 }
      case BooleanType => while (i < n) { values(i) = p.get() != 0; i += 1 }
      case t => throw new IllegalStateException(s"unsupported $t")
    }
    (name, dims, new GenericArrayData(values))
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(b.length * 3 + 64)
    val tmp = new Array[Byte](8192)
    while (!inf.finished()) {
      val k = inf.inflate(tmp)
      if (k == 0 && inf.needsInput()) throw new IllegalStateException("truncated deflate stream")
      out.write(tmp, 0, k)
    }
    inf.end()
    out.toByteArray
  }
}

/** `encode_tensor(dims, data)` → binary. Null-safe: null in either
  * input yields null (parity with explicit-null insertion,
  * unischema.py:409-424). */
case class EncodeTensor(left: Expression, right: Expression,
    dtype: String, compressed: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(dims: Any, data: Any): Any = {
    val d = dims.asInstanceOf[ArrayData].toIntArray()
    TensorCodec.encode(dtype, d, data.asInstanceOf[ArrayData], compressed)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "encode_tensor"
}

/** `decode_tensor(bin)` → struct<dims: array<int>, data: array<T>>.
  * The flat data+dims representation (instead of nested arrays) keeps
  * decode allocation-light and lets fixed-shape consumers reshape
  * lazily — at 100 TB the decode is the hot loop. */
case class DecodeTensor(child: Expression, dtype: String)
    extends UnaryExpression with CodegenFallback {
  private val spec = Dtype(dtype)
  override def dataType: DataType = StructType(Seq(
    StructField("dims", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("data", ArrayType(spec.sparkType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any = {
    val (name, dims, data) = TensorCodec.decode(v.asInstanceOf[Array[Byte]])
    require(name == dtype, s"stored dtype $name != requested $dtype")
    InternalRow(new GenericArrayData(dims.map(i => i: Any)), data)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "decode_tensor"
}
