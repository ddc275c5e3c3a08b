package graft.codecs

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Read-side decoder for the NumPy `.npy` serialization — the layout
  * a genuine petastorm-written store carries in its BLOB tensor
  * columns (the reference pickles each ndarray cell with
  * `np.save`: codecs.py NdarrayCodec / the 0.7.6 legacy fixtures
  * under tests/data/legacy read by
  * tests/test_reading_legacy_datasets.py). Our own stores use the
  * GRT1 layout ([[TensorCodec]]; byte-compat declared a non-goal in
  * SURVEY §7.2) — this module is the MIGRATION path: point
  * `spark.read.parquet` at a petastorm store and decode its `.npy`
  * cells natively, no Python in the loop.
  *
  * The format is the small public NumPy spec (numpy/lib/format.py,
  * "NEP 1 — simple file format"): 6-byte magic `\\x93NUMPY`, 1-byte
  * major/minor version, a little-endian header length (2 bytes for
  * v1.0, 4 bytes for v2.0+), an ASCII Python-dict-literal header
  * `{'descr': '<f4', 'fortran_order': False, 'shape': (32, 16, 3), }`
  * padded for alignment, then the raw element buffer.
  *
  * Decoded element types widen exactly like the reference's Unischema
  * (unischema.py numpy→spark mapping) but to ONE type per family so a
  * caller never guesses: every integer/bool descr decodes to
  * `array<long>` ([[NpyLongs]]), every float descr to `array<double>`
  * ([[NpyDoubles]]) — f4→f64 widening is exact — and every string
  * descr (`|Sn` raw bytes, `<Un`/`>Un` UTF-32) to `array<string>`
  * ([[NpyStrings]]) with numpy's trailing-NUL trim. Arrays flatten in
  * C order; Fortran-ordered payloads are transposed on decode, so the
  * flat order is ALWAYS C — the [[NpyShape]] dims reshape it.
  *
  * Scale shape: all five expressions are codegen'd static calls
  * (stay inside whole-stage codegen), one pass over the cell bytes,
  * primitive-array outputs via UnsafeArrayData — no boxing, no UDF.
  * uint64 cells decode with an explicit overflow guard (values must
  * fit a signed long) rather than silently wrapping.
  */
object NpyCodec {
  final case class Header(descr: String, fortran: Boolean,
      shape: Array[Int], dataOffset: Int)

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Parse magic + version + header dict. Versions 1.x (2-byte
    * header length) and 2.x/3.x (4-byte) per the public spec. */
  def parseHeader(b: Array[Byte]): Header = {
    require(b.length >= 10, s"npy cell too short: ${b.length} bytes")
    var i = 0
    while (i < 6) {
      require(b(i) == Magic(i),
        "not an npy payload (bad magic \\x93NUMPY)")
      i += 1
    }
    val major = b(6) & 0xff
    require(major >= 1 && major <= 3, s"unsupported npy version $major")
    val (hlen, hstart) =
      if (major == 1)
        (((b(8) & 0xff) | ((b(9) & 0xff) << 8)), 10)
      else {
        require(b.length >= 12, "truncated npy v2+ header length")
        (((b(8) & 0xff) | ((b(9) & 0xff) << 8) |
          ((b(10) & 0xff) << 16) | ((b(11) & 0xff) << 24)), 12)
      }
    require(hlen >= 0 && hstart + hlen <= b.length,
      s"npy header overruns cell: start=$hstart len=$hlen of ${b.length}")
    val header = new String(b, hstart, hlen, StandardCharsets.US_ASCII)
    val descr = "'descr'\\s*:\\s*'([^']+)'".r
      .findFirstMatchIn(header)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing descr: $header"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r
      .findFirstMatchIn(header)
      .map(_.group(1) == "True")
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing fortran_order: $header"))
    val shapeBody = "'shape'\\s*:\\s*\\(([^)]*)\\)".r
      .findFirstMatchIn(header)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing shape: $header"))
    val shape = shapeBody.split(",").map(_.trim).filter(_.nonEmpty)
      .map { s =>
        val v = s.toLong
        require(v >= 0 && v <= Int.MaxValue, s"npy dim out of range: $v")
        v.toInt
      }
    Header(descr, fortran, shape, hstart + hlen)
  }

  /** (element width in bytes, little-endian?) for a descr; string
    * descrs report their per-element byte width. */
  private def widthOf(descr: String): (Int, Boolean) = {
    require(descr.nonEmpty, "empty npy descr")
    val (order, kindNum) = descr.charAt(0) match {
      case '<' | '=' => (true, descr.substring(1))
      case '>' => (false, descr.substring(1))
      case '|' => (true, descr.substring(1))
      case _ => (true, descr)
    }
    val kind = kindNum.charAt(0)
    val num = kindNum.drop(1)
    val perUnit = kind match {
      case 'U' => 4 // UTF-32 codepoints
      case _ => 1
    }
    val n = if (num.isEmpty) 1 else num.toInt
    kind match {
      case 'b' | 'i' | 'u' | 'f' => (n, order)
      case 'S' | 'a' => (n, order)
      case 'U' => (n * perUnit, order)
      case k => throw new IllegalArgumentException(
        s"unsupported npy descr kind '$k' in $descr")
    }
  }

  private def elementCount(shape: Array[Int]): Int = {
    var n = 1L
    shape.foreach(d => n *= d)
    require(n <= Int.MaxValue, s"npy cell too large: $n elements")
    n.toInt
  }

  /** C-order source byte offset of the i-th C-order element when the
    * payload is Fortran-ordered (identity when C-ordered). */
  private def srcIndex(i: Int, shape: Array[Int], fortran: Boolean): Int =
    if (!fortran || shape.length <= 1) i
    else {
      // C multi-index of i, then Fortran linearization
      var rem = i
      var f = 0
      var fStride = 1
      val k = shape.length
      val idx = new Array[Int](k)
      var a = k - 1
      while (a >= 0) { idx(a) = rem % shape(a); rem /= shape(a); a -= 1 }
      a = 0
      while (a < k) { f += idx(a) * fStride; fStride *= shape(a); a += 1 }
      f
    }

  def shapeData(b: Array[Byte]): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(parseHeader(b).shape)

  def descrString(b: Array[Byte]): UTF8String =
    UTF8String.fromString(parseHeader(b).descr)

  /** Integer/bool payload → long[] in C order (widening is exact;
    * u8 values above Long.MaxValue are refused, never wrapped). */
  def longData(b: Array[Byte]): UnsafeArrayData = {
    val h = parseHeader(b)
    val (w, le) = widthOf(h.descr)
    val kind = h.descr.dropWhile("<>|=".contains(_)).charAt(0)
    require(kind == 'i' || kind == 'u' || kind == 'b',
      s"npy_longs expects an integer/bool descr (got ${h.descr})")
    val n = elementCount(h.shape)
    require(h.dataOffset + n.toLong * w <= b.length,
      s"npy payload truncated: need ${n.toLong * w} bytes")
    val buf = ByteBuffer.wrap(b, h.dataOffset, b.length - h.dataOffset)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Long](n)
    val signed = kind == 'i'
    var i = 0
    while (i < n) {
      val s = h.dataOffset + srcIndex(i, h.shape, h.fortran) * w
      out(i) = (kind, w) match {
        case ('b', 1) => if (b(s) == 0) 0L else 1L
        case ('i', 1) => b(s).toLong
        case ('u', 1) => (b(s) & 0xff).toLong
        case (_, 2) =>
          val v = buf.getShort(s).toLong
          if (signed) v else v & 0xffffL
        case (_, 4) =>
          val v = buf.getInt(s).toLong
          if (signed) v else v & 0xffffffffL
        case (_, 8) =>
          val v = buf.getLong(s)
          require(signed || v >= 0,
            s"u8 value exceeds Long.MaxValue at element $i")
          v
        case _ => throw new IllegalArgumentException(
          s"unsupported integer width $w in ${h.descr}")
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Float payload → double[] in C order (f4→f8 widening exact). */
  def doubleData(b: Array[Byte]): UnsafeArrayData = {
    val h = parseHeader(b)
    val (w, le) = widthOf(h.descr)
    val kind = h.descr.dropWhile("<>|=".contains(_)).charAt(0)
    require(kind == 'f',
      s"npy_doubles expects a float descr (got ${h.descr})")
    val n = elementCount(h.shape)
    require(h.dataOffset + n.toLong * w <= b.length,
      s"npy payload truncated: need ${n.toLong * w} bytes")
    val buf = ByteBuffer.wrap(b, h.dataOffset, b.length - h.dataOffset)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val s = h.dataOffset + srcIndex(i, h.shape, h.fortran) * w
      out(i) = w match {
        case 4 => buf.getFloat(s).toDouble
        case 8 => buf.getDouble(s)
        case _ => throw new IllegalArgumentException(
          s"unsupported float width $w in ${h.descr}")
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** String payload → array<string> in C order. `|Sn` cells are raw
    * bytes (decoded ISO-8859-1, byte-preserving); `<Un`/`>Un` cells
    * are UTF-32 codepoints. Both trim TRAILING NULs only — numpy's
    * own fixed-width semantics (interior NULs survive). */
  def stringData(b: Array[Byte]): GenericArrayData = {
    val h = parseHeader(b)
    val (w, le) = widthOf(h.descr)
    val kind = h.descr.dropWhile("<>|=".contains(_)).charAt(0)
    require(kind == 'S' || kind == 'a' || kind == 'U',
      s"npy_strings expects a string descr (got ${h.descr})")
    val n = elementCount(h.shape)
    require(h.dataOffset + n.toLong * w <= b.length,
      s"npy payload truncated: need ${n.toLong * w} bytes")
    val buf = ByteBuffer.wrap(b, h.dataOffset, b.length - h.dataOffset)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = h.dataOffset + srcIndex(i, h.shape, h.fortran) * w
      val str =
        if (kind == 'U') {
          val cps = w / 4
          var end = cps
          while (end > 0 && buf.getInt(s + (end - 1) * 4) == 0) end -= 1
          val sb = new java.lang.StringBuilder(end)
          var j = 0
          while (j < end) {
            sb.appendCodePoint(buf.getInt(s + j * 4))
            j += 1
          }
          sb.toString
        } else {
          var end = w
          while (end > 0 && b(s + end - 1) == 0) end -= 1
          new String(b, s, end, StandardCharsets.ISO_8859_1)
        }
      out(i) = UTF8String.fromString(str)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Encode side of [[NpyCodec]] — emit cells BYTE-IDENTICAL to
  * numpy's own `np.save` (v1.0 header, C order, 64-byte-aligned
  * space-padded header ending `\n`), so a store our engine writes is
  * readable by the reference's NdarrayCodec (`np.load` on the BLOB)
  * with no shim: the migration path in the other direction.
  * Byte-parity is spec-asserted against `np.save` outputs. */
object NpyEncode {
  private def header(descr: String, shape: Array[Int]): Array[Byte] = {
    val shapeStr = shape.length match {
      case 0 => "()"
      case 1 => s"(${shape(0)},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': False, " +
      s"'shape': $shapeStr, }"
    // v1.0: total (6 magic + 2 version + 2 hlen + header) is padded
    // with spaces to a multiple of 64 and terminated by '\n'
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val hdr = dict + (" " * pad) + "\n"
    require(hdr.length <= 0xffff, "npy v1.0 header too long")
    val out = new Array[Byte](10 + hdr.length)
    out(0) = 0x93.toByte
    out(1) = 'N'; out(2) = 'U'; out(3) = 'M'; out(4) = 'P'; out(5) = 'Y'
    out(6) = 1; out(7) = 0
    out(8) = (hdr.length & 0xff).toByte
    out(9) = ((hdr.length >> 8) & 0xff).toByte
    var i = 0
    while (i < hdr.length) { out(10 + i) = hdr.charAt(i).toByte; i += 1 }
    out
  }

  private def checkedShape(dims: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int, width: Int): Array[Int] = {
    val d = dims.toIntArray()
    var prod = 1L
    d.foreach { x => require(x >= 0, s"negative npy dim $x"); prod *= x }
    require(prod == n,
      s"shape ${d.mkString("x")} does not match $n elements")
    // a cell is one in-memory byte[]: n·width + header must fit an
    // int allocation (overflow would wrap negative and throw
    // opaquely inside ByteBuffer)
    require(n.toLong * width <= Int.MaxValue - 4096L,
      s"npy cell too large: $n elements x $width bytes")
    d
  }

  /** array<long> + dims → `.npy` bytes under an integer/bool descr
    * (`<i1/2/4/8`, `<u1/2/4/8`, `|b1`); values range-checked against
    * the descr, never silently truncated. */
  def fromLongs(data: org.apache.spark.sql.catalyst.util.ArrayData,
      dims: org.apache.spark.sql.catalyst.util.ArrayData,
      descr: String): Array[Byte] = {
    val n = data.numElements()
    val (lo, hi, w) = descr match {
      case "<i1" => (Byte.MinValue.toLong, Byte.MaxValue.toLong, 1)
      case "<i2" => (Short.MinValue.toLong, Short.MaxValue.toLong, 2)
      case "<i4" => (Int.MinValue.toLong, Int.MaxValue.toLong, 4)
      case "<i8" => (Long.MinValue, Long.MaxValue, 8)
      case "<u1" => (0L, 255L, 1)
      case "<u2" => (0L, 65535L, 2)
      case "<u4" => (0L, 4294967295L, 4)
      case "<u8" => (0L, Long.MaxValue, 8) // emit-side ceiling
      case "|b1" => (0L, 1L, 1)
      case x => throw new IllegalArgumentException(
        s"npy_from_longs: unsupported descr '$x'")
    }
    val d = checkedShape(dims, n, w)
    val hdr = header(descr, d)
    val buf = ByteBuffer.allocate(hdr.length + n * w)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(hdr)
    var i = 0
    while (i < n) {
      val v = data.getLong(i)
      require(v >= lo && v <= hi,
        s"value $v out of range for npy descr $descr (element $i)")
      w match {
        case 1 => buf.put(v.toByte)
        case 2 => buf.putShort(v.toShort)
        case 4 => buf.putInt(v.toInt)
        case 8 => buf.putLong(v)
      }
      i += 1
    }
    buf.array()
  }

  /** array<double> + dims → `.npy` bytes under `<f4` or `<f8` (the
    * f4 narrowing is numpy's own double→float cast). */
  def fromDoubles(data: org.apache.spark.sql.catalyst.util.ArrayData,
      dims: org.apache.spark.sql.catalyst.util.ArrayData,
      descr: String): Array[Byte] = {
    val n = data.numElements()
    val w = descr match {
      case "<f4" => 4
      case "<f8" => 8
      case x => throw new IllegalArgumentException(
        s"npy_from_doubles: unsupported descr '$x'")
    }
    val d = checkedShape(dims, n, w)
    val hdr = header(descr, d)
    val buf = ByteBuffer.allocate(hdr.length + n * w)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(hdr)
    var i = 0
    while (i < n) {
      if (w == 4) buf.putFloat(data.getDouble(i).toFloat)
      else buf.putDouble(data.getDouble(i))
      i += 1
    }
    buf.array()
  }
}

/** `npy_from_longs(data, dims, descr)` → binary `.npy` cell. */
case class NpyFromLongs(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    descr: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(data: Any, dims: Any): Any =
    NpyEncode.fromLongs(
      data.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      dims.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      descr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (data, dims) =>
      s"""${ev.value} = graft.codecs.NpyEncode.fromLongs($data, $dims, "$descr");""")
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "npy_from_longs"
}

/** `npy_from_doubles(data, dims, descr)` → binary `.npy` cell. */
case class NpyFromDoubles(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    descr: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(data: Any, dims: Any): Any =
    NpyEncode.fromDoubles(
      data.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      dims.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      descr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (data, dims) =>
      s"""${ev.value} = graft.codecs.NpyEncode.fromDoubles($data, $dims, "$descr");""")
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "npy_from_doubles"
}

/** `npy_shape(bin)` → array<int>: the header's shape tuple. */
case class NpyShape(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    NpyCodec.shapeData(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpyCodec.shapeData($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npy_shape"
}

/** `npy_descr(bin)` → string: the header's dtype descr (e.g. '<f4'). */
case class NpyDescr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NpyCodec.descrString(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpyCodec.descrString($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npy_descr"
}

/** `npy_longs(bin)` → array<long>: integer/bool cells, C order. */
case class NpyLongs(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    NpyCodec.longData(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpyCodec.longData($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npy_longs"
}

/** `npy_doubles(bin)` → array<double>: float cells, C order. */
case class NpyDoubles(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    NpyCodec.doubleData(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpyCodec.doubleData($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npy_doubles"
}

/** `npy_strings(bin)` → array<string>: `|Sn` / `<Un` cells, C order,
  * trailing-NUL trimmed (numpy fixed-width semantics). */
case class NpyStrings(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    NpyCodec.stringData(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpyCodec.stringData($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npy_strings"
}
