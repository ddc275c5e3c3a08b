package graft.codecs

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** CompressedImageCodec equivalent (reference: codecs.py:58-130) on
  * `javax.imageio` — no native deps.
  *
  * Contract (parity with the reference's numpy arrays):
  *  - grayscale: dims (H, W), one uint8 (stored as Short) per pixel;
  *  - color: dims (H, W, 3), C-order RGB — the reference stores RGB
  *    and swaps to OpenCV's BGR only at the cv2 call boundary
  *    (codecs.py:87-116); with ImageIO we work in RGB directly, so
  *    there is no swap anywhere.
  *  - png is lossless (round-trip exact, like the reference's
  *    png test); jpeg is lossy with a quality knob (codecs.py:77-84).
  */
object ImageCodec {

  // ImageIO's stream cache is DISK-backed by default: every
  // encode/decode would create+delete a temp file. Per-row codec
  // calls must stay in memory.
  ImageIO.setUseCache(false)

  def encodeImage(dims: ArrayData, data: ArrayData, format: String,
      quality: Int): Array[Byte] = {
    val d = dims.toIntArray()
    require(d.length == 2 || (d.length == 3 && d(2) == 3),
      s"image dims must be (H,W) or (H,W,3), got ${d.mkString("x")}")
    val (h, w) = (d(0), d(1))
    val color = d.length == 3
    val n = data.numElements()
    require(n == h * w * (if (color) 3 else 1),
      s"pixel count $n != dims ${d.mkString("x")}")
    val img = new BufferedImage(w, h,
      if (color) BufferedImage.TYPE_INT_RGB else BufferedImage.TYPE_BYTE_GRAY)
    // Grayscale goes through the raster (setSample), NOT setRGB:
    // setRGB on a gray image runs an sRGB→linear-gray color-space
    // conversion that corrupts 73/256 values (e.g. 1..5 → 0) and
    // breaks the lossless-png contract.
    val raster = img.getRaster
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (color) {
          val r = data.getShort(i) & 0xFF
          val g = data.getShort(i + 1) & 0xFF
          val b = data.getShort(i + 2) & 0xFF
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          i += 3
        } else {
          raster.setSample(x, y, 0, data.getShort(i) & 0xFF)
          i += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    format match {
      case "png" =>
        ImageIO.write(img, "png", out)
      case "jpeg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality / 100.0f)
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        // jpeg writer rejects alpha-less gray? gray is fine; RGB ok
        writer.write(null, new IIOImage(img, null, null), p)
        writer.dispose(); ios.close()
      case f => throw new IllegalArgumentException(s"unknown image format $f")
    }
    out.toByteArray
  }

  /** Decode png/jpeg bytes → struct<dims: array<int>, data: array<short>>.
    * `expectColor` forces 3-channel output (jpeg gray reads back as
    * gray; color stays RGB). */
  def decodeImage(bytes: Array[Byte]): InternalRow = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val (h, w) = (img.getHeight, img.getWidth)
    val gray = img.getColorModel.getNumComponents == 1
    if (gray) {
      // raster samples, not getRGB — see the encode-side comment on
      // the sRGB↔gray conversion loss.
      val raster = img.getRaster
      val a = new Array[Short](h * w)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          a(i) = raster.getSample(x, y, 0).toShort
          i += 1; x += 1
        }
        y += 1
      }
      InternalRow(UnsafeArrayData.fromPrimitiveArray(Array(h, w)),
        UnsafeArrayData.fromPrimitiveArray(a))
    } else {
      val a = new Array[Short](h * w * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          a(i) = ((rgb >> 16) & 0xFF).toShort
          a(i + 1) = ((rgb >> 8) & 0xFF).toShort
          a(i + 2) = (rgb & 0xFF).toShort
          i += 3; x += 1
        }
        y += 1
      }
      InternalRow(UnsafeArrayData.fromPrimitiveArray(Array(h, w, 3)),
        UnsafeArrayData.fromPrimitiveArray(a))
    }
  }
}

/** `encode_image(dims, pixels)` → png/jpeg bytes. */
case class EncodeImage(left: Expression, right: Expression,
    format: String, quality: Int = 80) extends BinaryExpression {
  require(format == "png" || format == "jpeg", s"format $format")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(dims: Any, data: Any): Any =
    ImageCodec.encodeImage(dims.asInstanceOf[ArrayData],
      data.asInstanceOf[ArrayData], format, quality)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dims, data) =>
      s"""${ev.value} = graft.codecs.ImageCodec.encodeImage($dims, $data, "$format", $quality);""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "encode_image"
}

/** `decode_image(bin)` → struct<dims: array<int>, data: array<short>>. */
case class DecodeImage(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dims", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("data", ArrayType(ShortType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ImageCodec.decodeImage(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.ImageCodec.decodeImage($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "decode_image"
}
