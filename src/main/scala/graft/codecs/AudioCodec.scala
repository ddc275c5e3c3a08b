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

/** `pcm16_frame_energy(bin)` → array<long>: per-frame sum of squared
  * PCM16LE samples over fixed `frameSamples`-sample windows — the
  * integer-exact loudness/VAD feature (silence trimming, speech
  * detection, corrupt-audio screening) that stands in for spectral
  * features when no DSP library is in scope. One codegen pass over
  * the bytes; no intermediate sample array materializes. The
  * trailing partial frame (and any odd byte) is dropped — energy of
  * a partial window is not comparable to full windows. Exact for any
  * real signal: a full frame's sum of squares is ≤ 2^30·frameSamples,
  * overflow-free in a long below ~2^33 samples per frame. */
case class Pcm16FrameEnergy(child: Expression, frameSamples: Int)
    extends UnaryExpression {
  require(frameSamples > 0,
    s"frameSamples must be positive (got $frameSamples)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(bytes: Array[Byte]): UnsafeArrayData = {
    val nSamples = bytes.length / 2
    val nFrames = nSamples / frameSamples
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var s = 0L
      var i = f * frameSamples
      val end = i + frameSamples
      while (i < end) {
        val v = (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort
        s += v.toLong * v
        i += 1
      }
      out(f) = s
      f += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcm16FrameEnergy", this,
      classOf[Pcm16FrameEnergy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pcm16_frame_energy"
}

/** `pcm16_frame_zcr(bin)` → array<long>: per-frame ZERO-CROSSING
  * count over the same fixed windows as [[Pcm16FrameEnergy]] — the
  * classic companion feature: energy says HOW LOUD, ZCR says HOW
  * NOISY (voiced speech crosses rarely, fricatives/hiss cross
  * constantly), and the (energy, zcr) pair is the standard
  * two-feature VAD. A crossing is a sign change between CONSECUTIVE
  * samples within the frame (sign: `s < 0` vs `s >= 0` — zero is
  * positive, the convention that makes silence zero-crossing-free);
  * frameSamples−1 comparisons per frame, frame boundaries don't
  * count across. Same one-codegen-pass/no-sample-array shape and
  * the same partial-frame drop as the energy kernel. */
case class Pcm16FrameZcr(child: Expression, frameSamples: Int)
    extends UnaryExpression {
  require(frameSamples > 1,
    s"frameSamples must be > 1 (got $frameSamples)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(bytes: Array[Byte]): UnsafeArrayData = {
    val nSamples = bytes.length / 2
    val nFrames = nSamples / frameSamples
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var c = 0L
      var i = f * frameSamples
      val end = i + frameSamples - 1
      var prevNeg =
        ((((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF))
          .toShort) < 0
      while (i < end) {
        val nxt =
          ((((bytes(2 * i + 3) & 0xFF) << 8) | (bytes(2 * i + 2) & 0xFF))
            .toShort) < 0
        if (nxt != prevNeg) c += 1L
        prevNeg = nxt
        i += 1
      }
      out(f) = c
      f += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcm16FrameZcr", this,
      classOf[Pcm16FrameZcr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pcm16_frame_zcr"
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
