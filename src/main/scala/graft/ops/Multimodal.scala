package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Opaque-binary multimodal columns (video/audio) with typed
  * metadata — the Spark-side plumbing is real (schemas, slicing,
  * sampling, byte-level decode); semantic media decoding (real video
  * codecs etc.) is out of scope for this container and is represented
  * by the deterministic byte-layout contract below, exactly like a
  * fixed-layout raw capture format.
  *
  * Layout contract: a "video" cell is a binary blob of back-to-back
  * fixed-size frames (`frameBytes` each, trailing partial frame
  * ignored); "audio" is PCM16LE samples. Everything composes
  * codegen'd built-ins (`substring` on binary, no UDFs) or the
  * graft codec expressions.
  */
object Multimodal {

  /** Number of whole frames in a fixed-frame-size binary blob. */
  def frameCount(video: Column, frameBytes: Int): Column = {
    require(frameBytes > 0)
    floor(length(video) / frameBytes).cast("int")
  }

  /** Every `everyN`-th frame (0-based: frames 0, N, 2N, …) as an
    * array<binary> — the frame-sampling stage of a video pipeline.
    * Pure `substring` composition: stays in whole-stage codegen,
    * reproducible in any engine. */
  def frameSample(video: Column, frameBytes: Int, everyN: Int): Column = {
    require(frameBytes > 0 && everyN > 0)
    val n = frameCount(video, frameBytes)
    val frames = transform(
      sequence(lit(0), ceil(n.cast("double") / everyN).cast("int") - 1),
      i => substring(video, i * everyN * frameBytes + 1, lit(frameBytes)))
    when(n === 0, array().cast("array<binary>")).otherwise(frames)
  }

  /** First sampled frame convenience (thumbnail extraction shape). */
  def firstFrame(video: Column, frameBytes: Int): Column =
    substring(video, 1, frameBytes)
}
