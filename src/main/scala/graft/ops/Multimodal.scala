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

  /** Constellation fingerprints over PCM16 audio (the Shazam idea,
    * Wang 2003, reduced to the energy envelope): frame energies →
    * strict local maxima ("peaks") → hashes of (anchor bucket,
    * target bucket, frame gap) for the next `maxGap` peaks. The
    * gap/bucket pairs are TIME-SHIFT INVARIANT — prepending whole
    * frames of audio moves every peak index but no gap and no
    * bucket, so shifted copies share their fingerprints; that is
    * what makes constellation matching the audio near-dup join.
    *
    * One row per distinct (idCol, fp). Scale: the energy kernel is
    * the codegen'd one-pass [[graft.codecs.Pcm16FrameEnergy]]; peak
    * pairing rides doc-partitioned windows (a doc's frames bound
    * the partition); matching is a hash self-join on fp — posting
    * lists, never all-pairs.
    *
    * `bucketShift` coarsens energies (`energy >> bucketShift`) so
    * small amplitude wobble keeps the bucket; fp packs
    * bucket_a·1000003 + bucket_b·1009 + gap (unique while
    * bucket < 991 and gap < 1009 — enforced). */
  def pcmConstellation(df: org.apache.spark.sql.DataFrame,
      idCol: String, pcmCol: String, frameSamples: Int = 16,
      bucketShift: Int = 28, maxGap: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    require(frameSamples >= 2 && bucketShift >= 0 && bucketShift <= 40)
    require(maxGap >= 1 && maxGap <= 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__fr"))
    val frames = df.select(col(idCol).as("__id"),
        posexplode(graft.functions.GraftFunctions.pcm16FrameEnergy(
          col(pcmCol), frameSamples)).as(Seq("__fr", "__e")))
    val peaks = frames
      .withColumn("__pe", lag(col("__e"), 1).over(w))
      .withColumn("__ne", lead(col("__e"), 1).over(w))
      .filter(col("__pe").isNotNull && col("__ne").isNotNull &&
        col("__e") > col("__pe") && col("__e") > col("__ne"))
      .select(col("__id"), col("__fr"),
        shiftrightunsigned(col("__e"), bucketShift).as("__b"))
      .withColumn("__b", when(col("__b") >= 991,
        raise_error(lit("pcmConstellation: energy bucket >= 991 — " +
          "raise bucketShift"))).otherwise(col("__b")))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__fr"))
    (1 to maxGap).map { k =>
      peaks
        .withColumn("__tb", lead(col("__b"), k).over(wp))
        .withColumn("__tf", lead(col("__fr"), k).over(wp))
        .filter(col("__tb").isNotNull &&
          col("__tf") - col("__fr") < 1009)
        .select(col("__id").as(idCol),
          (col("__b") * 1000003L + col("__tb") * 1009L +
            (col("__tf") - col("__fr"))).as("fp"))
    }.reduce(_.unionByName(_)).distinct()
  }

  /** Posting-capped constellation match join: the self-join stage of
    * audio fingerprint matching, with the standard hot-hash guard.
    * Fingerprints held by more than `maxPosting` distinct ids are
    * dropped BEFORE the join — a silent/constant-tone fp shared by
    * millions of clips is non-discriminative (it matches everything)
    * and, uncapped, makes the posting self-join quadratic in the
    * hottest list at 100 TB. Same doctrine as
    * [[NearDedup.hammingNearDups64]]'s `maxBucket` and the LSH bucket
    * caps. Both `n_shared` and the containment denominator count only
    * the kept (discriminative) fingerprints, so the score stays
    * self-consistent under the cap.
    *
    * Input: one row per distinct (idCol, fp) — [[pcmConstellation]]'s
    * output shape. Output: (id_a, id_b, n_shared, contain_ppm) with
    * n_shared >= minShared and contain_ppm >= minContainPpm, where
    * contain_ppm = 1e6·n_shared div min(|fps_a|, |fps_b|) over kept
    * fps. Scale: posting counts ride a window partitioned by fp —
    * the exact partitioning the equi-join needs next, so the cap adds
    * no extra corpus exchange; the join carries posting lists, never
    * all-pairs. */
  def constellationMatches(fps: org.apache.spark.sql.DataFrame,
      idCol: String, minShared: Long = 3L, minContainPpm: Long = 600000L,
      maxPosting: Long = 256L): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1 && minContainPpm >= 0 && maxPosting >= 1,
      "constellationMatches: minShared>=1, minContainPpm>=0, maxPosting>=1")
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp"))
    val kept = fps.select(col(idCol).as("__id"), col("fp"))
      .withColumn("__pc", count(lit(1)).over(wf))
      .filter(col("__pc") <= maxPosting)
      .drop("__pc")
    val nf = kept.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val mt = kept.select(col("__id").as("id_a"), col("fp"))
      .join(kept.select(col("__id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    mt.join(nf.select(col("__id").as("id_a"), col("__n").as("__na")),
        Seq("id_a"))
      .join(nf.select(col("__id").as("id_b"), col("__n").as("__nb")),
        Seq("id_b"))
      .withColumn("contain_ppm",
        expr("(1000000 * n_shared) div least(__na, __nb)"))
      .filter(col("contain_ppm") >= minContainPpm)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("contain_ppm"))
  }

  /** 64-bit difference hash (dHash, the standard perceptual image
    * fingerprint): over a row-major 8×9 grayscale thumbnail, bit
    * k = (row k/8, col k%8) is 1 iff pixel[r][c] > pixel[r][c+1] —
    * gradient direction, which survives brightness/contrast shifts
    * that break exact pixel hashes. Near-duplicate images land
    * within a few bits of Hamming distance
    * ([[NearDedup.hammingNearDups64]] is the banded join for that).
    *
    * `img` is the 72-element numeric array (a downscaled luminance
    * thumbnail — compose with the resize kernel upstream). Bit 63
    * is folded in as the two's-complement sign term so the value is
    * a plain BIGINT in every engine (engines refuse `1 << 63`).
    * Pure integer builtin composition — engine-replayable. */
  def dhash64(img: Column): Column = {
    def bit(k: Int): Column = {
      val i = (k / 8) * 9 + (k % 8)
      element_at(img, i + 1) > element_at(img, i + 2)
    }
    val low = graft.functions.GraftFunctions.arraySumLong(
      array((0 until 63).map(k =>
        when(bit(k), lit(1L << k)).otherwise(lit(0L))): _*))
    low + when(bit(63), lit(Long.MinValue)).otherwise(lit(0L))
  }
}
