package graft.codecs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.schema.{CodecSpec, FieldSpec, GraftSchema}
import graft.sources.{GraftRead, Materialize}

/** Image codec parity suite (reference:
  * petastorm/tests/test_codec_compressed_image.py + codecs.py:58-130):
  * png is LOSSLESS — round-trip must be exact for every value,
  * grayscale and RGB; jpeg is lossy but shape/dims-preserving. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(dims: Seq[Int], pixels: Seq[Int], format: String)
      : (Seq[Int], Seq[Int]) = {
    val df = Seq((dims, pixels.map(_.toShort))).toDF("dims", "data")
    val enc = GraftFunctions.encodeImage($"dims", $"data", format)
    val out = df.select(GraftFunctions.decodeImage(enc).as("img"))
      .select($"img.dims", $"img.data")
      .as[(Seq[Int], Seq[Short])].head()
    (out._1, out._2.map(_.toInt))
  }

  test("png grayscale round-trip is exact for ALL 256 values") {
    // 16x16 image containing every uint8 value once — the ADVICE r2
    // defect: setRGB's sRGB conversion corrupted 73/256 of these.
    val px = (0 until 256).toSeq
    val (dims, data) = roundTrip(Seq(16, 16), px, "png")
    assert(dims == Seq(16, 16))
    assert(data == px)
  }

  test("png RGB round-trip is exact") {
    val px = (0 until 4 * 5 * 3).map(i => (i * 37 + 11) % 256)
    val (dims, data) = roundTrip(Seq(4, 5, 3), px, "png")
    assert(dims == Seq(4, 5, 3))
    assert(data == px)
  }

  test("jpeg preserves dims; values within lossy tolerance on flat image") {
    val px = Seq.fill(8 * 8 * 3)(128)
    val (dims, data) = roundTrip(Seq(8, 8, 3), px, "jpeg")
    assert(dims == Seq(8, 8, 3))
    assert(data.forall(v => math.abs(v - 128) <= 8))
  }

  test("encode rejects bad dims and mismatched pixel counts") {
    intercept[Exception](roundTrip(Seq(2, 2, 2), Seq.fill(8)(0), "png"))
    intercept[Exception](roundTrip(Seq(2, 2), Seq.fill(5)(0), "png"))
  }

  test("materialize->read lifecycle with a png field decodes exactly") {
    val url = scratch("image-store")
    val src = spark.range(20).toDF("id")
      .withColumn("img", transform(sequence(lit(0), lit(8 * 8 - 1)),
        i => pmod($"id" * 31 + i, lit(256)).cast("short")))
    val schema = GraftSchema("imgs", Seq(
      FieldSpec("id", LongType),
      FieldSpec("img", ShortType, shape = Seq(8, 8),
        codec = Some(CodecSpec("png")))))
    Materialize.materialize(src, url, schema, partitions = Some(2))

    // storage side really is binary png bytes
    val raw = spark.read.parquet(url)
    assert(raw.schema("img").dataType == BinaryType)
    val magic = raw.select($"img").as[Array[Byte]].head().take(4)
    assert(magic.sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte)))

    val back = GraftRead.reader(spark, url).load()
      .select($"id", $"img.dims", $"img.data")
      .as[(Long, Seq[Int], Seq[Short])].collect().sortBy(_._1)
    assert(back.length == 20)
    back.foreach { case (id, dims, data) =>
      assert(dims == Seq(8, 8))
      assert(data.map(_.toInt) == (0 until 64).map(i => ((id * 31 + i) % 256).toInt))
    }
  }

  test("jpeg quality codec arg is honored (higher q = bigger file)") {
    def encodedSize(q: Int): Int = {
      val px = (0 until 16 * 16 * 3).map(i => (i * 97 + 3) % 256)
      val df = Seq((Seq(16, 16, 3), px.map(_.toShort))).toDF("dims", "data")
      df.select(length(GraftFunctions.encodeImage($"dims", $"data", "jpeg",
        quality = q))).as[Int].head()
    }
    assert(encodedSize(95) > encodedSize(10))
  }

  test("jpeg grayscale keeps one channel and stays within lossy tolerance") {
    val px = Seq.fill(8 * 8)(100)
    val (dims, data) = roundTrip(Seq(8, 8), px, "jpeg")
    assert(dims == Seq(8, 8)) // decoded as single-channel, not promoted
    assert(data.forall(v => math.abs(v - 100) <= 8))
  }
}
