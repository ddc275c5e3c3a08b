package graft.codecs

import java.util.Base64

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** `.npz` container codec against cells produced by numpy's OWN
  * `np.savez_compressed` (base64-embedded — note numpy writes
  * ZIP64-extra local headers via `force_zip64=True`, which the
  * unwrap path must accept), plus the JVM round trip and the
  * adversarial fail-fast contract. Reference behavior anchor:
  * petastorm codecs.py:174-212 (encode `np.savez_compressed(memfile,
  * arr=value)`, decode `np.load(memfile)['arr']`). */
class NpzCodecSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(b64: String): Array[Byte] =
    Base64.getDecoder.decode(b64)

  // np.savez_compressed(io.BytesIO(), arr=np.arange(24,
  //   dtype=np.uint16).reshape(4, 6) * 3)
  private val u16cell =
    "UEsDBC0AAAAIAAAAIQAMBmuS//////////8HABQAYXJyLm5weQEAEACwAAAAAAAAAHYAAAAAAAAAm+wX6hsQychQxlCtnpJanFykbqWgblNqpK6joJ6WX1RSlJgXn1+UkgoSd0vMKU4FihdnJBakAvkaJjoKZpo6CrUKZAMuBgZmBjYGTgYeBn4GIQZRBgkGaQY5BkUGFQZ1Bi0GXQYDBmMGMwZLBhsGewYnBlcGAFBLAQItAy0AAAAIAAAAIQAMBmuSdgAAALAAAAAHAAAAAAAAAAAAAACAAQAAAABhcnIubnB5UEsFBgAAAAABAAEANQAAAK8AAAAAAA=="

  // np.savez_compressed(..., arr=(np.arange(12, dtype=np.float32)
  //   .reshape(3, 4) / 7.0).astype(np.float32))
  private val f4cell =
    "UEsDBC0AAAAIAAAAIQA7Z5yw//////////8HABQAYXJyLm5weQEAEACwAAAAAAAAAHIAAAAAAAAAm+wX6hsQychQxlCtnpJanFykbqWgbpNmoq6joJ6WX1RSlJgXn1+UkgoSd0vMKU4FihdnJBakAvkaxjoKJpo6CrUKZAMuBiBQ9RSyU/WcZLc99zaQFrLPu21mvz032p6BocEeKG7vOWkJUGyb/SSVk/YAUEsBAi0DLQAAAAgAAAAhADtnnLByAAAAsAAAAAcAAAAAAAAAAAAAAIABAAAAAGFyci5ucHlQSwUGAAAAAAEAAQA1AAAAqwAAAAAA"

  test("genuine np.savez_compressed uint16 cell: unwrap + npy decode") {
    val df = Seq(Tuple1(bytes(u16cell))).toDF("z")
      .select(GraftFunctions.npzUnwrap($"z").as("npy"))
      .select(GraftFunctions.npyDescr($"npy").as("descr"),
        GraftFunctions.npyShape($"npy").as("shape"),
        GraftFunctions.npyLongs($"npy").as("v"))
    val (descr, shape, v) =
      df.as[(String, Seq[Int], Seq[Long])].head()
    assert(descr == "<u2")
    assert(shape == Seq(4, 6))
    assert(v == (0 until 24).map(_ * 3L))
  }

  test("genuine np.savez_compressed float32 cell: exact micros") {
    val got = Seq(Tuple1(bytes(f4cell))).toDF("z")
      .select(transform(
        GraftFunctions.npyDoubles(GraftFunctions.npzUnwrap($"z")),
        x => floor(x * 1000000d).cast("long")).as("m"))
      .as[Seq[Long]].head()
    assert(got == Seq(0L, 142857L, 285714L, 428571L, 571428L, 714285L,
      857142L, 1000000L, 1142857L, 1285714L, 1428571L, 1571428L))
  }

  test("JVM wrap/unwrap round trip preserves npy bytes exactly and " +
      "wrap is byte-deterministic") {
    val df = Seq(Tuple1((1L to 20L).toArray)).toDF("a")
      .select(GraftFunctions.npyFromLongs($"a",
        array(lit(4), lit(5)), "<i8").as("npy"))
      .select($"npy",
        GraftFunctions.npzWrap($"npy").as("z1"),
        GraftFunctions.npzWrap(GraftFunctions.npzUnwrap(
          GraftFunctions.npzWrap($"npy"))).as("z2"))
    val (npy, z1, z2) =
      df.as[(Array[Byte], Array[Byte], Array[Byte])].head()
    assert(z1.toSeq == z2.toSeq)           // deterministic bytes
    assert(z1(0) == 'P' && z1(1) == 'K')    // real zip container
    assert(NpzCodec.unwrap(z1).toSeq == npy.toSeq)
    // decode of the wrapped cell equals the original values
    val v = Seq(Tuple1(z1)).toDF("z")
      .select(GraftFunctions.npyLongs(GraftFunctions.npzUnwrap($"z")))
      .as[Seq[Long]].head()
    assert(v == (1L to 20L))
  }

  test("adversarial cells fail fast, never decode to garbage") {
    val notZip = intercept[Exception] {
      Seq(Tuple1("not a zip".getBytes)).toDF("z")
        .select(GraftFunctions.npzUnwrap($"z")).collect()
    }
    assert(notZip.getMessage.contains("zip magic") ||
      notZip.getCause != null)
    // a valid zip with no .npy member
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    zos.write("hi".getBytes); zos.closeEntry(); zos.close()
    val noNpy = intercept[Exception] {
      Seq(Tuple1(bos.toByteArray)).toDF("z")
        .select(GraftFunctions.npzUnwrap($"z")).collect()
    }
    assert(noNpy.getMessage.contains("npy member") ||
      noNpy.getCause != null)
  }
}
