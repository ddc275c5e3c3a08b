package graft.sources

import java.util.Base64

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.schema.CodecSpec

/** Unischema PARSING — the JVM mini-unpickler against every pickle
  * generation: the reference's committed 0.7.6 protocol-0 blob (real
  * bytes from the legacy fixture's _common_metadata), CPython
  * protocol-2 and protocol-4 dumps of a reference-built Unischema,
  * our own writer's output, and the reader integration that opens a
  * petastorm store with zero user-side schema declarations. */
class PickleReadSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir: String = {
    val f = new java.io.File("fixtures/petastorm_legacy_0.7.6")
    if (f.exists) f.getAbsolutePath
    else "/root/repo/fixtures/petastorm_legacy_0.7.6"
  }

  // pickle.dumps(Unischema('Proto2Schema', [id/vec/pic/tag]), protocol=N)
  // built with the reference's own classes
  private val proto2 =
    "gAJjcGV0YXN0b3JtLnVuaXNjaGVtYQpVbmlzY2hlbWEKcQApgXEBfXECKFgFAAAAX25hbWVxA1gMAAAAUHJvdG8yU2NoZW1hcQRYBwAAAF9maWVsZHNxBWNjb2xsZWN0aW9ucwpPcmRlcmVkRGljdApxBilScQcoWAIAAABpZHEIY3BldGFzdG9ybS51bmlzY2hlbWEKVW5pc2NoZW1hRmllbGQKcQkoaAhjbnVtcHkKaW50NjQKcQopY3BldGFzdG9ybS5jb2RlY3MKU2NhbGFyQ29kZWMKcQspgXEMfXENWAsAAABfc3BhcmtfdHlwZXEOY3B5c3Bhcmsuc3FsLnR5cGVzCkxvbmdUeXBlCnEPKYFxEHNiiXRxEYFxElgDAAAAdmVjcRNoCShoE2NudW1weQpmbG9hdDMyCnEUSwROhnEVY3BldGFzdG9ybS5jb2RlY3MKTmRhcnJheUNvZGVjCnEWKYFxF4h0cRiBcRlYAwAAAHBpY3EaaAkoaBpjbnVtcHkKdWludDgKcRtLEEsQSwOHcRxjcGV0YXN0b3JtLmNvZGVjcwpDb21wcmVzc2VkSW1hZ2VDb2RlYwpxHSmBcR59cR8oWAwAAABfaW1hZ2VfY29kZWNxIFgFAAAALmpwZWdxIVgIAAAAX3F1YWxpdHlxIktGdWKJdHEjgXEkWAMAAAB0YWdxJWgJKGglY251bXB5CnN0cl8KcSYpaAspgXEnfXEoaA5jcHlzcGFyay5zcWwudHlwZXMKU3RyaW5nVHlwZQpxKSmBcSp9cStYCQAAAGNvbGxhdGlvbnEsWAsAAABVVEY4X0JJTkFSWXEtc2JzYoh0cS6BcS91aAhoEmgTaBloGmgkaCVoL3ViLg=="
  private val proto4 =
    "gASVDwIAAAAAAACME3BldGFzdG9ybS51bmlzY2hlbWGUjAlVbmlzY2hlbWGUk5QpgZR9lCiMBV9uYW1llIwMUHJvdG8yU2NoZW1hlIwHX2ZpZWxkc5SMC2NvbGxlY3Rpb25zlIwLT3JkZXJlZERpY3SUk5QpUpQojAJpZJRoAIwOVW5pc2NoZW1hRmllbGSUk5QoaAyMBW51bXB5lIwFaW50NjSUk5QpjBBwZXRhc3Rvcm0uY29kZWNzlIwLU2NhbGFyQ29kZWOUk5QpgZR9lIwLX3NwYXJrX3R5cGWUjBFweXNwYXJrLnNxbC50eXBlc5SMCExvbmdUeXBllJOUKYGUc2KJdJSBlIwDdmVjlGgOKGgeaA+MB2Zsb2F0MzKUk5RLBE6GlGgSjAxOZGFycmF5Q29kZWOUk5QpgZSIdJSBlIwDcGljlGgOKGgnaA+MBXVpbnQ4lJOUSxBLEEsDh5RoEowUQ29tcHJlc3NlZEltYWdlQ29kZWOUk5QpgZR9lCiMDF9pbWFnZV9jb2RlY5SMBS5qcGVnlIwIX3F1YWxpdHmUS0Z1Yol0lIGUjAN0YWeUaA4oaDRoD4wEc3RyX5STlCloFCmBlH2UaBdoGIwKU3RyaW5nVHlwZZSTlCmBlH2UjAljb2xsYXRpb26UjAtVVEY4X0JJTkFSWZRzYnNiiHSUgZR1aAxoHWgeaCZoJ2gzaDRoQHViLg=="

  private def checkProtoSchema(schema: graft.schema.GraftSchema): Unit = {
    assert(schema.name == "Proto2Schema")
    assert(schema.fieldNames == Seq("id", "vec", "pic", "tag"))
    val vec = schema("vec")
    assert(vec.dataType == FloatType && vec.shape == Seq(4, -1) &&
      vec.codec.contains(CodecSpec("npy")) && vec.nullable)
    val pic = schema("pic")
    assert(pic.dataType == ShortType && pic.shape == Seq(16, 16, 3))
    assert(pic.codec.contains(
      CodecSpec("jpeg", Map("quality" -> "70"))) && !pic.nullable)
    assert(schema("id").dataType == LongType &&
      schema("id").codec.contains(CodecSpec("scalar")))
    assert(schema("tag").dataType == StringType)
  }

  test("protocol-2 and protocol-4 CPython pickles parse identically") {
    checkProtoSchema(UnischemaPickle.parse(
      Base64.getDecoder.decode(proto2)))
    checkProtoSchema(UnischemaPickle.parse(
      Base64.getDecoder.decode(proto4)))
  }

  test("the reference's committed 0.7.6 pickle parses from the real " +
      "_common_metadata footer") {
    val got = Materialize.loadPetastormSchema(spark, fixtureDir)
    assert(got.isDefined, "no unischema found in legacy fixture")
    val s = got.get
    val m = s("matrix")
    assert(m.dataType == FloatType && m.shape == Seq(32, 16, 3) &&
      m.codec.contains(CodecSpec("npy")))
    val u16 = s("matrix_uint16")
    assert(u16.dataType == IntegerType && u16.codec.contains(CodecSpec("npy")))
    assert(s("id").dataType == LongType)
    assert(s("sensor_name").dataType == StringType &&
      s("sensor_name").codec.contains(CodecSpec("npy")))
    assert(s("id_float").dataType == DoubleType)
    assert(s.fieldNames.contains("partition_key"))
  }

  test("our own writer round-trips through parse (ndarray -> npy)") {
    val schema = graft.schema.GraftSchema("RT", Seq(
      graft.schema.FieldSpec("id", LongType,
        codec = Some(CodecSpec("scalar"))),
      graft.schema.FieldSpec("emb", FloatType, Seq(4, 2),
        Some(CodecSpec("ndarray")), nullable = true),
      graft.schema.FieldSpec("img", ShortType, Seq(8, 8),
        Some(CodecSpec("png")))))
    val back = UnischemaPickle.parse(UnischemaPickle.pickle(schema))
    assert(back.name == "RT")
    assert(back("emb").copy(codec = None) ==
      schema("emb").copy(codec = None))
    assert(back("emb").codec.contains(CodecSpec("npy")))
    assert(back("img").codec.contains(
      CodecSpec("png", Map("quality" -> "80"))))
    // image dtype re-widens from the pickled uint8
    assert(back("img").dataType == ShortType)
  }

  test("adversarial bytes fail fast and clean (no hangs, no " +
      "out-of-bounds escapes) — the VM parses UNTRUSTED metadata") {
    val rnd = new scala.util.Random(42)
    var done = 0
    (0 until 500).foreach { k =>
      val n = 1 + rnd.nextInt(200)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      try { PickleReader.loads(bytes); done += 1 }
      catch {
        case _: IllegalArgumentException => done += 1
        case e: Throwable =>
          fail(s"case $k leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(done == 500)
    // truncations of a VALID pickle must also fail cleanly
    val good = UnischemaPickle.pickle(graft.schema.GraftSchema("T",
      Seq(graft.schema.FieldSpec("id",
        org.apache.spark.sql.types.LongType,
        codec = Some(graft.schema.CodecSpec("scalar"))))))
    (1 until good.length by 7).foreach { cut =>
      try PickleReader.loads(good.take(cut))
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"truncation at $cut leaked ${e.getClass.getName}")
      }
    }
  }

  test("GraftRead opens a petastorm store with ZERO user-side schema " +
      "declarations (auto-decode from its own pickle)") {
    val df = GraftRead.reader(spark, fixtureDir).load()
    // tensors decoded to flat arrays, scalars native, partition col in
    val row = df.filter(col("id") === 3L)
      .select(col("id"), col("partition_key"), col("matrix"),
        col("matrix_uint16"), col("sensor_name"))
      .head()
    assert(row.getString(1).startsWith("p_"))
    assert(row.getSeq[Double](2).length == 32 * 16 * 3)
    assert(row.getSeq[Long](3).length == 32 * 16 * 3)
    assert(row.getSeq[Long](3).forall(v => v >= 0 && v <= 65535))
    assert(row.getSeq[String](4) == Seq("test_sensor"))
    // composition with the builder: field view + predicate
    val slim = GraftRead.reader(spark, fixtureDir)
      .fields("id", "matrix_uint16")
      .predicate(col("id") < 10L)
      .load()
    assert(slim.columns.toSeq == Seq("id", "matrix_uint16"))
    assert(slim.count() == 10L)
  }
}
