package graft.codecs

import java.util.Base64

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** `.npy` decode against vectors produced by numpy's own `np.save`
  * (base64-embedded): dtypes, C/Fortran order, big-endian, fixed
  * strings with interior NULs, UTF-32 with astral codepoints,
  * 0-d scalars, empty arrays, and the overflow/misuse guards. Plus
  * the real thing: the reference's committed 0.7.6 legacy store
  * (fixtures/petastorm_legacy_0.7.6, vendored unmodified). */
class NpyCodecSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(b64: String): Array[Byte] =
    Base64.getDecoder.decode(b64)

  // np.save outputs (see spec comments for the generating arrays)
  private val u2C = // np.arange(24, uint16).reshape(2,3,4), C order
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPHUyJywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDIsIDMsIDQpLCB9ICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAEAAgADAAQABQAGAAcACAAJAAoACwAMAA0ADgAPABAAEQASABMAFAAVABYAFwA="
  private val u2F = // same array, fortran_order=True
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPHUyJywgJ2ZvcnRyYW5fb3JkZXInOiBUcnVlLCAnc2hhcGUnOiAoMiwgMywgNCksIH0gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAwABAAQAAgAFAABAA0ABQARAAkAFQACAA4ABgASAAoAFgADAA8ABwATAAsAFwA="
  private val f4 = // [[0.5, -1.25],[3.75, 100.125]] float32
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPGY0JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDIsIDIpLCB9ICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAA/AACgvwAAcEAAQMhC"
  private val s5 = // [b'ab\x00cd', b'x'] |S5 (interior NUL survives)
    "k05VTVBZAQB2AHsnZGVzY3InOiAnfFM1JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDIsKSwgfSAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAphYgBjZHgAAAAA"
  private val u4 = // ['héll', 'x😀y'] <U4 (astral codepoint)
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPFU0JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDIsKSwgfSAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIApoAAAA6QAAAGwAAABsAAAAeAAAAAD2AQB5AAAAAAAAAA=="
  private val scalar0d = // np.array(2.5) float64, shape ()
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPGY4JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKCksIH0gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAAAAAAEQA=="
  private val empty = // np.zeros((0,3), int32)
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPGk0JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDAsIDMpLCB9ICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAo="
  private val i8 = // [Long.Min, Long.Max] int64
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPGk4JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDIsKSwgfSAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAAAAAAAgP////////9/"
  private val u8big = // [2^64-1] uint64 — must refuse, not wrap
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPHU4JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDEsKSwgfSAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAr//////////w=="
  private val boolArr = // [True, False, True]
    "k05VTVBZAQB2AHsnZGVzY3InOiAnfGIxJywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDMsKSwgfSAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoBAAE="
  private val bigEnd = // np.arange(6, '>i4').reshape(2,3)
    "k05VTVBZAQB2AHsnZGVzY3InOiAnPmk0JywgJ2ZvcnRyYW5fb3JkZXInOiBGYWxzZSwgJ3NoYXBlJzogKDIsIDMpLCB9ICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAAAAAAAAQAAAAIAAAADAAAABAAAAAU="

  private def fixtureDir: String = {
    val f = new java.io.File("fixtures/petastorm_legacy_0.7.6")
    if (f.exists) f.getAbsolutePath
    else "/root/repo/fixtures/petastorm_legacy_0.7.6"
  }

  test("header: descr, shape, C/Fortran flag") {
    val h = NpyCodec.parseHeader(bytes(u2C))
    assert(h.descr == "<u2" && !h.fortran &&
      h.shape.toSeq == Seq(2, 3, 4))
    val hf = NpyCodec.parseHeader(bytes(u2F))
    assert(hf.fortran && hf.shape.toSeq == Seq(2, 3, 4))
    intercept[IllegalArgumentException] {
      NpyCodec.parseHeader("GRT1definitelynotnumpy".getBytes)
    }
  }

  test("integer decode: C and Fortran payloads yield the same " +
      "C-order flat array") {
    val c = NpyCodec.longData(bytes(u2C)).toLongArray().toSeq
    val f = NpyCodec.longData(bytes(u2F)).toLongArray().toSeq
    assert(c == (0 until 24).map(_.toLong))
    assert(f == c, "fortran payload must transpose to C order")
  }

  test("float, bool, big-endian, int64 extremes decode exactly") {
    assert(NpyCodec.doubleData(bytes(f4)).toDoubleArray().toSeq ==
      Seq(0.5, -1.25, 3.75, 100.125))
    assert(NpyCodec.longData(bytes(boolArr)).toLongArray().toSeq ==
      Seq(1L, 0L, 1L))
    assert(NpyCodec.longData(bytes(bigEnd)).toLongArray().toSeq ==
      (0L to 5L))
    assert(NpyCodec.longData(bytes(i8)).toLongArray().toSeq ==
      Seq(Long.MinValue, Long.MaxValue))
  }

  test("strings: |Sn keeps interior NULs, <Un handles astral " +
      "codepoints, both trim trailing NULs") {
    val s = NpyCodec.stringData(bytes(s5))
    assert(s.numElements() == 2)
    assert(s.getUTF8String(0).toString == "ab\u0000cd")
    assert(s.getUTF8String(1).toString == "x")
    val u = NpyCodec.stringData(bytes(u4))
    assert(u.getUTF8String(0).toString == "héll")
    assert(u.getUTF8String(1).toString == "x😀y")
  }

  test("0-d scalar is one element; empty array is zero") {
    assert(NpyCodec.doubleData(bytes(scalar0d)).toDoubleArray().toSeq ==
      Seq(2.5))
    assert(NpyCodec.parseHeader(bytes(scalar0d)).shape.isEmpty)
    assert(NpyCodec.longData(bytes(empty)).numElements() == 0)
  }

  test("guards: u8 overflow refused, wrong-family decode refused") {
    intercept[IllegalArgumentException] {
      NpyCodec.longData(bytes(u8big))
    }
    intercept[IllegalArgumentException] {
      NpyCodec.doubleData(bytes(u2C)) // integer descr via float decode
    }
    intercept[IllegalArgumentException] {
      NpyCodec.stringData(bytes(f4))
    }
  }

  test("column expressions decode in-plan and null passes through") {
    val df = Seq((1L, Option(bytes(u2C))), (2L, Option.empty[Array[Byte]]))
      .toDF("id", "cell")
    val got = df.select(col("id"),
        GraftFunctions.npyShape(col("cell")).as("shape"),
        GraftFunctions.npyDescr(col("cell")).as("descr"),
        GraftFunctions.npyLongs(col("cell")).as("vals"))
      .orderBy(col("id")).collect()
    assert(got(0).getSeq[Int](1) == Seq(2, 3, 4))
    assert(got(0).getString(2) == "<u2")
    assert(got(0).getSeq[Long](3).sum == 276L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    // SQL surface
    graft.functions.GraftExtensions.registerAll(spark)
    df.createOrReplaceTempView("npy_t")
    val viaSql = spark.sql(
      "SELECT graft_npy_descr(cell) FROM npy_t WHERE id = 1").head()
    assert(viaSql.getString(0) == "<u2")
  }

  test("encode is BYTE-IDENTICAL to np.save (v1.0 header, padding, " +
      "payload)") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def la(v: Long*) = UnsafeArrayData.fromPrimitiveArray(v.toArray)
    def da(v: Double*) = UnsafeArrayData.fromPrimitiveArray(v.toArray)
    def ia(v: Int*) = UnsafeArrayData.fromPrimitiveArray(v.toArray)
    assert(NpyEncode.fromLongs(la((0L until 24L): _*), ia(2, 3, 4),
      "<u2").sameElements(bytes(u2C)))
    assert(NpyEncode.fromDoubles(da(0.5, -1.25, 3.75, 100.125),
      ia(2, 2), "<f4").sameElements(bytes(f4)))
    assert(NpyEncode.fromLongs(la(1L, 0L, 1L), ia(3), "|b1")
      .sameElements(bytes(boolArr)))
    assert(NpyEncode.fromLongs(la(Long.MinValue, Long.MaxValue),
      ia(2), "<i8").sameElements(bytes(i8)))
    assert(NpyEncode.fromLongs(la(), ia(0, 3), "<i4")
      .sameElements(bytes(empty)))
    assert(NpyEncode.fromDoubles(da(2.5), ia(), "<f8")
      .sameElements(bytes(scalar0d)))
  }

  test("encode guards: range check and shape mismatch refuse") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def la(v: Long*) = UnsafeArrayData.fromPrimitiveArray(v.toArray)
    def ia(v: Int*) = UnsafeArrayData.fromPrimitiveArray(v.toArray)
    intercept[IllegalArgumentException] {
      NpyEncode.fromLongs(la(256L), ia(1), "<u1") // out of u1 range
    }
    intercept[IllegalArgumentException] {
      NpyEncode.fromLongs(la(1L, 2L), ia(3), "<i4") // 2 elems vs (3)
    }
    intercept[IllegalArgumentException] {
      NpyEncode.fromLongs(la(1L), ia(1), "<x9")
    }
  }

  test("encode->decode round-trip in-plan (and the cell is what the " +
      "petastorm decoder would np.load)") {
    val df = Seq((1L, Seq(5L, 300L, 70000L, 0L, 4294967295L)))
      .toDF("id", "vals")
    val cell = GraftFunctions.npyFromLongs(col("vals"),
      array(lit(5)), "<u4")
    val got = df.select(col("id"),
        GraftFunctions.npyLongs(cell).as("back"),
        GraftFunctions.npyDescr(cell).as("d"),
        GraftFunctions.npyShape(cell).as("s"))
      .head()
    assert(got.getSeq[Long](1) == Seq(5L, 300L, 70000L, 0L, 4294967295L))
    assert(got.getString(2) == "<u4")
    assert(got.getSeq[Int](3) == Seq(5))
  }

  test("legacy 0.7.6 petastorm store: scalars, tensors and strings " +
      "decode through the inferred-schema read") {
    val df = spark.read.parquet(fixtureDir)
    assert(df.count() == 100)
    val row = df.filter(col("id") === 3L)
      .select(col("id"), col("partition_key"),
        GraftFunctions.npyShape(col("matrix")).as("ms"),
        GraftFunctions.npyDescr(col("matrix")).as("md"),
        GraftFunctions.npyShape(col("matrix_uint16")).as("m16s"),
        GraftFunctions.npyLongs(col("matrix_uint16")).as("m16"),
        GraftFunctions.npyDoubles(col("matrix")).as("m"),
        GraftFunctions.npyStrings(col("sensor_name")).as("sensor"))
      .head()
    assert(row.getString(1).startsWith("p_"))
    assert(row.getSeq[Int](2) == Seq(32, 16, 3))
    assert(row.getString(3) == "<f4")
    assert(row.getSeq[Int](4) == Seq(32, 16, 3))
    assert(row.getSeq[Long](5).length == 1536)
    assert(row.getSeq[Long](5).forall(v => v >= 0 && v <= 65535))
    assert(row.getSeq[Double](6).length == 1536)
    assert(row.getSeq[String](7) == Seq("test_sensor"))
    // nullable tensor column: nulls flow through as nulls
    val nn = df.select(
        GraftFunctions.npyLongs(col("matrix_nullable")).as("mn"))
      .filter(col("mn").isNull).count()
    assert(nn == df.filter(col("matrix_nullable").isNull).count())
  }
}
