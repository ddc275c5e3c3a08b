package graft.codecs

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Round-trip and validation tests for the GRT1 tensor layout
  * (reference semantics: codecs.py:133-212 round-trip tests in
  * tests/test_codec_ndarray.py). Property-style: scalacheck Gens
  * sampled on fixed seeds (the scalatest-scalacheck bridge artifact
  * isn't available offline). */
class TensorCodecSpec extends SparkSpec {

  /** Deterministic property driver. */
  private def forAllSeeded[A](g: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (1 to n).foreach(i => f(g.pureApply(Gen.Parameters.default, Seed(i.toLong))))

  private def arr(values: Seq[Any]): GenericArrayData =
    new GenericArrayData(values.toArray)

  private val genDims: Gen[Array[Int]] = Gen.oneOf(
    Gen.const(Array.empty[Int]),
    Gen.choose(0, 20).map(n => Array(n)),
    for (a <- Gen.choose(1, 6); b <- Gen.choose(1, 6)) yield Array(a, b),
    for (a <- Gen.choose(1, 4); b <- Gen.choose(1, 4); c <- Gen.choose(1, 3))
      yield Array(a, b, c))

  private def genValues(dtype: String, n: Int): Gen[Seq[Any]] = dtype match {
    case "int8"    => Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.map(_.toByte))
    case "int16"   => Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue)).map(_.map(_.toShort))
    case "int32"   => Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue))
    case "int64"   => Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    case "float32" => Gen.listOfN(n, Gen.chooseNum(-1e30f, 1e30f))
    case "float64" => Gen.listOfN(n, Gen.chooseNum(-1e300, 1e300))
    case "uint8"   => Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toShort))
    case "uint16"  => Gen.listOfN(n, Gen.chooseNum(0, 65535))
    case "uint32"  => Gen.listOfN(n, Gen.chooseNum(0L, 4294967295L))
    case "bool"    => Gen.listOfN(n, Gen.oneOf(true, false))
  }

  for (dtype <- Dtype.ByName.keys.toSeq.sorted; compressed <- Seq(false, true)) {
    test(s"round-trip $dtype compressed=$compressed") {
      forAllSeeded(genDims.flatMap(d =>
          genValues(dtype, if (d.isEmpty) 7 else d.product).map(v => (d, v)))) {
        case (dims, values) =>
          val bytes = TensorCodec.encode(dtype, dims, arr(values), compressed)
          val (name, dDims, dData) = TensorCodec.decode(bytes)
          assert(name == dtype)
          assert(dDims.toSeq == dims.toSeq)
          val spec = Dtype(dtype)
          val decoded = dData.toObjectArray(spec.sparkType).toSeq
          assert(decoded == values)
      }
    }
  }

  test("compressed payload is smaller on repetitive data") {
    val values = Seq.fill(10000)(42)
    val raw = TensorCodec.encode("int32", Array(10000), arr(values), compressed = false)
    val z = TensorCodec.encode("int32", Array(10000), arr(values), compressed = true)
    assert(z.length < raw.length / 10)
  }

  test("magic bytes are the literal 'GRT1' on disk") {
    val bytes = TensorCodec.encode("int32", Array(1), arr(Seq(5)), compressed = false)
    assert(new String(bytes.take(4), "US-ASCII") == "GRT1")
  }

  test("decode rejects non-GRT1 bytes and truncated input") {
    intercept[IllegalArgumentException](TensorCodec.decode("oops".getBytes ++ Array[Byte](1, 0, 0)))
    intercept[IllegalArgumentException](TensorCodec.decode(Array[Byte](1, 2)))
  }

  test("decode rejects dims/payload mismatch") {
    val good = TensorCodec.encode("int32", Array(3), arr(Seq(1, 2, 3)), compressed = false)
    // chop one element (4 bytes) off the payload
    val bad = good.dropRight(4)
    val e = intercept[IllegalArgumentException](TensorCodec.decode(bad))
    assert(e.getMessage.contains("dims say"))
  }

  test("encode rejects shape/element-count mismatch") {
    val e = intercept[IllegalArgumentException](
      TensorCodec.encode("int32", Array(2, 2), arr(Seq(1, 2, 3)), compressed = false))
    assert(e.getMessage.contains("does not match"))
  }

  test("decodeStruct rejects dtype mismatch") {
    val bytes = TensorCodec.encode("int32", Array(1), arr(Seq(5)), compressed = false)
    val e = intercept[IllegalArgumentException](
      TensorCodec.decodeStruct(bytes, Dtype("float32").code))
    assert(e.getMessage.contains("int32"))
  }

  test("unsigned dtypes store at natural width") {
    // 100 uint8 elements: header 7 + dims 4 + payload 100 = 111 bytes
    val v = Seq.fill(100)(200.toShort)
    val bytes = TensorCodec.encode("uint8", Array(100), arr(v), compressed = false)
    assert(bytes.length == 7 + 4 + 100)
    val (_, _, data) = TensorCodec.decode(bytes)
    assert(data.toShortArray().forall(_ == 200))
  }

  test("EncodeTensor/DecodeTensor round-trip through a DataFrame (codegen path)") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    import spark.implicits._
    val df = Seq((1, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (2, Seq(5.0f, 6.0f, 7.0f, 8.0f)))
      .toDF("id", "vec")
    val enc = encodeTensor(array(lit(2), lit(2)), col("vec"), "float32")
    val out = df.select(col("id"), decodeTensor(enc, "float32").as("t"))
      .select(col("id"), col("t.dims"), col("t.data"))
      .orderBy("id").collect()
    assert(out.map(_.getSeq[Int](1)).forall(_ == Seq(2, 2)))
    assert(out(0).getSeq[Float](2) == Seq(1.0f, 2.0f, 3.0f, 4.0f))
    assert(out(1).getSeq[Float](2) == Seq(5.0f, 6.0f, 7.0f, 8.0f))
  }

  test("EncodeTensor null-safety: null input yields null output") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS vec")
    val enc = encodeTensor(array(lit(1)), col("vec"), "float32")
    val r = df.select(enc.as("b")).collect()
    assert(r(0).isNullAt(0))
  }
}
