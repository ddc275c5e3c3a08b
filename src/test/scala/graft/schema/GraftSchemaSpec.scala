package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema view + JSON round-trip (reference: unischema.py:199-240
  * regex views, dataset_metadata.py:194-205 stored-schema contract —
  * ours is versioned JSON, not pickle). */
class GraftSchemaSpec extends AnyFunSuite {

  private val schema = GraftSchema("test", Seq(
    FieldSpec("id", IntegerType),
    FieldSpec("id2", LongType, nullable = true),
    FieldSpec("image", ShortType, shape = Seq(128, 64, 3),
      codec = Some(CodecSpec("ndarray"))),
    FieldSpec("mask", ShortType, shape = Seq(-1, -1),
      codec = Some(CodecSpec("compressed_ndarray"))),
    FieldSpec("photo", ShortType, shape = Seq(-1, -1, 3),
      codec = Some(CodecSpec("jpeg", Map("quality" -> "80")))),
    FieldSpec("score", DoubleType, codec = Some(CodecSpec("scalar"))),
    FieldSpec("tags", StringType, shape = Seq(-1))))

  test("storage types: binary codecs → BinaryType, scalar codec → own type, shaped codec-less → ArrayType") {
    val st = schema.toStructType
    assert(st("image").dataType == BinaryType)
    assert(st("mask").dataType == BinaryType)
    assert(st("photo").dataType == BinaryType)
    assert(st("score").dataType == DoubleType)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(st("id").dataType == IntegerType)
  }

  test("view with exact names keeps order and raises on unknown") {
    assert(schema.view(Seq("id", "image")).fieldNames == Seq("id", "image"))
    val e = intercept[IllegalArgumentException](schema.view(Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }

  test("view with regex selectors (parity: unischema.py:437-464)") {
    assert(schema.view(Seq("id.*")).fieldNames == Seq("id", "id2"))
    assert(schema.view(Seq("id", ".*a.*")).fieldNames ==
      Seq("id", "image", "mask", "tags"))
  }

  test("JSON round-trip preserves shape, codec, args, nullability, logical type") {
    val back = GraftSchema.fromJson(schema.toJson)
    assert(back.name == schema.name)
    assert(back.fields == schema.fields)
  }

  test("fromStructType infers plain fields as codec-less scalar specs") {
    val st = StructType(Seq(StructField("a", IntegerType, nullable = true)))
    val g = GraftSchema.fromStructType("inferred", st)
    assert(g.fields == Seq(FieldSpec("a", IntegerType, Nil, None, nullable = true)))
  }

  test("schema name with quotes/backslashes survives JSON round-trip") {
    val tricky = GraftSchema("""na"me\x""", Seq(FieldSpec("a", IntegerType)))
    assert(GraftSchema.fromJson(tricky.toJson).name == """na"me\x""")
  }
}
