package graft.schema

import org.apache.spark.sql.types._

/** Codec designation for a field (reference: codecs.py:15-22).
  * `name` ∈ {"scalar", "ndarray", "compressed_ndarray", "png", "jpeg"}.
  */
final case class CodecSpec(name: String, args: Map[String, String] = Map.empty)

/** One field of a [[GraftSchema]] — the Unischema field equivalent
  * (reference: unischema.py:50-69's 5-tuple (name, numpy_dtype,
  * shape, codec, nullable)).
  *
  * @param name      column name
  * @param dataType  the *logical* element type (e.g. ShortType for a
  *                  uint8 tensor); the *storage* type is BinaryType
  *                  when a binary codec is present
  * @param shape     tensor shape; -1 marks a variable dimension
  *                  (reference uses None, unischema.py:55-56);
  *                  empty = scalar
  * @param codec     storage codec; None = plain Spark-native column
  * @param nullable  nullability, enforced on materialize
  */
final case class FieldSpec(
    name: String,
    dataType: DataType,
    shape: Seq[Int] = Nil,
    codec: Option[CodecSpec] = None,
    nullable: Boolean = false) {

  def isTensor: Boolean = shape.nonEmpty

  /** Parquet storage type: binary codecs store BinaryType; scalar
    * codec stores its target type; otherwise the logical type (or an
    * ArrayType for shaped codec-less fields). */
  def storageType: DataType = codec match {
    case Some(CodecSpec("scalar", _)) => dataType
    case Some(_)                      => BinaryType
    case None if isTensor             => ArrayType(dataType, containsNull = false)
    case None                         => dataType
  }

  def toStructField: StructField = {
    val mb = new MetadataBuilder()
    if (shape.nonEmpty) mb.putLongArray(GraftSchema.ShapeKey, shape.map(_.toLong).toArray)
    codec.foreach { c =>
      mb.putString(GraftSchema.CodecKey, c.name)
      if (c.args.nonEmpty) {
        val amb = new MetadataBuilder()
        c.args.foreach { case (k, v) => amb.putString(k, v) }
        mb.putMetadata(GraftSchema.CodecArgsKey, amb.build())
      }
    }
    mb.putString(GraftSchema.LogicalTypeKey, dataType.json)
    StructField(name, storageType, nullable, mb.build())
  }
}

/** Schema that renders to a Spark `StructType` (with per-field
  * metadata carrying shape + codec) and serializes via the
  * StructType JSON contract — our versioned replacement for the
  * reference's pickled Unischema (dataset_metadata.py:194-205).
  *
  * Field views accept exact names or regex patterns matched against
  * the full field name (reference: unischema.py:199-240, :437-464).
  */
final case class GraftSchema(name: String, fields: Seq[FieldSpec]) {

  def fieldNames: Seq[String] = fields.map(_.name)

  def apply(field: String): FieldSpec =
    fields.find(_.name == field).getOrElse(
      throw new IllegalArgumentException(s"no field $field in schema $name"))

  /** Storage-side StructType (what lands in parquet). */
  def toStructType: StructType = StructType(fields.map(_.toStructField))

  /** Schema view: keep fields whose name equals a selector or fully
    * matches it as a regex. Unknown exact selectors raise (parity:
    * unischema.py:224-238 raises on no-match). */
  def view(selectors: Seq[String]): GraftSchema = {
    val kept = fields.filter(f =>
      selectors.exists(s => f.name == s || f.name.matches(s)))
    val unmatched = selectors.filterNot(s =>
      fields.exists(f => f.name == s || f.name.matches(s)))
    require(unmatched.isEmpty,
      s"selectors matched no field: ${unmatched.mkString(", ")}")
    copy(fields = kept)
  }

  def toJson: String = {
    // versioned envelope around StructType.json (which preserves
    // field metadata round-trip)
    s"""{"version":1,"name":${GraftSchema.quote(name)},"struct":${toStructType.json}}"""
  }
}

object GraftSchema {
  val ShapeKey = "graft.shape"
  val CodecKey = "graft.codec"
  val CodecArgsKey = "graft.codecArgs"
  val LogicalTypeKey = "graft.logicalType"
  val FooterKey = "graft.schema.v1"

  def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Inverse of [[quote]] for an already-unwrapped string body. */
  def unquoteBody(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  def fromStructField(sf: StructField): FieldSpec = {
    val m = sf.metadata
    val shape =
      if (m.contains(ShapeKey)) m.getLongArray(ShapeKey).map(_.toInt).toSeq
      else Nil
    val codec =
      if (m.contains(CodecKey)) {
        val args =
          if (m.contains(CodecArgsKey)) {
            val am = m.getMetadata(CodecArgsKey)
            // Metadata has no key enumeration in the public API; we
            // re-parse its JSON representation minimally. Codec args
            // are flat string->string.
            parseFlatStringMap(am.json)
          } else Map.empty[String, String]
        Some(CodecSpec(m.getString(CodecKey), args))
      } else None
    val logical =
      if (m.contains(LogicalTypeKey)) DataType.fromJson(m.getString(LogicalTypeKey))
      else sf.dataType
    FieldSpec(sf.name, logical, shape, codec, sf.nullable)
  }

  /** Rebuild from a storage StructType (inverse of `toStructType`);
    * fields without graft metadata become plain scalar specs —
    * the "inferred" mode of the reference (unischema.py:302-353). */
  def fromStructType(name: String, st: StructType): GraftSchema =
    GraftSchema(name, st.fields.toSeq.map(fromStructField))

  def fromJson(json: String): GraftSchema = {
    val nameM = """"name"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val name = nameM.findFirstMatchIn(json).map(_.group(1))
      .map(_.replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse("dataset")
    val idx = json.indexOf("\"struct\":")
    require(idx >= 0, "missing struct in schema json")
    val structJson = json.substring(idx + 9, json.length - 1)
    fromStructType(name, DataType.fromJson(structJson).asInstanceOf[StructType])
  }

  /** minimal flat {"k":"v"} parser for codec args. */
  private def parseFlatStringMap(json: String): Map[String, String] = {
    val kv = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    kv.findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap
  }
}
