package graft.sources

import org.apache.spark.sql.types._

import graft.schema.{CodecSpec, FieldSpec, GraftSchema}

/** Python-pickle serialization of a [[GraftSchema]] AS a petastorm
  * `Unischema` — the last piece of write-side interop: petastorm's
  * `make_reader` loads its schema by unpickling the
  * `dataset-toolkit.unischema.v1` blob from `_common_metadata`
  * (etl/dataset_metadata.py:194-205, :356-386), so a store carrying
  * this blob (plus np.save-layout tensor cells — [[graft.codecs.NpyEncode]]
  * — and genuine png/jpeg image cells) opens in unmodified petastorm
  * with no shim.
  *
  * The stream is hand-built pickle PROTOCOL 0 — the ASCII-only
  * protocol — deliberately: parquet key-value metadata round-trips
  * through Java Strings as UTF-8, which would mangle the binary
  * opcodes of protocol ≥ 1 (the `\x80` header byte alone), while
  * protocol 0 survives byte-for-byte. Python's `pickle.loads`
  * accepts protocol 0 regardless of writer version. Opcodes used:
  * GLOBAL `c`, MARK `(`, TUPLE `t`, DICT `d`, REDUCE `R`, BUILD `b`,
  * NONE `N`, INT `I`, STRING `S`, STOP `.` (the public pickle
  * grammar, python stdlib `pickletools`). Instances reconstruct via
  * `copyreg._reconstructor` exactly as CPython's own protocol-0
  * pickler emits for new-style classes; `UnischemaField` (a tuple
  * subclass) reconstructs through `tuple.__new__`, numpy dtypes are
  * class GLOBALs (`numpy.int64`), codec instances rebuild bare and
  * take their state via BUILD.
  *
  * Scope: scalar/ndarray/png/jpeg codecs and codec-less columns over
  * the numpy-mappable Spark types below. `compressed_ndarray` is
  * refused (petastorm's CompressedNdarrayCodec uses a pyarrow
  * compression container, not our deflate layout — emitting its
  * class would promise a decode that fails). */
object UnischemaPickle {

  /** numpy scalar-type GLOBAL name for a Spark element type. */
  private def numpyName(dt: DataType): String = dt match {
    case ByteType    => "int8"
    case ShortType   => "int16"
    case IntegerType => "int32"
    case LongType    => "int64"
    case FloatType   => "float32"
    case DoubleType  => "float64"
    case BooleanType => "bool_"
    case StringType  => "str_"
    case BinaryType  => "bytes_"
    case t => throw new IllegalArgumentException(
      s"no numpy mapping for Spark type $t")
  }

  /** pyspark.sql.types class name for ScalarCodec's _spark_type. */
  private def pysparkTypeName(dt: DataType): String = dt match {
    case ByteType    => "ByteType"
    case ShortType   => "ShortType"
    case IntegerType => "IntegerType"
    case LongType    => "LongType"
    case FloatType   => "FloatType"
    case DoubleType  => "DoubleType"
    case BooleanType => "BooleanType"
    case StringType  => "StringType"
    case BinaryType  => "BinaryType"
    case t => throw new IllegalArgumentException(
      s"no pyspark scalar type for $t")
  }

  private def esc(s: String): String = {
    require(s.forall(c => c >= 0x20 && c < 0x7f),
      s"pickled names must be printable ASCII (got '$s')")
    s.replace("\\", "\\\\").replace("'", "\\'")
  }

  private final class W {
    private val sb = new StringBuilder
    def raw(s: String): W = { sb.append(s); this }
    def global(mod: String, name: String): W = raw(s"c$mod\n$name\n")
    def none(): W = raw("N")
    def bool(b: Boolean): W = raw(if (b) "I01\n" else "I00\n")
    def int(v: Long): W = raw(s"I$v\n")
    def str(s: String): W = raw(s"S'${esc(s)}'\n")
    def mark(): W = raw("(")
    def tuple(): W = raw("t")
    def dict(): W = raw("d")
    def reduce(): W = raw("R")
    def build(): W = raw("b")
    def stop(): W = raw(".")
    def bytes: Array[Byte] =
      sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** `_reconstructor(cls, object, None)` — a bare new-style instance. */
  private def bareInstance(w: W, mod: String, cls: String): Unit = {
    w.global("copyreg", "_reconstructor").mark()
      .global(mod, cls).global("builtins", "object").none()
      .tuple().reduce()
  }

  private def writeCodec(w: W, f: FieldSpec): Unit = f.codec match {
    case None => w.none()
    case Some(CodecSpec("scalar", _)) =>
      bareInstance(w, "petastorm.codecs", "ScalarCodec")
      w.mark().str("_spark_type")
      bareInstance(w, "pyspark.sql.types", pysparkTypeName(f.dataType))
      w.dict().build()
    case Some(CodecSpec("ndarray", _)) =>
      bareInstance(w, "petastorm.codecs", "NdarrayCodec")
    case Some(CodecSpec(fmt @ ("png" | "jpeg"), args)) =>
      bareInstance(w, "petastorm.codecs", "CompressedImageCodec")
      w.mark().str("_image_codec").str("." + fmt)
        .str("_quality")
        .int(args.getOrElse("quality", "80").toLong)
        .dict().build()
    case Some(CodecSpec(other, _)) =>
      throw new IllegalArgumentException(
        s"codec '$other' has no petastorm-compatible serialization " +
          "(compressed_ndarray's pyarrow container differs from our " +
          "deflate layout) — materialize it as 'ndarray' for interop")
  }

  private def writeField(w: W, f: FieldSpec): Unit = {
    // _reconstructor(UnischemaField, tuple, (name, dtype, shape,
    // codec, nullable)) — tuple.__new__ builds the namedtuple
    w.global("copyreg", "_reconstructor").mark()
      .global("petastorm.unischema", "UnischemaField")
      .global("builtins", "tuple")
      .mark().str(f.name)
    // image pixels are uint8 on the petastorm side (its codec
    // encodes/asserts np.uint8); our FieldSpec carries the WIDENED
    // logical type (ShortType) — emit the petastorm-native dtype
    val np = f.codec match {
      case Some(CodecSpec("png" | "jpeg", _)) => "uint8"
      case _ => numpyName(f.dataType)
    }
    w.global("numpy", np)
    w.mark()
    f.shape.foreach(d => if (d > 0) w.int(d) else w.none())
    w.tuple() // shape tuple; empty shape -> ()
    writeCodec(w, f)
    w.bool(f.nullable)
    w.tuple()  // the 5-tuple state
      .tuple() // _reconstructor args
      .reduce()
  }

  /** The pickle bytes petastorm's `get_schema` unpickles into a live
    * `Unischema`. Pure ASCII (spec-asserted). */
  def pickle(schema: GraftSchema): Array[Byte] = {
    val w = new W
    bareInstance(w, "petastorm.unischema", "Unischema")
    w.mark().str("_name").str(schema.name)
      .str("_fields").mark()
    schema.fields.foreach { f =>
      w.str(f.name)
      writeField(w, f)
    }
    w.dict()
    // the per-field access-sugar attributes Unischema.__init__ sets
    // (schema.<fieldname>); duplicated objects, which is fine —
    // petastorm compares fields by name/value, never identity
    schema.fields.foreach { f =>
      w.str(f.name)
      writeField(w, f)
    }
    w.dict().build().stop()
    w.bytes
  }
}
