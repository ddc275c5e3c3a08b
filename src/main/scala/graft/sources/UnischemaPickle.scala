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
  * Scope: scalar/ndarray/compressed_ndarray/png/jpeg codecs and
  * codec-less columns over the numpy-mappable Spark types below.
  * `compressed_ndarray` serializes to the reference's
  * CompressedNdarrayCodec with cells written as genuine
  * `np.savez_compressed` zip containers ([[graft.codecs.NpzCodec]]
  * — codecs.py:188-199), so unmodified petastorm decodes them. */
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
    // both our GRT1-compressed spec name and the parse-side npz name
    // serialize to the reference's CompressedNdarrayCodec — the
    // cells themselves are written as np.savez_compressed containers
    // (NpzCodec.wrap) by materializePetastorm, which its decode
    // (np.load(memfile)['arr'], codecs.py:197-199) opens directly
    case Some(CodecSpec("compressed_ndarray" | "npy_compressed", _)) =>
      bareInstance(w, "petastorm.codecs", "CompressedNdarrayCodec")
    case Some(CodecSpec(fmt @ ("png" | "jpeg"), args)) =>
      bareInstance(w, "petastorm.codecs", "CompressedImageCodec")
      w.mark().str("_image_codec").str("." + fmt)
        .str("_quality")
        .int(args.getOrElse("quality", "80").toLong)
        .dict().build()
    case Some(CodecSpec(other, _)) =>
      throw new IllegalArgumentException(
        s"codec '$other' has no petastorm-compatible serialization")
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

  // ------------------------------------------------------------------
  // READ side: any petastorm store's pickled Unischema → GraftSchema
  // ------------------------------------------------------------------

  import PickleReader._

  /** numpy dtype name → widened Spark logical type (the Unischema
    * convention our FieldSpec carries: unsigned widens to the next
    * signed type, unischema.py numpy→spark mapping). */
  private def sparkTypeOf(numpy: String): org.apache.spark.sql.types.DataType =
    numpy match {
      case "int8" => ByteType
      case "int16" | "uint8" => ShortType
      case "int32" | "uint16" => IntegerType
      case "int64" | "uint32" | "uint64" => LongType
      case "float32" | "float16" => FloatType
      case "float64" => DoubleType
      case "bool_" | "bool" => BooleanType
      case "str_" | "unicode_" | "unicode" | "str" => StringType
      case "bytes_" | "string_" | "bytes" => BinaryType
      case other => throw new IllegalArgumentException(
        s"unsupported numpy dtype in Unischema: $other")
    }

  private def dtypeName(p: Py): String = p match {
    case PyGlobal("numpy", n) => n
    case o: PyObject if o.cls.name == "dtype" =>
      // np.dtype('f4')-style: first arg is the descr string
      o.args.headOption match {
        case Some(PyString(d)) => d.dropWhile("<>|=".contains(_)) match {
          case "i1" => "int8"
          case "i2" => "int16"
          case "i4" => "int32"
          case "i8" => "int64"
          case "u1" => "uint8"
          case "u2" => "uint16"
          case "u4" => "uint32"
          case "u8" => "uint64"
          case "f4" => "float32"
          case "f8" => "float64"
          case "b1" => "bool_"
          case d2 => throw new IllegalArgumentException(
            s"unsupported np.dtype descr $d2")
        }
        case o2 => throw new IllegalArgumentException(
          s"np.dtype with non-string arg $o2")
      }
    case o => throw new IllegalArgumentException(
      s"field dtype is not a numpy type: $o")
  }

  private def codecSpec(p: Py): Option[CodecSpec] = p match {
    case PyNone => None
    case o: PyObject => o.cls.name match {
      case "ScalarCodec" => Some(CodecSpec("scalar"))
      // cells are np.save-format in a petastorm store — decoded by
      // the npy family, NOT our GRT1 tensor codec
      case "NdarrayCodec" => Some(CodecSpec("npy"))
      case "CompressedNdarrayCodec" => Some(CodecSpec("npy_compressed"))
      case "CompressedImageCodec" =>
        val fmt = o.attr("_image_codec") match {
          case Some(PyString(s)) => s.stripPrefix(".")
          case _ => "png"
        }
        val q = o.attr("_quality") match {
          case Some(PyLong(v)) => v.toString
          case _ => "80"
        }
        Some(CodecSpec(fmt, Map("quality" -> q)))
      case other => throw new IllegalArgumentException(
        s"unknown petastorm codec class $other")
    }
    case o => throw new IllegalArgumentException(s"codec field is $o")
  }

  /** Parse a pickled petastorm `Unischema` (any protocol CPython
    * emits, 0-5) into a [[GraftSchema]]. Nothing is executed — see
    * [[PickleReader]]. NdarrayCodec fields map to the `npy` codec
    * (np.save cells); CompressedNdarrayCodec to `npy_compressed`
    * (decoded as raw bytes — its pyarrow container has no JVM
    * decoder here). */
  def parse(bytes: Array[Byte]): GraftSchema = {
    val root = PickleReader.loads(bytes) match {
      case o: PyObject if o.cls.name == "Unischema" => o
      case o => throw new IllegalArgumentException(
        s"not a pickled Unischema: $o")
    }
    val name = root.attr("_name") match {
      case Some(PyString(s)) => s
      case o => throw new IllegalArgumentException(s"Unischema _name: $o")
    }
    val fieldDict = root.attr("_fields") match {
      case Some(d: PyDict) => d
      case o => throw new IllegalArgumentException(s"Unischema _fields: $o")
    }
    def pysparkToSpark(st: PyObject): org.apache.spark.sql.types.DataType =
      st.cls.name match {
        case "ByteType" => ByteType
        case "ShortType" => ShortType
        case "IntegerType" => IntegerType
        case "LongType" => LongType
        case "FloatType" => FloatType
        case "DoubleType" => DoubleType
        case "BooleanType" => BooleanType
        case "StringType" => StringType
        case "BinaryType" => BinaryType
        case "DateType" => org.apache.spark.sql.types.DateType
        case "TimestampType" => org.apache.spark.sql.types.TimestampType
        case "DecimalType" =>
          val p = st.attr("precision") match {
            case Some(PyLong(v)) => v.toInt; case _ => 10 }
          val s = st.attr("scale") match {
            case Some(PyLong(v)) => v.toInt; case _ => 0 }
          org.apache.spark.sql.types.DecimalType(p, s)
        case other => throw new IllegalArgumentException(
          s"unsupported pyspark type $other")
      }
    val fields = fieldDict.m.values.map {
      case f: PyObject if f.cls.name == "UnischemaField" =>
        require(f.args.length == 5,
          s"UnischemaField arity ${f.args.length}")
        val fname = f.args(0) match {
          case PyString(s) => s
          case o => throw new IllegalArgumentException(s"field name: $o")
        }
        // dtype from the numpy type; fields whose dtype is not a
        // numpy scalar (Decimal, date, timestamp) carry their truth
        // in the ScalarCodec's pyspark type — use that
        val dt = try sparkTypeOf(dtypeName(f.args(1))) catch {
          case e: IllegalArgumentException => f.args(3) match {
            case c: PyObject if c.cls.name == "ScalarCodec" =>
              c.attr("_spark_type") match {
                case Some(st: PyObject) => pysparkToSpark(st)
                case _ => throw e
              }
            case _ => throw e
          }
        }
        val shape = f.args(2) match {
          case PyTuple(items) => items.map {
            case PyLong(v) => v.toInt
            case PyNone => -1
            case o => throw new IllegalArgumentException(s"shape dim: $o")
          }
          case o => throw new IllegalArgumentException(s"field shape: $o")
        }
        val nullable = f.args(4) match {
          case PyBool(b) => b
          case PyLong(v) => v != 0
          case o => throw new IllegalArgumentException(s"nullable: $o")
        }
        FieldSpec(fname, dt, shape, codecSpec(f.args(3)), nullable)
      case o => throw new IllegalArgumentException(s"field entry: $o")
    }.toSeq
    GraftSchema(name, fields)
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
