package graft.codecs

import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** The `.npz` cell container petastorm's `CompressedNdarrayCodec`
  * writes and reads (reference behavior anchor: codecs.py:174-212 —
  * `encode` is `np.savez_compressed(memfile, arr=value)`, `decode`
  * is `np.load(memfile)['arr']`). `np.savez_compressed` is not a
  * bespoke format: it is a standard ZIP archive (python stdlib
  * `zipfile`, `ZIP_DEFLATED`) holding exactly one entry named
  * `arr.npy` whose content is the plain `.npy` serialization — so
  * the JVM's `java.util.zip` reads and writes it natively and the
  * tensor payload composes with [[NpyCodec]]/[[NpyEncode]].
  *
  * [[wrap]] output is deterministic for a given JVM: the entry
  * timestamp is pinned to the DOS epoch (1980-01-01, the earliest
  * zip-representable instant; an unpinned `ZipEntry` stamps wall
  * clock, making byte-level repeatability impossible), no extra
  * fields, default deflate level. Oracles never re-derive compressed
  * bytes — correctness contracts go through decode (exactly like the
  * reference, whose zlib output also varies by build).
  *
  * [[unwrap]] accepts any zipfile-written member layout (seekable
  * writes without data descriptors, as `np.savez` emits, AND
  * streamed entries with bit-3 data descriptors) because
  * `ZipInputStream` handles both. It fails fast on non-zip bytes
  * and on archives with no `.npy` member — adversarial cells error,
  * they never decode to garbage (same contract as
  * [[NpyCodec.parseHeader]]).
  *
  * Scale shape: both kernels are codegen-callable static methods
  * (one pass over the cell bytes, no UDF, no driver involvement) —
  * the decode stays inside whole-stage codegen next to the `npy_*`
  * family.
  */
object NpzCodec {

  /** `np.savez_compressed`'s member name for the reference codec's
    * single array (codecs.py:193: `np.savez_compressed(memfile,
    * arr=value)` → member `arr.npy`). */
  val EntryName = "arr.npy"

  // DOS epoch: zip timestamps can't represent anything earlier, and
  // java.util.zip rejects pre-1980 times on some platforms — pin to
  // the floor for deterministic bytes.
  private val DosEpochMillis: Long = {
    val c = java.util.Calendar.getInstance()
    c.clear()
    c.set(1980, java.util.Calendar.JANUARY, 1, 0, 0, 0)
    c.getTimeInMillis
  }

  /** npy bytes → npz (zip/deflate) cell, petastorm-decodable. */
  def wrap(npy: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(npy.length / 2 + 64)
    val zos = new ZipOutputStream(bos)
    try {
      val e = new ZipEntry(EntryName)
      e.setTime(DosEpochMillis)
      zos.putNextEntry(e)
      zos.write(npy)
      zos.closeEntry()
    } finally zos.close()
    bos.toByteArray
  }

  /** npz cell → the contained npy bytes. Takes the `arr.npy` member
    * (or, for non-reference writers, the first `.npy` member). */
  def unwrap(npz: Array[Byte]): Array[Byte] = {
    require(npz.length >= 4 && npz(0) == 'P' && npz(1) == 'K',
      s"not an npz cell (no zip magic; ${npz.length} bytes)")
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(npz))
    try {
      var entry = zis.getNextEntry
      var fallback: Array[Byte] = null
      while (entry != null) {
        if (!entry.isDirectory && entry.getName.endsWith(".npy")) {
          val buf = new java.io.ByteArrayOutputStream(1024)
          val chunk = new Array[Byte](8192)
          var k = zis.read(chunk)
          while (k >= 0) { buf.write(chunk, 0, k); k = zis.read(chunk) }
          if (entry.getName == EntryName) return buf.toByteArray
          if (fallback == null) fallback = buf.toByteArray
        }
        entry = zis.getNextEntry
      }
      require(fallback != null, "npz cell has no .npy member")
      fallback
    } finally zis.close()
  }
}

/** `npz_wrap(npy_bin)` → binary `.npz` cell (zip/deflate container,
  * petastorm CompressedNdarrayCodec-decodable). */
case class NpzWrap(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    NpzCodec.wrap(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpzCodec.wrap($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npz_wrap"
}

/** `npz_unwrap(npz_bin)` → the contained `.npy` bytes. */
case class NpzUnwrap(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    NpzCodec.unwrap(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.NpzCodec.unwrap($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "npz_unwrap"
}
