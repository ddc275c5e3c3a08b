package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-token-budget document chunking with overlap — the standard
  * pre-tokenization split for context-window-bounded training and
  * embedding pipelines (long documents become overlapping windows of
  * at most `chunkSize` tokens, stride `chunkSize - overlap`).
  *
  * Scale shape: pure scan work — tokenize once, `sequence`+`explode`
  * the chunk start positions, slice the token array per chunk. No
  * shuffle at all; the output multiplier is ~1/stride chunks per
  * token, known up front. The token array materializes once per row
  * behind the projection boundary (the [[TextAnalysis]] rule), so a
  * 100-chunk document tokenizes once, not 100 times. Tokenization is
  * [[TextAnalysis.alphaTokens]] — the same deterministic lowercase
  * alphanumeric stream the dedup/shingle family uses, reproducible
  * in any engine.
  *
  * Output: one row per chunk — (idCol, chunk_idx, n_tokens,
  * chunk_text) with `chunk_idx` dense from 0 in document order and
  * `chunk_text` the space-joined token slice. Documents with zero
  * tokens emit no chunks. The final chunk may be shorter than
  * `chunkSize` (the tail); a tail consisting only of already-seen
  * overlap tokens is still emitted when its start position is a
  * stride multiple inside the document — chunk boundaries are a pure
  * function of token count, so readers can compute them without
  * scanning.
  */
object Chunk {

  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0, unicode: Boolean = false): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive (got $chunkSize)")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap ($overlap) must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    df.select(col(idCol),
        TextAnalysis.alphaTokens(col(textCol), unicode).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("int").as("chunk_idx"),
        size(slice(col("__t"), col("__s") + 1, lit(chunkSize))).as("n_tokens"),
        concat_ws(" ", slice(col("__t"), col("__s") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Content-defined chunking (the rsync/LBFS trick, Muthitacharoen
    * et al. 2001): chunk boundaries fall where a rolling hash over
    * the last `window` code points hits 0 mod `divisor` — a pure
    * function of LOCAL content, so an insertion near a document's
    * head shifts every byte offset yet leaves every later boundary
    * (and hence every later chunk identity) unchanged. That is what
    * makes chunk-hash dedup robust to edits/shifts where fixed-size
    * blocks lose alignment — the storage/near-identical-file dedup
    * complement to the token-shingle family.
    *
    * One row per chunk: (idCol, chunk_idx, chunk) with `chunk_idx`
    * dense from 0 in document order. Pure scan work — the codegen'd
    * kernel ([[CdcChunks]]) emits each doc's chunk array in one
    * code-point pass, no shuffle; expected chunk length is
    * `divisor` chars (callers md5+groupBy the chunks for the dedup
    * exchange, keyed on content). The hash is the positional
    * polynomial Σ code·B^k mod (1e9+7), replayable in SQL — the
    * oracle recomputes every boundary from the same constants. */
  def contentDefined(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame =
    df.select(col(idCol),
        posexplode(cdcChunks(col(textCol), window, divisor))
          .as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))

  /** The chunk array itself — see [[contentDefined]]. */
  def cdcChunks(text: org.apache.spark.sql.Column, window: Int,
      divisor: Int): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.column(CdcChunks(
      graft.functions.GraftFunctions.expr(text), window, divisor))
}

/** `cdc_chunks(text)` → array<string>: split at content-defined
  * boundaries. Boundary after 1-based code-point position i when
  * i >= window and  H_i = Σ_{k=0..window-1} cp(i-window+1+k) ·
  * B^(window-1-k) mod M  satisfies H_i mod divisor == 0, with
  * B = 257, M = 1e9+7 — maintained incrementally (add head, drop
  * tail·B^window) in one pass. Code POINTS, not UTF-16 units, so
  * positions and `cp` match engines that index by character. */
case class CdcChunks(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    window: Int, divisor: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  require(window >= 2 && window <= 256,
    s"window must sit in [2, 256], got $window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val M = 1000000007L
  private val B = 257L
  // B^window mod M, for the drop-tail term
  private val bw: Long = {
    var r = 1L; var i = 0
    while (i < window) { r = r * B % M; i += 1 }
    r
  }

  def compute(in: UTF8String): ArrayData = {
    val s = in.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cur = new java.lang.StringBuilder
    var h = 0L
    var i = 0
    while (i < n) {
      val c = cps(i)
      cur.appendCodePoint(c)
      h = (h * B + c) % M
      if (i >= window) {
        // drop the code point that just left the window
        h = Math.floorMod(h - cps(i - window) % M * bw % M, M)
      }
      if (i + 1 >= window && h % divisor == 0L) {
        out += UTF8String.fromString(cur.toString)
        cur.setLength(0)
      }
      i += 1
    }
    if (cur.length > 0) out += UTF8String.fromString(cur.toString)
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcChunks", this,
      classOf[CdcChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = c)
  override def prettyName: String = "cdc_chunks"
}
