package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles from a token array — one pass, no
  * interpreted lambdas (the HOF spelling ran transform+concat_ws per
  * token, interpreted, three times per near-dup pipeline). Semantics
  * identical to the relational form and the DuckDB oracle: space-
  * joined n-token windows, first-occurrence-distinct; docs shorter
  * than n tokens collapse to one whole-text shingle. */
object Shingles {
  def shingle(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (cnt < n) {
      val sb = new StringBuilder
      var i = 0
      while (i < cnt) {
        if (i > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
        i += 1
      }
      out.add(UTF8String.fromString(sb.toString))
    } else {
      var i = 0
      while (i <= cnt - n) {
        val sb = new StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + k).toString)
          k += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Hashed n-gram feature counts — the DSIR/fastText feature map
  * (Xie et al. 2023 use hashed n-grams into a fixed bucket count).
  * Each n-token window (WITH multiplicity — unlike [[Shingles]];
  * docs shorter than n collapse to one whole-text gram) buckets by
  * the first 8 md5 hex digits of the space-joined gram, modulo
  * `buckets` — exactly `('0x' || substr(md5(g),1,8))::BIGINT % B`
  * in the SQL oracle. One pass, output bounded by `buckets`: the
  * corpus never materializes gram strings into an exchange. */
object HashedGrams {
  def counts(toks: ArrayData, n: Int, buckets: Int): ArrayData = {
    val out = new Array[Long](buckets)
    val cnt = toks.numElements()
    def bucketOf(s: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      // first 8 hex digits = bytes 0-3 as unsigned 32-bit
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      (v % buckets).toInt
    }
    if (cnt < n) {
      val sb = new StringBuilder
      var i = 0
      while (i < cnt) {
        if (i > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
        i += 1
      }
      out(bucketOf(sb.toString)) += 1L
    } else {
      var i = 0
      while (i <= cnt - n) {
        val sb = new StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + k).toString)
          k += 1
        }
        out(bucketOf(sb.toString)) += 1L
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `hashed_gram_counts(toks, n, buckets)` → array<long> bucket
  * histogram of the doc's n-grams (see [[HashedGrams]]). */
case class HashedGramCounts(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram n $n")
  require(buckets >= 1, s"bucket count $buckets")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashedGrams.counts(v.asInstanceOf[ArrayData], n, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.HashedGrams.counts($c, $n, $buckets);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "hashed_gram_counts"
}

/** `shingles(toks, n)` → array<string> of distinct n-gram shingles. */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle n $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Shingles.shingle(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.Shingles.shingle($c, $n);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingles"
}
