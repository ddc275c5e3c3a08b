package graft.codecs

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003) — the rolling-hash fingerprint family the reference
  * era's dedup pipelines use for robust copy detection: hash every
  * character k-gram, slide a window of `w` consecutive gram hashes,
  * keep each window's MINIMUM; the selected set is position-robust
  * (insertions/deletions far from a region don't change its
  * fingerprints, unlike one whole-document hash) with a guaranteed
  * match on any shared substring of length ≥ w + k − 1.
  *
  * Gram hash: first 8 hex chars of md5(gram) as uint32 — the same
  * md5 hash family as the MinHash signatures, exactly reproducible
  * in the SQL oracle. Texts shorter than k contribute one whole-text
  * gram; fewer than w grams → one window over all of them. The
  * sliding minimum is a monotonic deque (O(n) total, one pass), the
  * output is the SORTED DISTINCT selected hashes.
  */
object Winnow {

  private def uint32(b: Array[Byte]): Long =
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)

  /** Fingerprint set of `text` (already case-normalized by the
    * caller) with gram size `k`, window `w`: sorted distinct longs.
    * Grams are CODEPOINT windows, not UTF-16 code units — SQL
    * engines' substr/length count characters, and a surrogate pair
    * split down the middle would make the oracle's gram set diverge
    * on any supplementary-plane character. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val md = MessageDigest.getInstance("MD5")
    val gramCount = if (n <= k) 1 else n - k + 1
    val hs = new Array[Long](gramCount)
    var i = 0
    while (i < gramCount) {
      val g = if (n <= k) s else new String(cps, i, k)
      md.reset()
      hs(i) = uint32(md.digest(g.getBytes("UTF-8")))
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (gramCount <= w) {
      var m = hs(0)
      var j = 1
      while (j < gramCount) { if (hs(j) < m) m = hs(j); j += 1 }
      selected.add(m)
    } else {
      // monotonic deque of indices: head = min of current window
      val deque = new Array[Int](gramCount)
      var head = 0
      var tail = 0 // exclusive
      var j = 0
      while (j < gramCount) {
        while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
        deque(tail) = j; tail += 1
        if (deque(head) <= j - w) head += 1
        if (j >= w - 1) selected.add(hs(deque(head)))
        j += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_fingerprints(text, k, w)` → sorted distinct array<long>. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1 (got $k, $w)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Winnow.fingerprints(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.Winnow.fingerprints($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}
