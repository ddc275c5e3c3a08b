package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer kernels for exact rank-correlation counting
  * ([[graft.ops.Stats.kendallStats]]): inversion counting by
  * mergesort and sorted-merge pair counting — the two O(n log n) /
  * O(n) primitives that turn the quadratic pair definition of
  * Kendall's tau into a distributed count. Both are codegen-callable
  * static methods over primitive long arrays (no boxing, no UDF) and
  * are deterministic pure functions of their inputs — the counts are
  * partition-layout-invariant, so the enclosing operator's output
  * never depends on how Spark split the data. */
object RankMath {

  /** Pairs i < j with a(i) > a(j) — classic bottom-up mergesort
    * inversion count, O(n log n), O(n) scratch. */
  def inversions(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    var a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = arr.getLong(i); i += 1 }
    var buf = new Array[Long](n)
    var count = 0L
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        // merge a[lo,mid) and a[mid,hi) into buf[lo,hi); every time
        // a right element wins, it jumps the (mid - l) left leftovers
        var l = lo; var r = mid; var o = lo
        while (l < mid && r < hi) {
          if (a(l) <= a(r)) { buf(o) = a(l); l += 1 }
          else { buf(o) = a(r); r += 1; count += (mid - l) }
          o += 1
        }
        while (l < mid) { buf(o) = a(l); l += 1; o += 1 }
        while (r < hi) { buf(o) = a(r); r += 1; o += 1 }
        lo += 2 * width
      }
      // the final lone block (no right sibling) was never written —
      // carry it into buf verbatim before the buffer swap
      var k = lo
      while (k < n) { buf(k) = a(k); k += 1 }
      val tmp = a; a = buf; buf = tmp
      width *= 2
    }
    count
  }

  /** Pairs (x ∈ a, y ∈ b) with x > y. BOTH arrays must be ascending-
    * sorted; two-pointer merge, O(|a| + |b|). */
  def mergeGreater(aArr: ArrayData, bArr: ArrayData): Long = {
    val na = aArr.numElements()
    val nb = bArr.numElements()
    var count = 0L
    var i = 0
    var j = 0
    while (j < nb) {
      val y = bArr.getLong(j)
      while (i < na && aArr.getLong(i) <= y) i += 1
      count += (na - i)
      j += 1
    }
    count
  }
}

/** `seq_inversions(array<long>)` → pairs i<j with a(i) > a(j). */
case class SeqInversions(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    RankMath.inversions(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.RankMath.inversions($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "seq_inversions"
}

/** `sorted_merge_greater(a, b)` → pairs (x∈a, y∈b) with x > y;
  * both arrays ascending-sorted. */
case class SortedMergeGreater(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    RankMath.mergeGreater(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.codecs.RankMath.mergeGreater($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_merge_greater"
}
