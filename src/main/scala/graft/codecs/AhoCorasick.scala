package graft.codecs

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring counting (Aho & Corasick
  * 1975) — ONE pass over the text counts every dictionary keyword,
  * versus the contains-join's one `instr` + one `replace` scan PER
  * keyword ([[graft.ops.TextAnalysis.tagKeywords]], q173). At a
  * 10k-phrase PII/topic dictionary that's the difference between
  * O(text) and O(text·dict): the automaton's throughput is
  * independent of dictionary size, which is what makes dictionary
  * tagging viable at 100 TB with real-world lexicons.
  *
  * Count semantics are EXACTLY the replace-count convention the
  * contains-join uses (and any SQL engine reproduces): per keyword,
  * non-overlapping occurrences accepted greedily left-to-right —
  * "aa" occurs twice in "aaaa", not three times. Matching is raw
  * char equality (case folding is the CALLER's move: pass
  * `lower(text)` and lowercased keywords), so the kernel stays
  * byte-honest with `instr`/`replace`.
  *
  * The automaton builds once per executor from the expression's
  * keyword list (`@transient lazy` + codegen reference-object — the
  * ApplyBpe pattern) and is shared by every row the task touches.
  * ASCII transitions ride a dense 128-slot table; other chars take
  * the HashMap overflow path.
  *
  * Measured (AhoCorasickSpec, local[4], 2000 docs × 100 words, 200
  * keywords): 1.4× over the contains-join end-to-end — at that size
  * the fixed per-query costs still dominate; the automaton's scan
  * cost is flat in dictionary size while the contains-join's grows
  * linearly, so the gap widens with every keyword added.
  */
object AhoCorasick {

  final class Automaton(patterns: Array[String]) {
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val n: Int = patterns.length
    private val patLen: Array[Int] = patterns.map(_.length)

    // trie storage (grown during build, frozen after)
    private val ascii = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    private val ext =
      scala.collection.mutable.ArrayBuffer[java.util.HashMap[Character, Integer]]()
    private val fail = scala.collection.mutable.ArrayBuffer[Int]()
    // pattern indexes ending exactly at this node (dupes allowed)
    private val ends = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    // nearest proper-suffix node that ends a pattern (0 = none)
    private val dict = scala.collection.mutable.ArrayBuffer[Int]()

    private def newNode(): Int = {
      ascii += Array.fill(128)(-1)
      ext += null
      fail += 0
      ends += null
      dict += 0
      ascii.length - 1
    }

    private def childOf(s: Int, c: Char): Int =
      if (c < 128) ascii(s)(c)
      else {
        val m = ext(s)
        if (m == null) -1
        else { val v = m.get(Character.valueOf(c)); if (v == null) -1 else v.intValue() }
      }

    private def setChild(s: Int, c: Char, t: Int): Unit =
      if (c < 128) ascii(s)(c) = t
      else {
        if (ext(s) == null) ext(s) = new java.util.HashMap[Character, Integer]()
        ext(s).put(Character.valueOf(c), Integer.valueOf(t))
      }

    // ---- build ----
    newNode() // root = 0
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        var t = childOf(s, c)
        if (t < 0) { t = newNode(); setChild(s, c, t) }
        s = t
        i += 1
      }
      ends(s) = if (ends(s) == null) Array(pi) else ends(s) :+ pi
    }
    // BFS fail + dict links
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      def childrenOf(s: Int): Iterator[(Char, Int)] = {
        val a = ascii(s).iterator.zipWithIndex
          .filter(_._1 >= 0).map { case (t, c) => (c.toChar, t) }
        val e =
          if (ext(s) == null) Iterator.empty
          else scala.jdk.CollectionConverters
            .MapHasAsScala(ext(s)).asScala.iterator
            .map { case (c, t) => (c.charValue(), t.intValue()) }
        a ++ e
      }
      childrenOf(0).foreach { case (_, t) =>
        fail(t) = 0; queue.add(t)
      }
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        dict(s) = if (ends(fail(s)) != null) fail(s) else dict(fail(s))
        childrenOf(s).foreach { case (c, t) =>
          var f = fail(s)
          var ft = childOf(f, c)
          while (ft < 0 && f != 0) { f = fail(f); ft = childOf(f, c) }
          fail(t) = if (ft >= 0 && ft != t) ft else 0
          queue.add(t)
        }
      }
    }

    /** Non-overlapping greedy count per pattern (the replace-count
      * convention). One pass; emission cost proportional to matches
      * via the dict-link chain. */
    def counts(text: String): Array[Long] = {
      val out = new Array[Long](n)
      val lastEnd = Array.fill(n)(-1)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var t = childOf(s, c)
        while (t < 0 && s != 0) { s = fail(s); t = childOf(s, c) }
        s = if (t >= 0) t else 0
        var e = if (ends(s) != null) s else dict(s)
        while (e != 0) {
          val es = ends(e)
          var k = 0
          while (k < es.length) {
            val pi = es(k)
            val start = i - patLen(pi) + 1
            if (start > lastEnd(pi)) { out(pi) += 1L; lastEnd(pi) = i }
            k += 1
          }
          e = dict(e)
        }
        i += 1
      }
      out
    }
  }
}

/** `graft_ac_counts(text, 'kw,kw,…')` → array<long>: occurrence
  * count of each keyword (list order), replace-count semantics.
  * See [[AhoCorasick]]. */
case class AcMatchCounts(child: Expression, keywords: Seq[String])
    extends UnaryExpression {
  require(keywords.nonEmpty, "AcMatchCounts needs keywords")
  require(keywords.forall(_.nonEmpty), "empty keyword")

  @transient private lazy val auto =
    new AhoCorasick.Automaton(keywords.toArray)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  def compute(t: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(auto.counts(t.toString))

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("acCounts", this, classOf[AcMatchCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
  override def prettyName: String = "ac_counts"
}
