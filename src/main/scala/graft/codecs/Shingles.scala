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
