package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * memory-compression scale path of the ANN family: a `dim`-float
  * vector becomes `m` small codebook indices (one byte each at
  * `ksub ≤ 256`), so a 100 TB float corpus scans as ~`m/(4·dim)`
  * of its size, and query scoring is `m` table lookups per
  * candidate instead of `dim` multiplies (ADC — asymmetric distance
  * computation: the QUERY stays exact, only the corpus side is
  * quantized).
  *
  * All three kernels accumulate in ELEMENT ORDER with double
  * arithmetic — the [[VectorMath]] determinism contract — so a SQL
  * engine replays every distance bit-for-bit. Codebooks are baked
  * into the expressions as reference objects (bounded by the
  * codebooks-small contract: `m · ksub · dsub` doubles), exactly
  * like [[ArgMaxCosM]]'s centroid matrix. */
object PqMath {
  /** Squared L2 between `a[off .. off+dsub)` and `entry`,
    * accumulated in element order. */
  def subDist(a: ArrayData, off: Int, entry: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < entry.length) {
      val diff = a.getDouble(off + d) - entry(d)
      s += diff * diff
      d += 1
    }
    s
  }

  def checkDim(codebooks: Array[Array[Array[Double]]]): Int = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty,
      "pq: empty codebooks")
    val dsub = codebooks.head.head.length
    require(codebooks.forall(cb => cb.length == codebooks.head.length &&
        cb.forall(_.length == dsub)),
      "pq: ragged codebooks (every subspace needs the same entry " +
        "count, every entry the same sub-dimension)")
    codebooks.length * dsub
  }
}

/** `pq_encode(emb)` → `array<int>` of `m` codebook indices: for each
  * subspace, the index of the L2-nearest codebook entry (ties →
  * smallest index — first-occurrence argmin, the [[ArgMaxCosM]]
  * tie convention). Pure projection: zero shuffles, scan speed. */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  @transient private lazy val dim = PqMath.checkDim(codebooks)
  @transient private lazy val dsub = codebooks.head.head.length

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  def compute(a: ArrayData): UnsafeArrayData = {
    require(a.numElements() == dim,
      s"pq_encode: dim mismatch ${a.numElements()} vs $dim")
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val d = PqMath.subDist(a, s * dsub, cb(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** `pq_dist_table(qemb)` → `array<double>` of `m·ksub` squared
  * sub-distances, laid out `[s·ksub + j]` — the per-query ADC table,
  * computed ONCE per query row and broadcast with it. */
case class PqDistTable(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  @transient private lazy val dim = PqMath.checkDim(codebooks)
  @transient private lazy val dsub = codebooks.head.head.length

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  def compute(a: ArrayData): UnsafeArrayData = {
    require(a.numElements() == dim,
      s"pq_dist_table: dim mismatch ${a.numElements()} vs $dim")
    val m = codebooks.length
    val ksub = codebooks.head.length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var j = 0
      while (j < ksub) {
        out(s * ksub + j) = PqMath.subDist(a, s * dsub, cb(j))
        j += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDistTable", this,
      classOf[PqDistTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pq_dist_table"
}

/** `pq_adc(codes, table)` → double: `Σ_s table[s·ksub + codes[s]]`,
  * subspaces accumulated in order — the O(m)-per-candidate ADC
  * lookup sum that replaces the O(dim) exact distance in the coarse
  * scan. By construction it equals the direct squared L2 between
  * the query and the candidate's RECONSTRUCTION (the concatenated
  * codebook entries), summed subspace-major — the property the spec
  * cross-checks. */
case class PqAdcLookup(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub >= 1, s"pq_adc: ksub must be >= 1 (got $ksub)")

  override def dataType: DataType = DoubleType

  def compute(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    require(table.numElements() == m * ksub,
      s"pq_adc: table length ${table.numElements()} != m*ksub = " +
        s"${m * ksub}")
    var s = 0
    var acc = 0.0
    while (s < m) {
      val j = codes.getInt(s)
      require(j >= 0 && j < ksub, s"pq_adc: code $j out of [0,$ksub)")
      acc += table.getDouble(s * ksub + j)
      s += 1
    }
    acc
  }

  override def nullSafeEval(c: Any, t: Any): Any =
    compute(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcLookup].getName)
    nullSafeCodeGen(ctx, ev, (c, t) => s"${ev.value} = $ref.compute($c, $t);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
