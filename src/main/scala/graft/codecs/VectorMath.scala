package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels as codegen'd expressions. The HOF spelling
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is interpreted — per
  * element it allocates and walks lambda variables; at embedding
  * dims×corpus scale that is the difference between scan-speed and
  * 100× slower. The arithmetic contract is identical to the HOF
  * form and to the SQL oracle: accumulate in ELEMENT ORDER with a
  * 0.0 seed, every product/sum in double — bit-for-bit reproducible
  * on any engine. */
object VectorMath {

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** One-pass 32-bit simhash from an array of token hashes: per bit,
    * votes = 2·popcount_of_bit − n; bit set iff votes > 0. */
  def simhash32(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      // sum of ±1 = 2*ones - n; positive iff 2*ones > n
      if (2 * counts(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** One-pass max-abs int8 quantization: scale = 127/max|x| (0 for
    * the zero vector), q_i = floor(x_i·scale + 0.5) ∈ [-127, 127].
    * Every step (float→double widen, abs, compare, multiply, floor)
    * is exact IEEE double — the oracle recomputes it bit-identically.
    */
  def quantizeInt8(a: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    def at(i: Int): Double =
      if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(at(i)); if (v > m) m = v; i += 1
    }
    val s = if (m == 0.0) 0.0 else 127.0 / m
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(at(i) * s + 0.5).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(out)))
  }

  /** Integer dot of two int8 vectors (exact, no overflow below ~2^46
    * elements). The rescale `dot8 / (scale_a·scale_b)` approximates
    * the float dot within `(‖a‖₁ + ‖b‖₁ + 0.5/s) · 0.5/s`. */
  def dotI8(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dotI8: length mismatch ${n} vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    s
  }

  /** Wrapping sum of an array<long> (empty → 0). */
  def sumLong(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i); i += 1 }
    s
  }
}

/** `simhash32(hashes)` → long: bit j of the result is set iff the
  * sum over the array of ±1 (sign of bit j of each 32-bit token
  * hash) is positive — one pass over the array for all 32 bits
  * (the per-bit HOF spelling walks the array 32×, interpreted).
  * Pure integer arithmetic: identical in any engine. */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorMath.simhash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.VectorMath.simhash32($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash32"
}

/** `array_sum_long(arr)` → long: one codegen pass, no intermediate —
  * the tight-loop spelling of `aggregate(arr, 0L, (a, x) -> a + x)`,
  * which Spark evaluates as an interpreted higher-order function (a
  * lambda call per element — the r7 hot-path flag on q88). Null
  * array → null; elements are non-null by the producing expressions'
  * contract (containsNull = false). */
case class ArraySumLong(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorMath.sumLong(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.codecs.VectorMath.sumLong($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "array_sum_long"
}

/** `argmax_cos_m(emb)` over a FIXED centroid matrix baked into the
  * expression: the index (in matrix order) of the centroid with the
  * highest micro-floored cosine to the input vector, ties to the
  * LOWEST index. One pass over k×dim per row, no join, no shuffle —
  * the scale shape for IVF hard assignment (the relational spelling
  * cross-joins the corpus with the centroid set and re-aggregates,
  * moving every embedding through an exchange). Arithmetic contract
  * identical to `floor(cosine(c, e)·1e6)` with dot/norm in
  * element-order doubles; NaN cosine (zero vector) maps to 0 like
  * Spark's double→long cast. */
case class ArgMaxCosM(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "argmax_cos_m needs at least one centroid")
  @transient private lazy val norms: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
  override def dataType: DataType = IntegerType

  def compute(a: ArrayData): Int = {
    val dim = a.numElements()
    var na = 0.0
    var i = 0
    while (i < dim) { val v = a.getDouble(i); na += v * v; i += 1 }
    na = math.sqrt(na)
    var best = 0
    var bestM = Long.MinValue
    var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      require(c.length == dim,
        s"argmax_cos_m: dim mismatch ${c.length} vs $dim")
      var d = 0.0
      var j = 0
      while (j < dim) { d += c(j) * a.getDouble(j); j += 1 }
      val m = math.floor(d / (norms(ci) * na) * 1000000.0)
      val mL = if (java.lang.Double.isNaN(m)) 0L else m.toLong
      if (mL > bestM) { bestM = mL; best = ci }
      ci += 1
    }
    best
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argmaxCosM", this, classOf[ArgMaxCosM].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "argmax_cos_m"
}

/** `quantize_int8(vec)` → struct<scale: double, q: array<tinyint>>:
  * max-abs int8 quantization of a float/double vector in one codegen
  * pass — 4× (float) / 8× (double) memory cut for ANN candidate
  * scans, with [[VectorMath.dotI8]] as the integer inner product and
  * exact-rescore on the surviving top-k. Zero vector → scale 0,
  * all-zero q (dequantize of an all-zero q is only meaningful when
  * scale > 0). */
case class QuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"quantize_int8 expects array<float|double>, got $other")
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    isFloat // force validation
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false),
      nullable = false)))

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow =
    VectorMath.quantizeInt8(a, isFloat)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this,
      classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "quantize_int8"
}

/** `dot_i8(a, b)` over two equal-length int8 arrays → long (exact
  * integer inner product — the quantized ANN scan kernel). */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"dot_i8 expects two array<tinyint>, got $l / $r")
    }
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.codecs.VectorMath.dotI8($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_i8"
}

/** `dot(a, b)` over two equal-length float or double arrays → double.
  * Mixed float/double operands are not supported (cast first). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val elemType: DataType = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => FloatType
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => DoubleType
    case (l, r) => throw new IllegalArgumentException(
      s"dot expects two array<float> or two array<double>, got $l / $r")
  }

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    elemType // force validation
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def method: String =
    if (elemType == FloatType) "dotF" else "dotD"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (elemType == FloatType)
      VectorMath.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorMath.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.codecs.VectorMath.$method($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot"
}

/** `floor_micros(vec)` → array<long>: element-wise
  * `floor(x·1e6)` over a float/double vector — the exact-integer
  * embedding space [[graft.ops.SemanticDedup.kmeansInt]] clusters
  * in (float→double widen then one double multiply and floor are
  * bit-identical cross-engine; long arithmetic after that is
  * order-free, so sums and means hash-match any engine). */
case class FloorMicros(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"floor_micros expects array<float|double>, got $other")
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    isFloat // force validation
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = math.floor(v * 1000000.0).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("floorMicros", this,
      classOf[FloorMicros].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "floor_micros"
}

/** `argmin_l2m(vm)` against a broadcast integer centroid table →
  * struct<cluster: int, dist: long>: exact squared-L2 in micros
  * space, ties to the LOWEST centroid index (strict `<`). One pass
  * over k×dim per row, no join, no shuffle — the hard-assignment
  * scale shape ([[ArgMaxCosM]] doctrine) for [[graft.ops
  * .SemanticDedup.kmeansInt]]. Fits long: dists ≤ dim·(Δmicros)²
  * — overflow needs |x| > ~3·10⁵ at dim 64, far past unit-norm
  * embeddings. */
case class ArgMinL2M(child: Expression, centroids: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "argmin_l2m needs at least one centroid")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"argmin_l2m expects array<bigint>, got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = a.numElements()
    var best = 0
    var bestD = Long.MaxValue
    var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      require(c.length == dim,
        s"argmin_l2m: dim mismatch ${c.length} vs $dim")
      var d = 0L
      var j = 0
      while (j < dim) {
        val t = a.getLong(j) - c(j); d += t * t; j += 1
      }
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestD))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argminL2M", this,
      classOf[ArgMinL2M].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "argmin_l2m"
}

/** `signed_project(vm)` against a broadcast ±1 sign matrix →
  * array<long>: the Achlioptas (2003) database-friendly
  * Johnson–Lindenstrauss projection `y_j = Σ_d s_{jd}·x_d`, exact
  * in integer micros space (longs commute — hash-reproducible on
  * any engine; |y| ≤ dim·1.5e6 ≪ 2⁶³). One k×dim pass per row, no
  * shuffle — shrink embeddings BEFORE the expensive ANN / dedup
  * exchanges. Sign derivation lives with the caller
  * ([[graft.ops.AnnSearch.jlProject]] uses md5 parity so the SQL
  * oracle rebuilds the identical matrix). */
case class SignedProject(child: Expression, signs: Array[Array[Byte]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(signs.nonEmpty, "signed_project needs at least one output dim")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"signed_project expects array<bigint>, got $other")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  def compute(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val out = new Array[Long](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      require(row.length == dim,
        s"signed_project: dim mismatch ${row.length} vs $dim")
      var s = 0L
      var d = 0
      while (d < dim) { s += row(d) * a.getLong(d); d += 1 }
      out(j) = s
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signedProject", this,
      classOf[SignedProject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "signed_project"
}

/** `ivf_rank_key(vec)` against a baked floor-micros-quantized QUERY
  * vector → long: the q316 integer rank key
  * `((dp + 2·den)·1e5) div den`, `den = max(1, ⌊√Σq²⌋·⌊√Σc²⌋)`,
  * computed in ONE codegen pass over the raw float/double embedding
  * (quantize + dot + norm fused — the HOF spelling walked the array
  * three times, interpreted, on the hot path of every ANN search).
  * Arithmetic contract identical to the driver-side
  * [[graft.sources.VectorIndex]] ranking and the SQL oracle:
  * element-order float→double widen, one double multiply + floor per
  * element, exact BIGINT accumulation after that. */
case class IvfRankKey(child: Expression, query: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(query.nonEmpty, "ivf_rank_key needs a non-empty query")
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"ivf_rank_key expects array<float|double>, got $other")
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    isFloat // force validation
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  @transient private lazy val qn: Long = {
    var s = 0L; var i = 0
    while (i < query.length) { s += query(i) * query(i); i += 1 }
    math.floor(math.sqrt(s.toDouble)).toLong
  }
  override def dataType: DataType = LongType

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    require(n == query.length,
      s"ivf_rank_key: dim mismatch ${query.length} vs $n")
    var dp = 0L; var cn2 = 0L; var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val c = math.floor(x * 1000000.0).toLong
      dp += query(i) * c; cn2 += c * c
      i += 1
    }
    val den = math.max(1L,
      qn * math.floor(math.sqrt(cn2.toDouble)).toLong)
    (dp + 2L * den) * 100000L / den
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfRankKey", this,
      classOf[IvfRankKey].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "ivf_rank_key"
}

/** `rank_key_pair(qv, cv)` over two floor-micros-quantized long
  * vectors → the same q316 integer rank key as [[IvfRankKey]], for
  * the BATCHED search shape where the query is a column, not a baked
  * literal ([[graft.sources.VectorIndex.searchMany]]'s probe ranking
  * and candidate rescore). One pass, exact BIGINT accumulation. */
case class RankKeyPair(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"rank_key_pair expects two array<bigint>, got $l / $r")
    }

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"rank_key_pair: dim mismatch $n vs ${b.numElements()}")
    var dp = 0L; var an2 = 0L; var bn2 = 0L; var i = 0
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      dp += x * y; an2 += x * x; bn2 += y * y
      i += 1
    }
    val den = math.max(1L,
      math.floor(math.sqrt(an2.toDouble)).toLong *
        math.floor(math.sqrt(bn2.toDouble)).toLong)
    (dp + 2L * den) * 100000L / den
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rankKeyPair", this,
      classOf[RankKeyPair].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "rank_key_pair"
}

/** `linear_score_long(counts)` against a broadcast long weight
  * vector → long: `Σ_i counts_i·w_i`, the linear-model apply over
  * hashed feature histograms ([[HashedGramCounts]]) — DSIR
  * importance weights, fastText-style gating, any broadcast
  * linear scorer. Exact integer arithmetic, one pass, no shuffle. */
case class LinearScoreLong(child: Expression, weights: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(weights.nonEmpty, "linear_score_long needs weights")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"linear_score_long expects array<bigint>, got $other")
    }
  override def dataType: DataType = LongType

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    require(n == weights.length,
      s"linear_score_long: dim mismatch ${weights.length} vs $n")
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * weights(i); i += 1 }
    s
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("linearScoreLong", this,
      classOf[LinearScoreLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "linear_score_long"
}
