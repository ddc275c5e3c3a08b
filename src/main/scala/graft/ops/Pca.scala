package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** PCA over an embedding column at corpus scale — the dense
  * dimensionality reduction next to the 1-bit ([[AnnSearch]] LSH)
  * and int8 ([[graft.codecs.QuantizeInt8]]) compressions: project
  * d-dim vectors onto the top-m principal directions before ANN /
  * clustering / dedup, cutting candidate-scan bandwidth d/m× with
  * the least possible variance loss.
  *
  * Scale shape: [[fit]] makes ONE distributed pass that reduces each
  * partition to a (count, mean-sum d, upper-triangle second-moment
  * d(d+1)/2) accumulator — ~2 KB at d=64 — merged pairwise by
  * `Dataset.reduce`; no exchange ever carries a vector. The d×d
  * eigenproblem is driver-work by construction (classic cyclic
  * Jacobi, deterministic — public-knowledge algorithm, e.g. Golub &
  * Van Loan §8.5), exactly like [[AnnSearch]]'s collected centroid
  * contract. [[transform]] is a pure codegen projection: component j
  * of the output is `dot(x, c_j) − dot(mean, c_j)` — the centering
  * folds into a per-component constant, so the hot path is m
  * [[graft.codecs.DotProduct]] kernels and no element-wise
  * subtraction materializes.
  *
  * Spec-tested (axis recovery, orthonormality, descending variance,
  * centering, subspace reconstruction) rather than hash-oracled:
  * eigenvectors are not SQL-expressible and per-engine fp sum order
  * differs — same adjudication as X4/X5 and `kmeans`. */
object Pca {

  /** mean, row-major components (top-m eigenvectors, unit norm,
    * descending eigenvalue), and each component's variance. */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], variance: Array[Double]) {
    def m: Int = components.length
    def d: Int = mean.length
  }

  /** count + Σx + upper-triangle Σxxᵀ — the per-partition sketch.
    * Public only because the kryo encoder refuses non-public classes;
    * not API. */
  final case class GramAcc(var n: Long, sum: Array[Double],
      ut: Array[Double]) {
    def merge(o: GramAcc): GramAcc = {
      n += o.n
      var i = 0
      while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
      i = 0
      while (i < ut.length) { ut(i) += o.ut(i); i += 1 }
      this
    }
  }

  /** One-pass fit. `dim` is the declared vector width (mismatched
    * rows are refused, not silently truncated); `m` the component
    * count to keep, 1 ≤ m ≤ dim. Nulls are skipped. */
  def fit(df: DataFrame, embCol: String, dim: Int, m: Int): PcaModel = {
    require(dim > 0 && m > 0 && m <= dim,
      s"need 0 < m <= dim (got m=$m, dim=$dim)")
    val acc = df.select(col(embCol).cast("array<double>").as("e"))
      .na.drop(Seq("e"))
      .mapPartitions { it =>
        val a = GramAcc(0L, new Array[Double](dim),
          new Array[Double](dim * (dim + 1) / 2))
        val v = new Array[Double](dim)
        it.foreach { row =>
          // getSeq boxes; a null ELEMENT would unbox to 0.0 and
          // silently skew the moments — refuse it like the dim
          // mismatch (na.drop above only removes whole-null arrays).
          // Validate + unbox once, then run the O(d²) loop primitive.
          val boxed = row.getSeq[java.lang.Double](0)
          require(boxed.length == dim,
            s"pca: vector of length ${boxed.length}, declared dim $dim")
          var i = 0
          while (i < dim) {
            val bi = boxed(i)
            require(bi ne null,
              s"pca: null element at index $i — drop or impute nulls first")
            v(i) = bi.doubleValue()
            i += 1
          }
          a.n += 1
          i = 0
          while (i < dim) {
            val vi = v(i)
            a.sum(i) += vi
            var j = i
            var k = i * dim - i * (i - 1) / 2 // row-i offset in UT layout
            while (j < dim) { a.ut(k + (j - i)) += vi * v(j); j += 1 }
            i += 1
          }
        }
        Iterator.single(a)
      }(Encoders.kryo[GramAcc])
      .reduce((x, y) => x.merge(y))
    require(acc.n > 1, s"pca: need at least 2 vectors, got ${acc.n}")

    // covariance C = Σxxᵀ/n − μμᵀ (population form — deterministic,
    // and the eigenvectors are scale-invariant in n vs n−1)
    val n = acc.n.toDouble
    val mean = acc.sum.map(_ / n)
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = acc.ut(k) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        k += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(c)
    // sort descending by eigenvalue, tie-break on index for determinism
    val order = values.indices.sortBy(idx => (-values(idx), idx)).take(m)
    PcaModel(mean,
      order.map(idx => vectors.map(_(idx))).toArray,
      order.map(idx => math.max(values(idx), 0.0)).toArray)
  }

  /** Append `outCol` = the m-dim projection of `embCol` onto the
    * model's components (centered). Pure codegen: m DotProduct
    * kernels, centering pre-folded into constants. */
  def transform(df: DataFrame, embCol: String, model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val e = col(embCol).cast("array<double>")
    val comps = model.components.map { comp =>
      var off = 0.0
      var i = 0
      while (i < comp.length) { off += comp(i) * model.mean(i); i += 1 }
      AnnSearch.dot(e, lit(comp)) - lit(off)
    }
    df.withColumn(outCol, array(comps.toIndexedSeq: _*))
  }

  /** Fraction of total variance the kept components explain, in
    * floored ppm (the "how much did m lose" number). */
  def explainedPpm(model: PcaModel, totalVariance: Double): Long = {
    require(totalVariance > 0, "non-positive total variance")
    math.floor(model.variance.sum / totalVariance * 1000000.0).toLong
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * repeatedly zero the largest-magnitude off-diagonal entry with a
    * Givens rotation until off-diagonal mass < tol. Returns
    * (eigenvalues, column-eigenvector matrix). O(d³) per sweep —
    * driver-sized for embedding dims. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]],
      tol: Double = 1e-12, maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    if (apq == 0.0) return
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = if (theta >= 0) 1.0 else -1.0
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var k = 0
    while (k < d) {
      val akp = a(k)(p); val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p)(k); val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      k += 1
    }
    k = 0
    while (k < d) {
      val vkp = v(k)(p); val vkq = v(k)(q)
      v(k)(p) = c * vkp - s * vkq
      v(k)(q) = s * vkp + c * vkq
      k += 1
    }
  }
}
