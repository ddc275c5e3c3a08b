package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pca: axis recovery on a known-covariance fixture, orthonormal
  * descending components, centered codegen projection, subspace
  * reconstruction, refusals, and the Jacobi kernel itself.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  // 8-dim data varying only along axes 2 (sd 4) and 5 (sd 1),
  // centered at mean = (0,...,10,...,20,...): variance 16 on axis 2,
  // 1 on axis 5, 0 elsewhere — eigenpairs known in closed form.
  private def fixture = {
    val rows = for (i <- -2 to 2; j <- -2 to 2) yield {
      val v = new Array[Double](8)
      v(2) = 10.0 + 4.0 * i
      v(5) = 20.0 + 1.0 * j
      (i * 5 + j, v.toSeq)
    }
    rows.toDF("id", "emb").repartition(3) // multi-partition merge path
  }

  test("fit recovers the two variance axes, descending, orthonormal") {
    val m = Pca.fit(fixture, "emb", dim = 8, m = 2)
    assert(math.abs(m.mean(2) - 10.0) < eps)
    assert(math.abs(m.mean(5) - 20.0) < eps)
    // population variance of {-8,-4,0,4,8} each appearing 5 times: 32
    assert(math.abs(m.variance(0) - 32.0) < 1e-6)
    assert(math.abs(m.variance(1) - 2.0) < 1e-6)
    // components are ±axis unit vectors
    assert(math.abs(math.abs(m.components(0)(2)) - 1.0) < 1e-6)
    assert(math.abs(math.abs(m.components(1)(5)) - 1.0) < 1e-6)
    // orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
  }

  test("transform projects centered: mean row maps to the zero vector") {
    val m = Pca.fit(fixture, "emb", dim = 8, m = 2)
    val meanRow = Seq((0, m.mean.toSeq)).toDF("id", "emb")
    val p = Pca.transform(meanRow, "emb", m)
      .select("pca").as[Seq[Double]].head()
    assert(p.forall(x => math.abs(x) < 1e-9))
  }

  test("projection preserves in-subspace distances (reconstruction)") {
    val m = Pca.fit(fixture, "emb", dim = 8, m = 2)
    val p = Pca.transform(fixture, "emb", m)
      .select($"id", $"pca").as[(Int, Seq[Double])].collect().toMap
    // data lives entirely in the kept 2-dim subspace, so projected
    // squared distances equal original squared distances
    val orig = fixture.as[(Int, Seq[Double])].collect().toMap
    for (a <- orig.keys; b <- orig.keys if a < b) {
      val d0 = orig(a).zip(orig(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      val d1 = p(a).zip(p(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(d0 - d1) < 1e-6, s"pair ($a,$b)")
    }
  }

  test("explainedPpm: kept variance over total") {
    val m = Pca.fit(fixture, "emb", dim = 8, m = 1)
    // total variance = 32 + 2; top-1 keeps 32
    assert(Pca.explainedPpm(m, 34.0) == math.floor(32.0 / 34.0 * 1e6).toLong)
  }

  test("refusals: bad dims, mismatched rows, sub-2 corpus") {
    intercept[IllegalArgumentException] {
      Pca.fit(fixture, "emb", dim = 8, m = 9)
    }
    val short = Seq((1, Seq(1.0, 2.0)), (2, Seq(3.0))).toDF("id", "emb")
    val e = intercept[Exception] {
      Pca.fit(short, "emb", dim = 2, m = 1)
    }
    assert(e.getMessage.contains("declared dim") ||
      e.getCause != null) // SparkException wraps the task failure
    intercept[IllegalArgumentException] {
      Pca.fit(Seq((1, Seq.fill(4)(0.0))).toDF("id", "emb"), "emb", 4, 1)
    }
    // a null ELEMENT must refuse, not silently become 0.0
    val withNullElem = Seq(
      (1, Seq[java.lang.Double](1.0, 2.0)),
      (2, Seq[java.lang.Double](3.0, null))).toDF("id", "emb")
    val ne = intercept[Exception] {
      Pca.fit(withNullElem, "emb", dim = 2, m = 1)
    }
    assert(ne.getMessage.contains("null element") ||
      (ne.getCause != null && ne.getCause.getMessage.contains("null element")))
  }

  test("jacobiEigen matches a hand-checked 2x2 and stays symmetric-safe") {
    // [[2,1],[1,2]] → eigenvalues 3 and 1, vectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    val hi = if (vals(0) > vals(1)) 0 else 1
    assert(math.abs(math.abs(vecs(0)(hi)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(vecs(0)(hi) - vecs(1)(hi)) < 1e-9) // same sign
  }

  test("fit works on float embeddings (the parquet layout)") {
    val f = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)), (3L, Seq(5.0f, 0.0f))
    ).toDF("id", "emb")
    val m = Pca.fit(f, "emb", dim = 2, m = 1)
    assert(math.abs(m.mean(0) - 3.0) < eps)
    assert(math.abs(m.variance(0) - 8.0 / 3.0) < 1e-9)
  }
}
