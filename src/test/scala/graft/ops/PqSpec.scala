package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqCodebooks: deterministic [m][ksub][dsub] slices of the " +
      "md5-sampled rows; small corpus yields fewer entries") {
    val cb1 = AnnSearch.pqCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16)
    val cb2 = AnnSearch.pqCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb1.length == 8 && cb1.forall(_.length == 16) &&
      cb1.forall(_.forall(_.length == 8)))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq)
    // subspace s of entry j is dims [8s, 8s+8) of one sampled row:
    // re-concatenating the subspaces must reproduce a corpus vector
    val sampled = cb1.head.indices.map(j =>
      cb1.flatMap(_(j).toSeq).toSeq)
    val corpus = e.select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().toSet
    sampled.foreach(v => assert(corpus.contains(v)))
    val tiny = AnnSearch.pqCodebooks(
      e.filter($"vec_id" < 3), "vec_id", "embedding", m = 4, ksub = 16)
    assert(tiny.forall(_.length == 3))
  }

  test("pqEncode: codes in [0, ksub); a sampled codebook row " +
      "encodes to its own entry index in every subspace") {
    val cb = AnnSearch.pqCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16)
    val enc = AnnSearch.pqEncode(e, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect()
    assert(enc.length == e.count())
    assert(enc.forall(_._2.length == 8))
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 16)))
    // entry j reconstructs exactly, so its sub-distances are 0 and
    // argmin-first returns j itself in every subspace
    val sampledVec = cb.flatMap(_(5).toSeq).toSeq
    val hit = e.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .filter(_._2 == sampledVec).map(_._1).toSet
    assert(hit.nonEmpty)
    val codesOfHit = enc.filter(r => hit.contains(r._1)).map(_._2)
    assert(codesOfHit.nonEmpty && codesOfHit.forall(_.forall(_ == 5)))
  }

  test("ADC lookup sum equals the direct squared L2 to the " +
      "reconstruction, bit-for-bit") {
    val cb = AnnSearch.pqCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16)
    val enc = AnnSearch.pqEncode(e, "vec_id", "embedding", cb)
    val q = e.filter($"vec_id" === 7L)
      .select($"vec_id".as("qid"), $"embedding".cast("array<double>").as("__qe"))
    val qt = q.select($"qid",
      graft.functions.GraftFunctions.column(graft.codecs.PqDistTable(
        graft.functions.GraftFunctions.expr($"__qe"), cb)).as("__tbl"))
    val adc = enc.crossJoin(broadcast(qt))
      .select($"cid",
        graft.functions.GraftFunctions.column(graft.codecs.PqAdcLookup(
          graft.functions.GraftFunctions.expr($"codes"),
          graft.functions.GraftFunctions.expr($"__tbl"), 16)).as("d"))
      .as[(Long, Double)].collect().toMap
    // direct: reconstruct each candidate from its codes on the
    // driver and fold the squared L2 in the same subspace-major,
    // element-ascending order
    val qv = q.select($"__qe").as[Seq[Double]].collect().head.toArray
    val codes = enc.as[(Long, Seq[Int])].collect().toMap
    codes.foreach { case (cid, cs) =>
      var direct = 0.0
      cs.zipWithIndex.foreach { case (j, s) =>
        val entry = cb(s)(j)
        var acc = 0.0
        var d = 0
        while (d < entry.length) {
          val diff = qv(s * entry.length + d) - entry(d)
          acc += diff * diff
          d += 1
        }
        direct += acc
      }
      assert(adc(cid) == direct, s"cid $cid: adc ${adc(cid)} != $direct")
    }
  }

  test("pqTopK recall: monotone in rerank, finer geometry beats " +
      "coarser, and m=16/ksub=64/rerank=16 reaches 1.0 on the " +
      "uniform fixture (adversarial for PQ, like the LSH test); " +
      "output is deterministic") {
    val q = e.filter($"vec_id" < 20)
    def rec(m: Int, ks: Int, rr: Int) = AnnSearch.pqRecallAtK(
      q, e, "vec_id", "vec_id", "embedding", k = 5, m = m,
      ksub = ks, rerank = rr)
    // measured grid (deterministic md5-sampled codebooks):
    //   m=8  ksub=16: rerank 1/8 → 0.28/0.52
    //   m=16 ksub=64: rerank 1/4/16 → 0.51/0.87/1.0
    val coarse1 = rec(8, 16, 1)
    val coarse8 = rec(8, 16, 8)
    assert(coarse1 >= 0.20 && coarse8 >= coarse1,
      s"m=8/ksub=16: rerank1 $coarse1, rerank8 $coarse8")
    val fine1 = rec(16, 64, 1)
    val fine4 = rec(16, 64, 4)
    assert(fine1 >= coarse1 && fine4 >= 0.80,
      s"m=16/ksub=64: rerank1 $fine1, rerank4 $fine4")
    assert(rec(16, 64, 16) == 1.0)
    val a = AnnSearch.pqTopK(q, e, "vec_id", "vec_id", "embedding",
      k = 5, m = 16, ksub = 64, rerank = 8).collect().toSeq
    val b = AnnSearch.pqTopK(q, e, "vec_id", "vec_id", "embedding",
      k = 5, m = 16, ksub = 64, rerank = 8).collect().toSeq
    assert(a == b)
  }

  test("pq refuses: ksub > 256, indivisible dim, ragged codebooks") {
    intercept[IllegalArgumentException] {
      AnnSearch.pqCodebooks(e, "vec_id", "embedding", m = 8, ksub = 257)
    }
    intercept[IllegalArgumentException] {
      AnnSearch.pqCodebooks(e, "vec_id", "embedding", m = 7, ksub = 16)
    }
    intercept[IllegalArgumentException] {
      graft.codecs.PqMath.checkDim(Array(
        Array(Array(1.0, 2.0)), Array(Array(1.0))))
    }
  }
}
