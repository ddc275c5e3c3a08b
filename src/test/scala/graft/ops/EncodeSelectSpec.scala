package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 batch ten: out-of-fold target encoding, k-center greedy
  * selection, cross-source quantile normalization. */
class EncodeSelectSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode: own fold excluded, empty-oof falls back to global prior") {
    val rows = Seq(
      ("a", 10L, 0L), ("a", 20L, 0L),  // cat a fold 0
      ("a", 40L, 1L),                  // cat a fold 1
      ("b", 100L, 0L)                  // cat b ONLY in fold 0
    ).toDF("cat", "t", "fold")
    val byKey = Stats.targetEncode(rows, "cat", "t", "fold")
      .select(col("category"), col("fold"), col("n_in_fold"),
        col("n_oof"), col("enc"))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // (a,0): oof = {40} -> 40; (a,1): oof = {10,20} -> 15
    assert(byKey(("a", 0L)) == ((2L, 1L, Some(40L))))
    assert(byKey(("a", 1L)) == ((1L, 2L, Some(15L))))
    // (b,0): no other fold has b -> global prior over folds != 0:
    // rows {40} -> 40
    assert(byKey(("b", 0L)) == ((1L, 0L, Some(40L))))
  }

  test("kCenterGreedy picks the farthest point each round, ties on id") {
    // 2-d-ish vectors embedded in 4 dims; cosine structure:
    // e1 ~ e2 (same direction), e3 orthogonal, e4 opposite to e1
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(1f, 0.01f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(-1f, 0f, 0f, 0f)))
    val got = AnnSearch.kCenterGreedy(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3)
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    // seed = min id = 1; farthest from 1 is 4 (cos = -1);
    // then farthest from {1,4} is 3 (max cos 0) vs 2 (max cos ~1)
    assert(got.map(_._2).toSeq == Seq(1L, 4L, 3L))
    assert(got(0)._3.isEmpty)
    assert(got(1)._3.contains(-1000000L))
    assert(got(2)._3.contains(0L))
    // k larger than the corpus returns everything, stable order
    val all = AnnSearch.kCenterGreedy(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 10).as[(Long, Long, Option[Long])]
      .collect()
    assert(all.length == 4)
  }

  test("dpGroupSums: clipped sensitivity, deterministic dyadic noise") {
    val rows = Seq(
      ("u1", "k1", 50L), ("u1", "k1", 80L),  // u1 on k1: 130 -> clip 100
      ("u2", "k1", -300L),                   // u2 on k1: -300 -> clip -100
      ("u3", "k2", 10L)).toDF("u", "k", "v")
    val got = Stats.dpGroupSums(rows, Seq("k"), "u", "v",
        clip = 100L, seed = "t")
      .as[(String, Long)].collect().toMap
    // replay the md5 noise independently
    def noise(key: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def geo(hex: String): Long = {
        val u = java.lang.Long.parseLong(hex, 16)
        if (u == 0L) 60L else 60L - java.lang.Long.toBinaryString(u).length
      }
      100L * (geo(h.substring(0, 15)) - geo(h.substring(15, 30)))
    }
    assert(got("k1") == 100L - 100L + noise("k1")) // clipped both ways
    assert(got("k2") == 10L + noise("k2"))
    // determinism: same seed, same release
    val again = Stats.dpGroupSums(rows, Seq("k"), "u", "v", 100L, "t")
      .as[(String, Long)].collect().toMap
    assert(again == got)
  }

  test("knGreedyDecode follows argmax transitions and stops at dead ends") {
    // hand model: a->b (p 9), a->c (p 9, tie -> b wins), b->a (p 5),
    // c has no outgoing edge
    val model = Seq(
      ("a", "b", 3L, 9L), ("a", "c", 3L, 9L), ("b", "a", 2L, 5L))
      .toDF("w1", "w2", "c", "p_kn_e9")
    val got = TextAnalysis.knGreedyDecode(model, steps = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    // heaviest context: a (sum c = 6) over b (2); walk a->b->a->b->a
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a")))
    // a dead-end start terminates the walk early
    val dead = TextAnalysis.knGreedyDecode(
      Seq(("z", "q", 10L, 5L)).toDF("w1", "w2", "c", "p_kn_e9"),
      steps = 4).as[(Long, String, String, Long)].collect()
    assert(dead.length == 1 && dead(0)._2 == "z" && dead(0)._3 == "q")
  }

  test("quantileNormalize maps within-group ranks onto global order statistics") {
    // group A values 1,2,3; group B values 101,102,103 — after
    // normalization both groups map onto the SAME global values
    val rows = Seq(
      ("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L),
      ("B", 4L, 101L), ("B", 5L, 102L), ("B", 6L, 103L))
      .toDF("g", "id", "v")
    val got = Stats.quantileNormalize(rows, "g", "v", "id")
      .select(col("g"), col("id"), col("q_ppm"), col("norm"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    // n=3 per group: midpoint quantiles 1/6, 3/6, 5/6
    assert(got.map(_._3).toSeq ==
      Seq(166666L, 500000L, 833333L, 166666L, 500000L, 833333L))
    // k = q*6//1e6 + 1 -> ranks 1+0=1, 4, 5+1=... (166666*6//1e6=0 -> 1;
    // 500000*6//1e6=3 -> 4; 833333*6//1e6=4 -> 5): values 1, 101, 102
    val aNorm = got.filter(_._1 == "A").map(_._4).toSeq
    val bNorm = got.filter(_._1 == "B").map(_._4).toSeq
    assert(aNorm == bNorm) // the whole point: same scale after mapping
    assert(aNorm == Seq(1L, 101L, 102L))
  }
}
