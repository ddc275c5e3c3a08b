package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemanticDedup: keep-lowest-id pruning semantics, cluster
  * assignment determinism, cap observability, and Lloyd k-means
  * convergence on separable fixtures.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // Four well-separated axis directions + near-copies. Vectors on
  // the same axis have cosine 1.0 (micro-floored 1000000 after
  // scaling); cross-axis cosine is 0.
  private def axis(d: Int, scale: Double): Seq[Float] =
    (0 until 8).map(i => if (i == d) scale.toFloat else 0f)

  private def fixture: DataFrame = Seq(
    (0L, axis(0, 1.0)), (1L, axis(1, 1.0)), (2L, axis(2, 1.0)),
    (10L, axis(0, 2.0)),  // same direction as 0 → dup of 0
    (11L, axis(0, 0.5)),  // ditto
    (12L, axis(1, 3.0)),  // dup of 1
    (13L, axis(3, 1.0))   // own direction, no lower-id neighbor
  ).toDF("vec_id", "embedding")

  private def cents(k: Int): DataFrame =
    SemanticDedup.lowestIdCentroids(fixture, "vec_id", "embedding", k)

  test("report prunes every vector with a lower-id cosine neighbor") {
    val out = SemanticDedup.report(fixture, "vec_id", "embedding",
        cents(3), minCosM = 900000L)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    // clusters: centroid ids 0,1,2. 10/11 land on cluster 0 with
    // nn 0; 12 on cluster 1 with nn 1; 13 has cosine 0 to all
    // centroids → argmax ties to lowest centroid id 0, but no
    // similar neighbor there → kept.
    assert(out == Seq(
      (0L, 0L, None, None),
      (1L, 1L, None, None),
      (2L, 2L, None, None),
      (10L, 0L, Some(0L), Some(1000000L)),
      (11L, 0L, Some(0L), Some(1000000L)),
      (12L, 1L, Some(1L), Some(1000000L)),
      (13L, 0L, None, None)))
  }

  test("nn_id picks the highest score, ties to the lowest id") {
    // 10 and 11 both have cos 1.0 to 0 AND to each other; 11's
    // lower-id candidates {0, 10} tie at 1000000 → picks 0.
    val out = SemanticDedup.report(fixture, "vec_id", "embedding",
        cents(3), minCosM = 900000L)
      .filter($"vec_id" === 11L)
      .as[(Long, Long, Option[Long], Option[Long])].collect().head
    assert(out == ((11L, 0L, Some(0L), Some(1000000L))))
  }

  test("keepers = exactly the null-nn rows; pruned fraction matches") {
    val keep = SemanticDedup.keepers(fixture, "vec_id", "embedding",
        cents(3), minCosM = 900000L)
      .select("vec_id").as[Long].collect().toSet
    assert(keep == Set(0L, 1L, 2L, 13L))
  }

  test("threshold gates pruning: nothing prunes above every score") {
    val out = SemanticDedup.report(fixture, "vec_id", "embedding",
        cents(3), minCosM = 1000001L)
    assert(out.filter($"nn_id".isNotNull).count() == 0)
  }

  test("maxCluster cap suppresses pairs and is observable") {
    // one centroid → everything in one 7-wide cluster
    val r = SemanticDedup.report(fixture, "vec_id", "embedding",
      cents(1), minCosM = 900000L, maxCluster = 3)
    assert(r.filter($"nn_id".isNotNull).count() == 0)
    val over = SemanticDedup.oversizedClusters(fixture, "vec_id",
      "embedding", cents(1), maxCluster = 3)
      .as[(Long, Long)].collect().toSeq
    assert(over == Seq((0L, 7L)))
  }

  test("kmeans converges to exact per-direction means and is stable") {
    // separable fixture: after one iteration each centroid is the
    // mean of its direction's members; a second iteration must not
    // move it (fixed point)
    val k1 = SemanticDedup.kmeans(fixture, "vec_id", "embedding",
      cents(3), iters = 1)
    val k2 = SemanticDedup.kmeans(fixture, "vec_id", "embedding",
      cents(3), iters = 2)
    val m1 = k1.orderBy("centroid_id")
      .as[(Long, Seq[Double])].collect().toSeq
    val m2 = k2.orderBy("centroid_id")
      .as[(Long, Seq[Double])].collect().toSeq
    assert(m1 == m2)
    // cluster 0 members: ids 0,10,11,13 (13 ties to cluster 0 with
    // cosine 0 everywhere) → mean over axes 0 and 3
    assert(m1.head._1 == 0L)
    assert(m1.head._2(0) == (1.0 + 2.0 + 0.5 + 0.0) / 4)
    assert(m1.head._2(3) == 1.0 / 4)
    // cluster 1: ids 1,12 → axis1 mean (1+3)/2
    assert(m1(1)._2(1) == 2.0)
    // cluster 2: id 2 alone
    assert(m1(2)._2(2) == 1.0)
  }

  test("kmeans keeps the previous centroid for emptied clusters") {
    // two centroids far from all data points: seed with ids 0,1 but
    // data only on axis 2 → cluster 1 empties after assignment ties
    // send everything to centroid 0... construct explicitly:
    val df = Seq((5L, axis(2, 1.0)), (6L, axis(2, 2.0)))
      .toDF("vec_id", "embedding")
    val seed = Seq((100L, (0 until 8).map(i => if (i == 0) 1.0 else 0.0)),
        (200L, (0 until 8).map(i => if (i == 1) 1.0 else 0.0)))
      .toDF("centroid_id", "__cemb")
    val out = SemanticDedup.kmeans(df, "vec_id", "embedding", seed,
        iters = 1)
      .orderBy("centroid_id").as[(Long, Seq[Double])].collect().toSeq
    // cosine 0 to both → ties to lowest centroid id 100; centroid
    // 200 keeps its seed vector
    assert(out(0)._1 == 100L && out(0)._2(2) == 1.5)
    assert(out(1)._1 == 200L && out(1)._2(1) == 1.0)
  }

  test("kmeansInt recovers two clusters from same-axis bad seeding") {
    // seeds = ids 0,1 — BOTH on axis 0; Lloyd must pull centroid 0
    // onto axis 3 within two rounds. All arithmetic hand-checked in
    // exact micros: every final dist is (1e5)² = 1e10.
    val df = Seq((0L, axis(0, 1.0)), (1L, axis(0, 1.2)),
      (2L, axis(3, 1.0)), (3L, axis(3, 0.8)))
      .toDF("vec_id", "embedding")
    val out = SemanticDedup.kmeansInt(df, "vec_id", "embedding",
        k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 10000000000L), (1L, 1L, 10000000000L),
      (2L, 0L, 10000000000L), (3L, 0L, 10000000000L)))
  }

  test("kmeansInt iters=0 assigns against raw seeds, ties to lowest") {
    val df = Seq((0L, axis(0, 1.0)), (1L, axis(1, 1.0)),
      (2L, axis(2, 1.0))) // equidistant (2e12) to both seeds
      .toDF("vec_id", "embedding")
    val out = SemanticDedup.kmeansInt(df, "vec_id", "embedding",
        k = 2, iters = 0)
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 0L), (1L, 1L, 0L),
      (2L, 0L, 2000000000000L)))
  }

  test("kmeansInt refuses k beyond the corpus; survives empty clusters") {
    val df = Seq((0L, axis(0, 1.0)), (1L, axis(0, 1.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemanticDedup.kmeansInt(df, "vec_id", "embedding", k = 3, iters = 1)
    }
    assert(e.getMessage.contains("only 2 vectors"))
    // identical seeds: cluster 1 empties (ties → 0) and must keep
    // its previous centroid without error
    val out = SemanticDedup.kmeansInt(df, "vec_id", "embedding",
        k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 0L), (1L, 0L, 0L)))
  }

  test("nearestCentroid flags mislabels and autolabels nulls") {
    // label 0 = ids 0,1 on axis 0 (centroid 1.1e6); label 1 =
    // ids 2,3,4 — but 4 sits on axis 0, dragging centroid 1 to
    // (333333, 600000) and getting flagged as label noise. id 5
    // is unlabelled and autolabels to 1. All dists hand-computed.
    val df = Seq(
      (0L, Some(0), axis(0, 1.0)), (1L, Some(0), axis(0, 1.2)),
      (2L, Some(1), axis(1, 1.0)), (3L, Some(1), axis(1, 0.8)),
      (4L, Some(1), axis(0, 1.0)), (5L, None, axis(1, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val out = SemanticDedup.nearestCentroid(df, "vec_id", "embedding",
        "label")
      .orderBy("vec_id")
      .as[(Long, Option[Long], Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, Some(0L), 0L, 10000000000L, 1L),
      (1L, Some(0L), 0L, 10000000000L, 1L),
      (2L, Some(1L), 1L, 271110888889L, 1L),
      (3L, Some(1L), 1L, 151110888889L, 1L),
      (4L, Some(1L), 0L, 10000000000L, 0L),   // the mislabel
      (5L, None, 1L, 271110888889L, 0L)))     // the autolabel
  }

  test("kmeansInt final assignment plans as a pure projection") {
    val df = Seq((0L, axis(0, 1.0)), (1L, axis(1, 1.0)),
      (2L, axis(2, 1.0)), (3L, axis(3, 1.0)))
      .toDF("vec_id", "embedding")
    val out = SemanticDedup.kmeansInt(df, "vec_id", "embedding",
      k = 2, iters = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"assignment joined:\n$plan")
  }

  test("nearestCentroid ties to the lowest label; refuses all-null") {
    val df = Seq((0L, Some(3), axis(0, 1.0)), (1L, Some(7), axis(1, 1.0)),
      (2L, None, axis(2, 1.0))) // equidistant to both centroids
      .toDF("vec_id", "label", "embedding")
    val out = SemanticDedup.nearestCentroid(df, "vec_id", "embedding",
        "label")
      .orderBy("vec_id")
      .as[(Long, Option[Long], Long, Long, Long)].collect().toSeq
    assert(out(2) == (2L, None, 3L, 2000000000000L, 0L))
    val e = intercept[IllegalArgumentException] {
      SemanticDedup.nearestCentroid(
        Seq((0L, None: Option[Int], axis(0, 1.0)))
          .toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label")
    }
    assert(e.getMessage.contains("no non-null labels"))
  }
}
