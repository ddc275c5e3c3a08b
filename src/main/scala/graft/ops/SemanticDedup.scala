package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): partition the embedding space into clusters,
  * then inside each cluster drop every vector that is
  * cosine-similar to a smaller-id member. Catches semantic
  * near-duplicates (paraphrases, re-renders, templated variants)
  * that the string-level [[NearDedup]] family cannot see; the
  * keep-the-lowest-id-in-order rule is exactly the released
  * SemDeDup pruning semantics with the id column as the scan order.
  *
  * Scale shape: cluster assignment is [[AnnSearch.ivfAssign]] — a
  * codegen'd argmax projection against a small collected centroid
  * set, ZERO shuffles over the corpus. The only corpus-sized
  * exchange is the within-cluster self-join, bounded by
  * `maxCluster` with the cap observable via [[oversizedClusters]]
  * (the same no-silent-drop contract as [[NearDedup]]'s band caps).
  * At the paper's geometry (centroids ≈ corpus/4096, i.e.
  * [[AnnSearch.centroidsFor]]) pair work is corpus × clusterWidth,
  * never corpus².
  *
  * Determinism: centroids are the k smallest-id vectors, assignment
  * ties break to the lowest centroid id
  * ([[graft.codecs.ArgMaxCosM]]), and pair scores are micro-floored
  * element-order double cosines — every number reproduces
  * bit-for-bit in any engine (q80's DuckDB oracle replays all of
  * it in SQL).
  */
object SemanticDedup {

  /** The k lowest-id vectors as a centroid table
    * (centroid_id, __cemb) — the deterministic seed. [[kmeans]]
    * refines it when real cluster geometry matters; the dedup
    * semantics only need SOME deterministic partition of the space
    * (the paper observes pruning quality is robust to clustering
    * detail). */
  def lowestIdCentroids(df: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"centroid count must be positive (got $k)")
    df.select(col(idCol).as("centroid_id"), col(embCol).as("__cemb"))
      .orderBy(col("centroid_id")).limit(k)
  }

  /** Per-vector dedup report: (idCol, cluster, nn_id, cos_m) where
    * nn_id is the SMALLER-id same-cluster member with the highest
    * micro-floored cosine ≥ `minCosM` (score ties → lowest id), or
    * null when no such member exists. A null nn_id row is the
    * cluster-local representative SemDeDup KEEPS; every non-null
    * row is pruned. Clusters wider than `maxCluster` contribute no
    * pairs (their members all report null) — surface them with
    * [[oversizedClusters]]. */
  def report(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, minCosM: Long,
      maxCluster: Int = 10000): DataFrame = {
    val assigned = AnnSearch.ivfAssign(df, idCol, embCol, centroids)
      .select(col("cid").as(idCol), col("__ce"), col("bucket").as("cluster"))
    val w = Window.partitionBy(col("cluster"))
    val capped = assigned.withColumn("__cw", count(lit(1)).over(w))
      .filter(col("__cw") <= maxCluster).drop("__cw")
    val a = capped.select(col(idCol), col("__ce").as("__ea"), col("cluster"))
    val b = capped.select(col(idCol).as("__idb"), col("__ce").as("__eb"),
      col("cluster"))
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("__idb") < col(idCol))
      .withColumn("cos_m",
        floor(AnnSearch.cosine(col("__ea"), col("__eb")) * 1000000L)
          .cast("long"))
      .filter(col("cos_m") >= minCosM)
    // argmax over lower-id neighbors: min of (-cos_m, id) structs =
    // highest score, ties to the lowest neighbor id
    val nn = pairs
      .groupBy(col(idCol), col("cluster"))
      .agg(min(struct((-col("cos_m")).as("nm"), col("__idb").as("nid")))
        .as("__m"))
      .select(col(idCol), col("cluster"), col("__m.nid").as("nn_id"),
        (-col("__m.nm")).cast("long").as("cos_m"))
    assigned.select(col(idCol), col("cluster"))
      .join(nn, Seq(idCol, "cluster"), "left")
  }

  /** Rows [[report]] keeps: the cluster-local representatives
    * (smallest id of every similarity group). The pruned fraction is
    * `1 - keep/corpus` — the paper's dedup rate. */
  def keepers(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, minCosM: Long,
      maxCluster: Int = 10000): DataFrame =
    report(df, idCol, embCol, centroids, minCosM, maxCluster)
      .filter(col("nn_id").isNull)
      .select(col(idCol), col("cluster"))

  /** (cluster, width) of every cluster wider than `maxCluster` —
    * the observability counterpart of [[report]]'s cap. Empty
    * output = full pair coverage. */
  def oversizedClusters(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, maxCluster: Int = 10000): DataFrame =
    AnnSearch.ivfAssign(df, idCol, embCol, centroids)
      .groupBy(col("bucket").as("cluster"))
      .agg(count(lit(1)).as("width"))
      .filter(col("width") > maxCluster)

  /** Lloyd's k-means refinement of a centroid table — the real
    * clustering for production geometry. Each iteration: (1) assign
    * every vector to its nearest centroid (codegen'd projection,
    * zero shuffles); (2) recompute means via posexplode →
    * partial-aggregated (cluster, dim) sums — the exchange carries
    * ≤ centroids × dim × partitions rows, never the corpus; (3) a
    * cluster that lost all members keeps its previous centroid
    * (standard empty-cluster rule). Returns (centroid_id, __cemb)
    * with double-array centroids, same shape as the input so
    * iterations compose.
    *
    * Floating-point means depend on the engine's partial-sum order,
    * so k-means output is spec-tested for convergence/determinism
    * in-engine rather than hash-oracled cross-engine (the dedup
    * path q80 oracles uses the deterministic seed directly).
    *
    * Centroids are pinned to a driver-local frame after every
    * iteration (they are small by the same contract that lets
    * [[AnnSearch.ivfAssign]] collect them), so iteration i never
    * re-executes iterations 1..i-1 — each round costs exactly one
    * corpus scan, the [[Dedup]] lineage-truncation rule applied to
    * the k-means loop. */
  def kmeans(df: DataFrame, idCol: String, embCol: String,
      init: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iteration count must be positive (got $iters)")
    var cents = init.select(col("centroid_id"),
      col("__cemb").cast("array<double>").as("__cemb"))
    for (_ <- 1 to iters) {
      val means = AnnSearch.ivfAssign(df, idCol, embCol, cents)
        .select(col("bucket"),
          posexplode(col("__ce").cast("array<double>")))
        .groupBy(col("bucket"), col("pos"))
        .agg(avg(col("col")).as("__mu"))
        .groupBy(col("bucket"))
        .agg(array_sort(collect_list(struct(col("pos"), col("__mu"))))
          .as("__pm"))
        .select(col("bucket").as("centroid_id"),
          transform(col("__pm"), x => x.getField("__mu")).as("__mean"))
      val stepped = cents.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("__mean"), col("__cemb")).as("__cemb"))
      cents = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(stepped.collect(): _*), stepped.schema)
    }
    cents
  }
}
