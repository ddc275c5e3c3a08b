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

  /** Lloyd's k-means in EXACT integer micros space — the
    * hash-oracle-able sibling of [[kmeans]]. Embeddings map to
    * `floor(x·1e6)` longs ([[graft.codecs.FloorMicros]]); from
    * there every step is order-free integer arithmetic, so the
    * whole clustering — seeds, every round's means, the final
    * assignment — reproduces bit-for-bit in any engine (q120's
    * DuckDB oracle unrolls the rounds in SQL). The quantization
    * moves each coordinate < 1e-6, immaterial next to k-means'
    * own seeding variance; use [[kmeans]] when float centroids
    * matter more than replayability.
    *
    * Scale shape matches [[kmeans]]: assignment is a codegen'd
    * argmin projection against broadcast centroids
    * ([[graft.codecs.ArgMinL2M]], zero corpus shuffles); the
    * means exchange carries ≤ k·dim·partitions partial (cluster,
    * pos) sums, never the corpus; centroids pin to the driver
    * each round (k·dim longs, the bounded-collect contract).
    * Long sums overflow only past ~6·10¹² rows per cluster.
    *
    * Determinism: seeds are the k lowest-id vectors in id order;
    * assignment ties break to the lowest centroid index (strict
    * `<`); means are integral `div` (truncation — Spark `div` and
    * DuckDB `//` agree on negatives); a cluster that lost all
    * members keeps its previous centroid. Returns the final
    * per-vector assignment `(idCol, cluster, dist)` with `dist`
    * the exact squared L2 in micros². */
  def kmeansInt(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0, s"cluster count must be positive (got $k)")
    require(iters >= 0, s"iteration count must be >= 0 (got $iters)")
    val vm = df.select(col(idCol).as("__kid"),
      graft.functions.GraftFunctions.floorMicros(col(embCol)).as("__vm"))
    var cents: Array[Array[Long]] = vm.orderBy(col("__kid")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray) // k rows: bounded
    require(cents.length == k,
      s"kmeansInt: corpus has only ${cents.length} vectors for k=$k seeds")
    for (_ <- 1 to iters) {
      val mus = vm.select(
          graft.functions.GraftFunctions.argMinL2M(col("__vm"), cents)
            .getField("cluster").as("__c"),
          posexplode(col("__vm")))
        .groupBy(col("__c"), col("pos"))
        .agg(sum(col("col")).as("__s"), count(lit(1)).as("__n"))
        .withColumn("__mu", expr("__s div __n"))
        .select(col("__c"), col("pos"), col("__mu"))
        .collect() // k·dim rows: bounded
      val next = cents.map(_.clone()) // empty cluster keeps previous
      mus.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2)
      }
      cents = next
    }
    vm.select(col("__kid").as(idCol),
        graft.functions.GraftFunctions.argMinL2M(col("__vm"), cents)
          .as("__a"))
      .select(col(idCol), col("__a.cluster").cast("long").as("cluster"),
        col("__a.dist").as("dist"))
  }

  /** Nearest-centroid label audit — the supervised sibling of
    * [[kmeansInt]], in the same exact integer micros space. Per
    * label, the centroid is the element-wise integral mean of its
    * members' floor-micros vectors; every vector (labelled or not)
    * is then assigned to the nearest label centroid. Rows where
    * `pred != label` are the label-noise candidates a curation
    * pass reviews; rows with a null label get an autolabel. Ties
    * break to the LOWEST label.
    *
    * Scale: one corpus pass for the means (the exchange carries ≤
    * labels·dim·partitions partial sums), one codegen'd broadcast
    * argmin pass for assignment — zero corpus shuffles, the
    * [[graft.codecs.ArgMinL2M]] contract. Labels must be few
    * enough to broadcast (bounded-collect contract: labels·dim
    * longs on the driver).
    *
    * Returns `(idCol, label, pred, dist, correct)` — label the
    * input label (null-safe), pred the assigned label, dist the
    * exact squared L2 in micros², correct 0/1 (null label → 0). */
  def nearestCentroid(df: DataFrame, idCol: String, embCol: String,
      labelCol: String): DataFrame = {
    val vm = df.select(col(idCol).as("__nid"),
      col(labelCol).cast("long").as("__lab"),
      graft.functions.GraftFunctions.floorMicros(col(embCol)).as("__vm"))
    val mus = vm.filter(col("__lab").isNotNull)
      .select(col("__lab"), posexplode(col("__vm")))
      .groupBy(col("__lab"), col("pos"))
      .agg(sum(col("col")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__mu", expr("__s div __n"))
      .select(col("__lab"), col("pos"), col("__mu"))
      .collect() // labels·dim rows: bounded
    require(mus.nonEmpty,
      "nearestCentroid: no non-null labels to build centroids from")
    val labels = mus.map(_.getLong(0)).distinct.sorted
    val dim = mus.map(_.getInt(1)).max + 1
    val cents = Array.ofDim[Long](labels.length, dim)
    val li = labels.zipWithIndex.toMap
    mus.foreach(r => cents(li(r.getLong(0)))(r.getInt(1)) = r.getLong(2))
    vm.select(col("__nid").as(idCol), col("__lab").as("label"),
        graft.functions.GraftFunctions.argMinL2M(col("__vm"), cents)
          .as("__a"))
      .select(col(idCol), col("label"),
        element_at(typedLit(labels.toSeq),
          col("__a.cluster") + 1).as("pred"),
        col("__a.dist").as("dist"))
      .withColumn("correct",
        coalesce((col("label") === col("pred")).cast("long"), lit(0L)))
  }
}
