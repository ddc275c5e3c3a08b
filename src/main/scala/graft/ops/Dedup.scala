package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Exact dedup here; near-dup (MinHash-LSH banding, SimHash, n-gram
  * Jaccard) lives in [[graft.ops.NearDedup]], with candidate
  * generation via band-bucket joins so nothing ever compares all
  * pairs.
  */
object Dedup {

  /** Exact dedup on a key expression: keep exactly one row (the one
    * with the smallest `orderCol`) per distinct key.
    *
    * Implementation is a single hash-shuffle on the key
    * (`row_number` over a window). At 100 TB this is the canonical
    * map-side-combine-free pattern; keys are md5 fingerprints so the
    * shuffle payload is small and uniformly distributed (no skew
    * salting needed).
    */
  def exact(df: DataFrame, key: Column, orderCol: Column): DataFrame = {
    // collision-checked temp column name
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(key).orderBy(orderCol)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Exact text dedup keyed on the normalized-text fingerprint. */
  def exactByText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    exact(df, TextAnalysis.fingerprint(col(textCol)), col(idCol))

  /** Group-shaped variant: distinct fingerprints with the surviving
    * (minimum) id and the duplicate count — the "dedup report". */
  def exactReport(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Connected components over a near-dup pair graph — the step a
    * real pipeline needs AFTER pair generation: near-duplicate
    * relations are not transitive pairwise, so keeping "one doc per
    * pair" under-deletes; the actionable unit is the transitive
    * CLUSTER, with one canonical survivor per cluster. Output:
    * `(id, cluster_id)` for every id appearing in `pairs`, where
    * `cluster_id` is the minimum id reachable through the pair graph
    * (so `id === cluster_id` marks the canonical survivor). Ids with
    * no pair are singleton clusters by definition and are NOT emitted
    * — the caller left-joins the corpus and coalesces to `id`.
    *
    * Algorithm: distributed min-label propagation with pointer
    * jumping. Each round is two hash-shuffled joins: (1) every vertex
    * takes the min of its own and its neighbors' labels (one join
    * edges⋈labels + one agg), (2) labels chase one level of
    * indirection (labels⋈labels), which halves chain depth per round
    * — so convergence is O(log diameter) rounds, not O(diameter), and
    * near-dup clusters are near-cliques (diameter ≈ 2) in practice.
    * Every round materializes via persist and compares change counts;
    * non-convergence within `maxIter` THROWS rather than returning a
    * partial clustering — a half-propagated label is a silently wrong
    * answer. All shuffles are plain hash exchanges on id; nothing is
    * ever collected to the driver.
    */
  def clusters(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // Materialize a round's result as a persisted InternalRow RDD and
    // rewrap it — TRUE lineage truncation. persist() alone keeps the
    // logical plan: the pointer-jump self-join references the prior
    // round twice, so the plan tree DOUBLES per round and analysis /
    // AQE explain-string work explodes exponentially (measured OOM at
    // ~7 rounds). Rows are copied before persisting (toRdd reuses
    // UnsafeRow buffers per partition).
    def pin(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
      val rdd = ColumnBridge.internalRdd(df).map(_.copy())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (ColumnBridge.internalCreateDataFrame(df, rdd, df.schema), rdd)
    }
    // undirected, deduped edge list (kept hot: it is re-joined every round)
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var labelsRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // (1) min over own + neighbor labels; every vertex has >= 1
      // neighbor (it came from an edge), so the inner join is total
      val neighborMin = edges
        .join(labels.select(col("id").as("v"), col("cluster_id").as("__nl")),
          Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("__nl")).as("__nm"))
      val (stepped, steppedRdd) = pin(labels.join(neighborMin, Seq("id"))
        .select(col("id"),
          least(col("cluster_id"), col("__nm")).as("cluster_id"),
          (col("__nm") < col("cluster_id")).as("__chg")))
      changed = stepped.filter(col("__chg")).count()
      // (2) pointer jump: label values are themselves vertex ids, so
      // one self-join replaces label -> label(label) and halves any
      // propagation chain (no-op once a component is uniform). Labels
      // only ever decrease (min-monotone), and a label's label stays
      // inside the component, so the jump preserves the invariant.
      val cur = stepped.drop("__chg")
      val (next, nextRdd) = pin(cur
        .join(cur.select(col("id").as("cluster_id"),
          col("cluster_id").as("__g")), Seq("cluster_id"), "left")
        .select(col("id"),
          coalesce(col("__g"), col("cluster_id")).as("cluster_id")))
      nextRdd.count() // materialize before releasing parents
      steppedRdd.unpersist()
      labelsRdd.foreach(_.unpersist())
      labelsRdd = Some(nextRdd)
      labels = next
      iter += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"dedup clustering did not converge in $maxIter rounds — the pair " +
          "graph has a propagation chain longer than 2^maxIter; raise maxIter")
    labels
  }

  /** [[clusters]] joined back onto the corpus: every id gets a
    * cluster (singletons map to themselves) plus the keep flag. */
  def clusterAssignments(pairs: DataFrame, ids: DataFrame,
      idCol: String, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    val cc = clusters(pairs, aCol, bCol, maxIter)
      .withColumnRenamed("id", idCol)
    ids.select(col(idCol)).join(cc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }
}
