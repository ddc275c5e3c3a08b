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
    * Determinism precondition: `orderCol` must be UNIQUE within each
    * key (callers pass the doc id). With ties, `row_number` keeps an
    * arbitrary tied row and a retry/AQE reshuffle may keep a
    * different one — the nondeterministic-row_number class the
    * oracle conventions flag.
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

  /** Exact text dedup keyed on the normalized-text fingerprint.
    * NULL-text policy: a null text has no content to compare, so
    * each null-text doc is its OWN singleton (keyed by id) — window
    * null-key grouping would otherwise collapse every null-text doc
    * into one cluster and silently delete all but one. (Genuinely
    * empty text "" still fingerprints normally and dedups.) */
  def exactByText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    exact(df, nullSafeFingerprint(idCol, textCol), col(idCol))

  /** Group-shaped variant: distinct fingerprints with the surviving
    * (minimum) id and the duplicate count — the "dedup report".
    * Same null-text singleton policy as [[exactByText]]. */
  def exactReport(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.groupBy(nullSafeFingerprint(idCol, textCol).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Content fingerprint with the null-text singleton policy: null
    * text keys by the doc's own id under a prefix no md5 hex can
    * collide with. */
  private def nullSafeFingerprint(idCol: String,
      textCol: String): Column =
    coalesce(TextAnalysis.fingerprint(col(textCol)),
      concat(lit("null-text:"), col(idCol).cast("string")))

  /** Changelog compaction — the CDC "upsert + tombstone" collapse
    * that turns an append-only event log into current state: per
    * key, the row with the greatest (orderCol, tieCol) wins; winners
    * matching `tombstone` are deletions and drop out entirely. The
    * standard log-compacted-topic / CDC-merge semantics (Kafka log
    * compaction; Delta/Hudi merge), as a pure Spark agg.
    *
    * Output: one row per surviving key with `keyCols` plus the
    * winner's `payloadCols`, via a single `max(struct(order, tie,
    * payload...))` — ONE map-side-combined agg over the log, never a
    * per-key window sort (the naive `row_number` spelling shuffles
    * and sorts the whole log; the argmax reduces it to key-sized
    * partials first — the shape that matters when the changelog is
    * 100 TB and current state is gigabytes). `(orderCol, tieCol)`
    * must be a total order per key for determinism. */
  def compactLatest(df: DataFrame, keyCols: Seq[String],
      orderCol: Column, tieCol: Column, payloadCols: Seq[String],
      tombstone: Column): DataFrame = {
    // the packed struct reserves __o/__t, and payload fields are
    // re-read as col("__w.<name>") — refuse names that would alias
    // the reserved slots or parse as a nested path
    require(!payloadCols.exists(c => c == "__o" || c == "__t"),
      "payload columns must not be named __o/__t (reserved)")
    require(payloadCols.forall(c => !c.contains(".")),
      s"payload column names must not contain '.' — col(\"__w.name\") " +
        "would parse it as a nested path")
    val packed = struct(
      (orderCol.as("__o") +: tieCol.as("__t") +:
        payloadCols.map(c => col(c).as(c))): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__w"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__w.$c").as(c)): _*)
      // tombstone references the winner's payload columns by name;
      // null-safe: a predicate evaluating to NULL (e.g. a null
      // event_type under === ) must KEEP the key — !NULL is NULL and
      // a bare filter would silently delete it
      .filter(!coalesce(tombstone, lit(false)))
  }

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
    * jumping, ONE Spark action per round: every vertex takes the min
    * of its own and its neighbors' labels (join edges⋈labels + agg),
    * then labels chase one level of indirection (a label⋈label
    * self-join), so any propagation chain shrinks geometrically and
    * convergence is O(log diameter) rounds, not O(diameter) —
    * near-dup clusters are near-cliques (diameter ≈ 2) in practice.
    *
    * The pair pipeline is materialized exactly once up front (pairs
    * are usually an expensive LSH product; an unpinned plan would
    * re-run it per reference), and each round is pinned the same way,
    * so a round's job reads only cached rows. Pinned rounds carry NO
    * partitioning claim on purpose: labels are small relative to the
    * corpus, and leaving the exchanges visible lets AQE broadcast the
    * join sides and coalesce the tiny shuffles — measured 3× faster
    * than a declared-hash co-partitioned loop, which forces 32-way
    * sort-merge joins (a stats-less pinned plan can never be chosen
    * for broadcast). The jump self-join references the min-step
    * subplan twice; its shuffled inputs are reused (ReusedExchange),
    * the post-shuffle join CPU doubles — the price of one action per
    * round instead of three. Convergence
    * is decided by the round's change count, where "changed" means
    * moved by EITHER the min step OR the jump (a jump-only change
    * must re-enter the frontier so its new label is offered to
    * neighbors next round). changed == 0 is sound: no label
    * decreased by a neighbor and none chased indirection, so
    * adjacent labels are all equal and every component is uniform
    * at its minimum id. Non-convergence
    * within `maxIter` THROWS rather than returning a partial
    * clustering — a half-propagated label is a silently wrong answer.
    * All shuffles are plain hash exchanges on id; nothing is ever
    * collected to the driver. The final round's pinned RDD stays
    * persisted while the returned DataFrame is in use; Spark's
    * ContextCleaner unpersists it once the result is unreferenced.
    *
    * The loop scopes `spark.sql.shuffle.partitions` down to the
    * graph-sized value on a `newSession()` — same SparkContext and
    * cache, ISOLATED SQL conf — so queries planned concurrently on
    * the caller's session keep their full width. The alternative
    * (per-plan repartition hints) was measured 3× slower because
    * declared partitioning suppresses AQE's broadcast/coalesce
    * decisions (see above).
    */
  def clusters(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // TRUE lineage truncation per round ([[ColumnBridge.pinned]]):
    // the pointer-jump self-joins reference the prior round
    // repeatedly, so an unpinned plan tree grows exponentially with
    // rounds (measured OOM at ~7 rounds)
    def pin(df: DataFrame)
        : (DataFrame,
           org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) =
      ColumnBridge.pinned(df)
    // Pin the DIRECTED pairs first (one action): the undirected union
    // references the pair plan twice, and the per-round joins would
    // otherwise re-run the whole candidate pipeline every round.
    // These plan under the CALLER's session at its full width — the
    // pair pipeline is corpus-sized; only the label rounds are
    // graph-sized.
    val (p0, p0Rdd) = pin(pairs.select(col(aCol).as("u"), col(bCol).as("v")))
    val (edges0, edgesRdd) = pin(
      p0.union(p0.select(col("v").as("u"), col("u").as("v"))).distinct())
    val edgeCount = edgesRdd.count() // materialize (pulls p0 through its pin)
    p0Rdd.unpersist()
    // Round parallelism sized to the GRAPH, not the corpus: the label
    // table is bounded by the paired-vertex count, typically orders
    // of magnitude below the corpus. A 1450-edge graph shuffled 32
    // ways pays ~32× the task-launch overhead for no parallelism;
    // billions of edges keep the session's full width. ~2M edges per
    // partition keeps a partition's join state comfortably in memory.
    val spark = pairs.sparkSession
    val roundParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      edgeCount / 2000000L + 1L)).toInt
    // Conf-scoped session for the rounds: same SparkContext (the
    // pinned RDDs cross over freely), isolated SQL conf with the
    // caller's runtime confs cloned — nothing planned concurrently
    // on the caller's session sees the reduced width.
    val scoped = graft.GraftSession.scoped(spark, roundParts)
    val edges = ColumnBridge.internalCreateDataFrame(
      scoped, edgesRdd, edges0.schema)
    // init = the first min step fused into one agg over edges: with
    // identity labels, each vertex's neighbor-min is simply min(v).
    // __chg marks the round's FRONTIER (vertices whose label moved).
    val init = pin(
      edges.groupBy(col("u")).agg(min(col("v")).as("__mn"))
        .select(col("u").as("id"),
          least(col("u"), col("__mn")).as("cluster_id"),
          (col("__mn") < col("u")).as("__chg")))
    var pinned = init._1
    var labelsRdd
        : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
      init._2
    var changed = pinned.filter(col("__chg")).count()
    var iter = 0
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    // error hygiene: a mid-loop job failure (or the non-convergence
    // throw below) must not strand the round's cache blocks in a
    // long-lived session — on ANY throw, unpersist both live pins
    // before propagating (success keeps labelsRdd persisted for the
    // returned frame; ContextCleaner reclaims it when unreferenced)
    try {
    while (changed > 0 && iter < maxIter) {
      val tRound = System.nanoTime()
      val labels = pinned.drop("__chg")
      // FRONTIER min step: labels only decrease and least() folds a
      // neighbor's offer permanently, so a vertex can only learn
      // something new from a neighbor whose label changed LAST round
      // — re-offering unchanged labels is provably redundant. The
      // edges join therefore touches only the frontier's adjacency;
      // late rounds (frontier → 0) do near-zero join work instead of
      // re-walking the whole graph. Left join + coalesce because a
      // vertex with no frontier neighbor simply keeps its label.
      val delta = pinned.filter(col("__chg"))
        .select(col("id").as("v"), col("cluster_id").as("__nl"))
      val neighborMin = edges.join(delta, Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("__nl")).as("__nm"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          // least() ignores NULLs, so a frontier-less vertex
          // (__nm null) keeps its own label with no coalesce needed
          least(col("cluster_id"), col("__nm")).as("cluster_id"),
          col("cluster_id").as("__prev"))
      // pointer jump: label values are themselves vertex ids, so a
      // self-join replaces label -> label(label), shrinking any
      // propagation chain (no-op once a component is uniform). Labels
      // only ever decrease (min-monotone), and a label's label stays
      // inside the component, so the jump preserves the invariant.
      // The jump's map side must be the FULL stepped mapping (a
      // vertex may have just acquired a label whose own label went
      // stale rounds ago), so this join is the O(V) term each round;
      // the map side keys by id (unique), so the left join is 1:1.
      val jumped = stepped
        .join(stepped.select(col("id").as("cluster_id"),
          col("cluster_id").as("__g")), Seq("cluster_id"), "left")
        .select(col("id"),
          coalesce(col("__g"), col("cluster_id")).as("cluster_id"),
          col("__prev"))
      // __chg = moved this round by EITHER step (a jump-only change
      // must still be offered to neighbors next round).
      val (next, nextRdd) = pin(jumped
        .select(col("id"), col("cluster_id"),
          (col("cluster_id") < col("__prev")).as("__chg")))
      changed = next.filter(col("__chg")).count() // the round's one action
      labelsRdd.unpersist()
      labelsRdd = nextRdd
      pinned = next
      iter += 1
      if (debug) {
        // scalastyle:off println
        println(f"[graft-cc] round $iter changed=$changed " +
          f"took=${(System.nanoTime() - tRound) / 1e9}%.2fs")
        // scalastyle:on println
      }
    }
    edgesRdd.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"dedup clustering did not converge in $maxIter rounds — the pair " +
          "graph has a propagation chain longer than 4^maxIter; raise maxIter")
    } catch {
      case e: Throwable =>
        labelsRdd.unpersist(false); edgesRdd.unpersist(false)
        throw e
    }
    // Rewrap the final labels onto the CALLER's session: the loop's
    // frames plan under the scoped graph-width session, and a result
    // still bound to it would plan every downstream shuffle a caller
    // builds on top (e.g. a corpus-sized join) at roundParts — often
    // ONE partition.
    ColumnBridge.internalCreateDataFrame(spark, labelsRdd, pinned.schema)
      .drop("__chg")
  }

  /** [[clusters]] joined back onto the corpus: every NON-NULL id
    * gets a cluster (singletons map to themselves) plus the keep
    * flag. Null ids are dropped explicitly — they can never
    * equi-join the cluster table, and passing them through would
    * emit keep = NULL, a row every boolean filter silently drops. */
  def clusterAssignments(pairs: DataFrame, ids: DataFrame,
      idCol: String, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    val cc = clusters(pairs, aCol, bCol, maxIter)
      .withColumnRenamed("id", idCol)
    ids.select(col(idCol)).filter(col(idCol).isNotNull)
      .join(cc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }

  /** Duplicate-cluster size histogram — the one-page answer to "how
    * duplicated is this corpus": for every exact-dup cluster size s
    * (fingerprint multiplicity), the number of clusters, the docs
    * they hold (s·n_clusters), and those docs' share of the corpus
    * in exact ppm. Size 1 = unique docs; the tail rows are the mass
    * a dedup pass would reclaim. The distribution (not just a dup
    * rate) is what decides policy: a 2×-heavy corpus dedups cheap,
    * a few 10⁵-sized clusters signal mirror domains to blocklist.
    *
    * Scale shape: fingerprint agg (corpus → cluster table), size
    * agg (cluster table → ≤ max-multiplicity rows), then the share
    * attaches via a broadcast 1-row total. All map-side combined. */
  def clusterSizeHistogram(df: DataFrame, textCol: String): DataFrame = {
    val hist = df
      .select(graft.ops.TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy(col("__fp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    hist.crossJoin(broadcast(hist.agg(sum(col("n_docs")).as("__tot"))))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        expr("(n_docs * 1000000) div __tot").as("doc_share_ppm"))
  }

  /** Cross-source duplicate overlap matrix — WHICH sources mirror
    * each other, not just how much duplication exists (q125 gives
    * the per-source dup rate; this names the pairs): for every
    * source pair, the count of exact-dup fingerprints present in
    * BOTH, plus each side's distinct-fingerprint count and the
    * overlap coefficient `shared·1e6 div min(na, nb)` in ppm. The
    * table a curation run reads before deciding which crawl feed is
    * a re-host and which to keep.
    *
    * Scale shape: the corpus reduces to DISTINCT (fingerprint,
    * source) once (fp-keyed exchange — the q09 dedup floor); the
    * pair expansion is a fp-keyed self-join whose per-fp fan-out is
    * bounded by C(#sources, 2), sources being categorical by
    * contract; output is source-pair-sized. Null texts fingerprint
    * as a value like any other (two sources both carrying null-text
    * docs DO share that content class). */
  def sourceOverlapMatrix(df: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val fps = df.filter(col(srcCol).isNotNull)
      .select(graft.ops.TextAnalysis
          .fingerprint(coalesce(col(textCol), lit(""))).as("__fp"),
        col(srcCol).as("__src"))
      .distinct()
    val counts = fps.groupBy(col("__src"))
      .agg(count(lit(1)).as("__nfp"))
    val pairs = fps.as("a")
      .join(fps.as("b"),
        col("a.__fp") === col("b.__fp") &&
          col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"),
        col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(counts.select(col("__src").as("source_a"),
        col("__nfp").as("na"))), "source_a")
      .join(broadcast(counts.select(col("__src").as("source_b"),
        col("__nfp").as("nb"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("na"), col("nb"),
        expr("(n_shared * 1000000) div least(na, nb)")
          .as("overlap_ppm"))
  }

  /** B-cubed cluster-quality evaluation (Bagga & Baldwin 1998) —
    * the standard extrinsic score for a dedup/entity clustering
    * against gold labels, and the one that (unlike pairwise F1)
    * weights every ITEM equally instead of quadratically favoring
    * big clusters. Per item i: precision_i = |C(i)∩L(i)| / |C(i)|,
    * recall_i = |C(i)∩L(i)| / |L(i)| where C is the item's predicted
    * cluster and L its gold class.
    *
    * Exactness: per-item scores are integral-div ppm
    * ((1e6·|C∩L|) div |C|) and the report sums those integers —
    * bit-reproducible across engines (a float mean would depend on
    * reduction order). Callers derive avg precision/recall as
    * sum_p_ppm / n_items.
    *
    * Scale: three hash-aggregations (cluster sizes, class sizes,
    * intersection sizes) + three key joins back onto the items —
    * every frame is bounded by distinct keys, nothing is collected.
    * Output: one row per gold label (label, n_items, sum_p_ppm,
    * sum_r_ppm). */
  def bcubed(items: DataFrame, clusterCol: Column,
      labelCol: Column): DataFrame = {
    val base = items.select(clusterCol.as("__c"), labelCol.as("__l"))
      .filter(col("__c").isNotNull && col("__l").isNotNull)
    val cs = base.groupBy(col("__c")).agg(count(lit(1)).as("__csz"))
    val ls = base.groupBy(col("__l")).agg(count(lit(1)).as("__lsz"))
    val is = base.groupBy(col("__c"), col("__l"))
      .agg(count(lit(1)).as("__isz"))
    base.join(is, Seq("__c", "__l"))
      .join(cs, Seq("__c")).join(ls, Seq("__l"))
      .select(col("__l"),
        expr("(1000000 * __isz) div __csz").as("__p"),
        expr("(1000000 * __isz) div __lsz").as("__r"))
      .groupBy(col("__l").as("label"))
      .agg(count(lit(1)).as("n_items"), sum(col("__p")).as("sum_p_ppm"),
        sum(col("__r")).as("sum_r_ppm"))
  }
}
