package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge DataFrames — the Pregel-style
  * iterated join-agg pattern (rank table joined to a pinned edge
  * table per superstep) that a corpus-curation pipeline runs at web
  * scale: domain-authority weighting of crawl sources, link-graph
  * spam scoring, citation ranking of document collections. The
  * reference has no graph surface at all (its scope stops at
  * row-group I/O; SURVEY §2) — this is a beyond-reference component
  * in the same family as [[Dedup.clusters]]' label propagation.
  *
  * Everything is INTEGER arithmetic in parts-per-million, `div`
  * flooring at the same points DuckDB's `//` floors, so results are
  * bit-stable across engines, partitionings and retry schedules —
  * the property every operator here needs to be oracle-checkable
  * (floating-point PageRank sums in shuffle-arrival order are not).
  *
  * Scale shape: the edge table is the big side — it is persisted
  * ONCE with its out-weight column pre-joined (one edges-sized
  * shuffle total, not one per iteration); each superstep is then one
  * shuffled join (rank is vertex-sized, orders of magnitude smaller)
  * plus a vertex-sized agg. Rank lineage grows linearly with
  * supersteps, so every `pinEvery` iterations the rank frame is
  * materialized to a persisted InternalRow RDD and rewrapped
  * ([[org.apache.spark.sql.graftbridge.ColumnBridge]]) — true
  * lineage truncation, same tool [[Dedup.clusters]] uses — keeping
  * the plan bounded for 100-iteration runs on billion-edge graphs.
  */
object Graph {

  /** Weighted PageRank in integer ppm. Ranks start at 1e6 per
    * vertex; each superstep a vertex `u` offers
    * `(rank(u) * w(u,v)) div outW(u)` along each out-edge and ranks
    * recombine as `((1000-dampingPpt) * 1e6) div 1000 +
    * (dampingPpt * Σ offers) div 1000`. Dangling vertices (no
    * out-edges) simply stop contributing — the plain simplified
    * PageRank variant, chosen because its per-edge flooring points
    * are engine-reproducible. Vertices = src ∪ dst of `edges`.
    *
    * Output: (id, rank_ppm) — one row per vertex. Deterministic:
    * integer sums are order-free, so shuffle/AQE scheduling cannot
    * perturb results. Overflow bound: rank_ppm ≤ |V|·1e6 and offers
    * multiply by edge weight before the div, so `max rank · max w`
    * must stay under 2^63 (~9.2e18) — ppm scale leaves ~6 orders of
    * headroom for |V|·w products at web-graph sizes.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, dampingPpt: Long = 850L,
      pinEvery: Int = 8): DataFrame =
    pageRankInt(edges, srcCol, dstCol, wCol, iterations, dampingPpt,
      pinEvery, seeds = None)

  /** Personalized (TrustRank-style) variant: the teleport mass lands
    * ONLY on `seeds` vertices — rank flows outward from a curated
    * trust set instead of uniformly, the standard crawl-curation move
    * for propagating source trust through a link graph (Gyöngyi et
    * al. 2004). `seeds = None` is plain [[pageRankInt]]; seeds not
    * present in the graph are ignored; non-seed vertices start at 0
    * and earn rank only through in-edges. The seed frame must be
    * small enough to broadcast-join against the vertex set (it is a
    * curated list by definition). */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, dampingPpt: Long,
      pinEvery: Int, seeds: Option[(DataFrame, String)]): DataFrame = {
    require(iterations >= 0 && iterations <= 200,
      s"iterations must be in [0, 200] (got $iterations)")
    require(dampingPpt >= 0 && dampingPpt <= 1000,
      s"dampingPpt must be in [0, 1000] (got $dampingPpt)")
    require(pinEvery > 0, s"pinEvery must be positive (got $pinEvery)")
    import org.apache.spark.sql.graftbridge.ColumnBridge

    // The edge projection is referenced FOUR times below (both sides
    // of the out-weight join, twice in the vertex union) — pin it for
    // the setup phase so the caller's upstream derivation (often a
    // corpus-sized window + agg) executes once, not four times, then
    // release it once the two durable pins are materialized.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Pre-join each edge with its source's total out-weight ONCE —
    // the per-superstep plan then never re-aggregates the edge table.
    val ej = e.join(e.groupBy(col("src")).agg(sum(col("w")).as("ow")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val basePpm = ((1000L - dampingPpt) * 1000000L) / 1000L
    // Per-vertex teleport base: uniform for plain PageRank, basePpm
    // on seeds / 0 elsewhere for the personalized variant. Folded
    // into the vertex pin so the loop sees one frame either way.
    val vb = (seeds match {
      case None => verts.select(col("id"), lit(basePpm).as("__base"))
      case Some((sdf, scol)) =>
        val sd = broadcast(
          sdf.select(col(scol).as("id")).distinct()
            .withColumn("__m", lit(1)))
        verts.join(sd, Seq("id"), "left")
          .select(col("id"),
            when(col("__m").isNotNull, lit(basePpm)).otherwise(lit(0L))
              .as("__base"))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    ej.count(); vb.count() // materialize through the setup pin
    e.unpersist(); verts.unpersist()

    // Initial mass mirrors the teleport support: uniform 1e6, or 1e6
    // concentrated on the seed set (non-seeds earn rank via in-edges).
    var rank = vb.select(col("id"),
      (seeds match {
        case None => lit(1000000L)
        case Some(_) =>
          when(col("__base") > 0L, lit(1000000L)).otherwise(lit(0L))
      }).as("rank_ppm"))
    var i = 0
    while (i < iterations) {
      val offers = ej
        .join(rank.select(col("id").as("src"), col("rank_ppm")), "src")
        .select(col("dst").as("id"),
          expr("(rank_ppm * w) div ow").as("__offer"))
        .groupBy(col("id")).agg(sum(col("__offer")).as("__in"))
      rank = vb.join(offers, Seq("id"), "left")
        .select(col("id"),
          (col("__base") +
            expr(s"($dampingPpt * coalesce(__in, 0L)) div 1000"))
            .as("rank_ppm"))
      i += 1
      if (i % pinEvery == 0 && i < iterations) {
        // Truncate lineage: materialize to a persisted InternalRow
        // RDD and rewrap, keeping the optimizer's input bounded on
        // long runs. Pins are LAZY — they fill on the caller's first
        // action, and earlier pins sit in later pins' lineage — so
        // none can be released here; they stay cached (LRU-managed,
        // vertex-sized) for the returned frame's lifetime.
        val rdd = ColumnBridge.internalRdd(rank).map(_.copy())
          .persist(StorageLevel.MEMORY_AND_DISK)
        rank = ColumnBridge.internalCreateDataFrame(rank, rdd, rank.schema)
      }
    }
    rank
  }

  /** Per-vertex degree/weight profile — the skew diagnosis to run
    * BEFORE any iterative graph algorithm: a vertex with a dominant
    * share of in-weight is the hot key that decides whether the
    * superstep joins need salting ([[graft.ops.Skew]]) or AQE skew
    * handling. One pass over the edge table (a tagged union of the
    * out and in projections into a single map-side-combined agg — no
    * second edge scan, no join): per vertex, distinct out/in
    * neighbor counts, total out/in weight, and self-loop weight.
    * Missing direction → 0, not null. */
  def degreeProfile(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val tagged = e.select(explode(array(
        struct(col("src").as("id"), lit("o").as("d"), col("dst").as("nb"),
          col("w"),
          when(col("src") === col("dst"), col("w")).otherwise(lit(0L))
            .as("sw")),
        struct(col("dst").as("id"), lit("i").as("d"), col("src").as("nb"),
          col("w"), lit(0L).as("sw")))).as("t"))
      .select(col("t.*"))
    tagged.groupBy(col("id"))
      .agg(
        count_distinct(when(col("d") === "o", col("nb"))).as("out_deg"),
        count_distinct(when(col("d") === "i", col("nb"))).as("in_deg"),
        coalesce(sum(when(col("d") === "o", col("w"))), lit(0L))
          .as("out_w"),
        coalesce(sum(when(col("d") === "i", col("w"))), lit(0L))
          .as("in_w"),
        coalesce(sum(col("sw")), lit(0L)).as("self_w"))
  }

  /** Deterministic random walks — node2vec/DeepWalk-style sequence
    * sampling for graph-embedding training data (Grover & Leskovec
    * 2016 with p=q=1, i.e. uniform first-order steps). Every vertex
    * starts `walksPerVertex` walks; at step t a walk at `u` moves to
    * u's neighbor with index `H(start, walkId, t) mod deg(u)`, where
    * H is the first 60 bits of md5 — the repo's standard
    * engine-reproducible randomness (a per-task PRNG would change
    * results under retries/repartitioning; md5 cannot). Neighbor
    * indexing is dst-sort-order over the DISTINCT neighbor set;
    * weights don't bias the step (uniform choice — see
    * [[weightedRandomWalks]] for weight-proportional steps). A walk
    * reaching a dangling vertex simply ends early.
    *
    * Output: (start, walk_id, step, node), step 0 = the start row.
    *
    * Scale shape: the indexed adjacency (edge-sized: row_number +
    * count windows partitioned by src) is pinned once; each step is
    * ONE join of the walk frontier (|V|·walksPerVertex rows) against
    * it — frontier-sized exchanges, never edge re-aggregation. The
    * hash condition rides the join, so the matched row count equals
    * the frontier size. `steps` is bounded small (walk windows for
    * skip-gram training are ≤ ~10); the union-of-steps plan stays
    * linear in `steps`. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      steps: Int, walksPerVertex: Int = 1): DataFrame = {
    require(steps >= 0 && steps <= 32,
      s"steps must be in [0, 32] (got $steps)")
    require(walksPerVertex > 0 && walksPerVertex <= 1024,
      s"walksPerVertex must be in [1, 1024] (got $walksPerVertex)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wsrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val adj = e
      .withColumn("idx",
        row_number().over(wsrc.orderBy(col("dst"))) - 1)
      .withColumn("deg", count(lit(1)).over(wsrc))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val starts = verts
      .select(col("id").as("start"),
        explode(sequence(lit(0L), lit(walksPerVertex - 1L)))
          .as("walk_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count(); starts.count() // materialize through the edge pin
    e.unpersist()

    var out = starts.select(col("start"), col("walk_id"),
      lit(0).as("step"), col("start").as("node"))
    var frontier = starts.select(col("start"), col("walk_id"),
      col("start").as("node"))
    var t = 1
    while (t <= steps) {
      val pick = conv(substring(md5(concat(
          col("start").cast("string"), lit(":"),
          col("walk_id").cast("string"),
          lit(s":$t"))), 1, 15), 16, 10).cast("long") % col("deg")
      frontier = frontier
        .join(adj, frontier("node") === adj("src") &&
          adj("idx") === pick)
        .select(col("start"), col("walk_id"), col("dst").as("node"))
      out = out.union(frontier.select(col("start"), col("walk_id"),
        lit(t).as("step"), col("node")))
      t += 1
    }
    out
  }

  /** [[randomWalks]] with WEIGHT-PROPORTIONAL steps — full
    * first-order node2vec: at `u`, neighbor `v` is chosen with
    * probability `w(u,v) / outW(u)` by landing the md5 draw
    * `H mod outW(u)` in v's cumulative-weight interval
    * `[lo(v), lo(v) + w(v))` over the dst-sorted adjacency.
    * Multi-edges collapse by summing weights. Same determinism,
    * output shape, dangling behavior and scale shape as the uniform
    * variant — the adjacency carries a windowed cumulative sum
    * instead of a row_number, and the step join's interval predicate
    * still matches exactly one adjacency row per frontier row. */
  def weightedRandomWalks(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, steps: Int,
      walksPerVertex: Int = 1): DataFrame = {
    require(steps >= 0 && steps <= 32,
      s"steps must be in [0, 32] (got $steps)")
    require(walksPerVertex > 0 && walksPerVertex <= 1024,
      s"walksPerVertex must be in [1, 1024] (got $walksPerVertex)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wsrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val byDst = wsrc.orderBy(col("dst"))
    val adj = e
      .withColumn("lo", coalesce(
        sum(col("w")).over(byDst.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("ow", sum(col("w")).over(wsrc))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val starts = verts
      .select(col("id").as("start"),
        explode(sequence(lit(0L), lit(walksPerVertex - 1L)))
          .as("walk_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count(); starts.count() // materialize through the edge pin
    e.unpersist()

    var out = starts.select(col("start"), col("walk_id"),
      lit(0).as("step"), col("start").as("node"))
    var frontier = starts.select(col("start"), col("walk_id"),
      col("start").as("node"))
    var t = 1
    while (t <= steps) {
      val pick = conv(substring(md5(concat(
          col("start").cast("string"), lit(":"),
          col("walk_id").cast("string"),
          lit(s":$t"))), 1, 15), 16, 10).cast("long") % col("ow")
      frontier = frontier
        .join(adj, frontier("node") === adj("src") &&
          pick >= adj("lo") && pick < adj("lo") + adj("w"))
        .select(col("start"), col("walk_id"), col("dst").as("node"))
      out = out.union(frontier.select(col("start"), col("walk_id"),
        lit(t).as("step"), col("node")))
      t += 1
    }
    out
  }

  /** Skip-gram training pairs from [[randomWalks]] output: for every
    * walk, all ordered (center, context) node pairs within `window`
    * steps of each other (excluding the center itself), aggregated to
    * corpus-wide counts — the positive-pair tensor skip-gram/SGNS
    * graph-embedding training consumes. The self-join keys on the
    * walk identity, so join groups are walk-sized (≤ steps+1 rows) —
    * no quadratic blowup beyond the window, and the pair agg is
    * map-side-combined down to |V|² at most. */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window > 0, s"window must be positive (got $window)")
    val a = walks.select(col("start"), col("walk_id"),
      col("step").as("__sa"), col("node").as("center"))
    val b = walks.select(col("start"), col("walk_id"),
      col("step").as("__sb"), col("node").as("context"))
    a.join(b, Seq("start", "walk_id"))
      .filter(col("__sa") =!= col("__sb") &&
        abs(col("__sa") - col("__sb")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
  }

  /** Event-type transition edges from an event log: one weighted
    * directed edge per ordered pair of CONSECUTIVE event types within
    * a user's timeline (`lead` over (user, ts, tie)), weight = number
    * of occurrences corpus-wide. The standard Markov-transition
    * derivation feeding [[pageRankInt]] — at scale the window runs
    * one shuffle on the partition key and the edge agg is
    * map-side-combined down to |types|² rows. */
  def transitionEdges(events: DataFrame, keyCol: String, typeCol: String,
      orderCol: Column, tieCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
    events.select(col(typeCol).as("src"),
        lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }
}
