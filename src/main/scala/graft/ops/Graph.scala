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

  /** Degree-oriented triangle counting — the clustering-coefficient /
    * spam-farm signal over link graphs (Suri & Vassilvitskii 2011's
    * MapReduce formulation). Edges are canonicalized undirected
    * (least, greatest), self-loops dropped, then each edge is oriented
    * from its (degree, id)-smaller endpoint to the larger one. Every
    * triangle then has EXACTLY one vertex with two out-edges (the
    * orientation order is total), so the wedge join counts each
    * triangle once — and wedge fan-out at a degree-d hub is bounded by
    * its ORIENTED out-degree, O(sqrt(|E|)) by the standard argument,
    * not d². That re-orientation is precisely why a 100 TB link graph
    * with celebrity hubs doesn't quadratically explode the first join.
    *
    * Output: (id, tri) per vertex (0 for triangle-free vertices),
    * tri = number of triangles the vertex participates in.
    *
    * Scale shape: one distinct over canonical edges, one vertex-sized
    * degree agg joined back twice (broadcast at dim scale; shuffled
    * hash join on the edge key otherwise), then wedge join + closing
    * join both keyed on vertex ids — AQE handles residual skew; the
    * final per-vertex agg is map-side combined. */
  def triangles(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e0.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Orient each canonical edge low→high in (degree, id) order.
    val o = e0
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Materialize the two durable pins (oriented edges + degrees),
    // then release the canonical-edge pin — nothing downstream reads
    // it. deg/o stay cached (LRU-managed, edge-sized at most) for the
    // returned frame's lifetime, same convention as [[pageRankInt]].
    o.count(); deg.count()
    e0.unpersist()
    val tri = o.as("x")
      .join(o.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("w0"), col("x.v").as("w1"),
        col("y.v").as("w2"))
      // closing oriented edge exists in exactly one direction
      .join(o.as("z"),
        (col("w1") === col("z.u") && col("w2") === col("z.v")) ||
        (col("w2") === col("z.u") && col("w1") === col("z.v")))
      .select(col("w0"), col("w1"), col("w2"))
    val perVertex = tri
      .select(explode(array(col("w0"), col("w1"), col("w2"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
    val out = deg.select(col("id"))
      .join(perVertex, Seq("id"), "left")
      .select(col("id"), coalesce(col("tri"), lit(0L)).as("tri"))
    out
  }

  /** Deterministic synchronous label propagation — community
    * detection for corpus partitioning (Raghavan et al. 2007 made
    * reproducible): labels start as vertex ids; each superstep every
    * vertex adopts the label carrying the greatest total incident
    * weight among its (undirected) neighbors, ties broken by the
    * GREATEST label — a total order, so results are independent of
    * scheduling, partitioning and retries, unlike the paper's
    * random-order asynchronous sweep. Synchronous LPA can oscillate
    * on bipartite structures; bounded `iterations` (the useful range
    * for curation is small) and the deterministic tie-break make
    * every run reproduce bit-for-bit, oscillation included.
    *
    * Output: (id, label) per vertex after `iterations` supersteps.
    *
    * Scale shape: the symmetrized edge table is pinned once; each
    * superstep is one join of the vertex-sized label frame against it
    * plus two map-side-combined aggs ((id, label) weight, then the
    * arg-max via a single `max(struct(w, label))` — no window, no
    * per-vertex sort). Lineage is truncated through ColumnBridge
    * every `pinEvery` supersteps, same as [[pageRankInt]]. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, pinEvery: Int = 8): DataFrame = {
    require(iterations >= 0 && iterations <= 100,
      s"iterations must be in [0, 100] (got $iterations)")
    require(pinEvery > 0, s"pinEvery must be positive (got $pinEvery)")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0 && col("src") =!= col("dst"))
    val sym = e.select(explode(array(
        struct(col("src").as("id"), col("dst").as("nb"), col("w")),
        struct(col("dst").as("id"), col("src").as("nb"), col("w"))))
        .as("t"))
      .select(col("t.*"))
      .groupBy(col("id"), col("nb")).agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    var lab = sym.select(col("id")).distinct()
      .select(col("id"), col("id").as("label"))
    var i = 0
    while (i < iterations) {
      lab = sym
        .join(lab.select(col("id").as("nb"), col("label")), "nb")
        .groupBy(col("id"), col("label"))
        .agg(sum(col("w")).as("lw"))
        .groupBy(col("id"))
        .agg(max(struct(col("lw"), col("label"))).as("m"))
        .select(col("id"), col("m.label").as("label"))
      i += 1
      if (i % pinEvery == 0 && i < iterations) {
        val rdd = ColumnBridge.internalRdd(lab).map(_.copy())
          .persist(StorageLevel.MEMORY_AND_DISK)
        lab = ColumnBridge.internalCreateDataFrame(lab, rdd, lab.schema)
      }
    }
    lab
  }

  /** Neighborhood link prediction over an undirected graph — the
    * candidate generator for "related items" / "you may also like":
    * for every NON-adjacent vertex pair sharing at least `minCommon`
    * neighbors, the three classic affinity scores (Liben-Nowell &
    * Kleinberg 2003; Zhou et al. 2009): common-neighbor count `cn`,
    * resource-allocation index `ra_ppm` = Σ_z 1e6 div deg(z) over
    * shared neighbors z (the integer-exact stand-in for Adamic-Adar's
    * 1/log deg — same ranking intent, engine-reproducible), and
    * Jaccard `jacc_ppm` = cn·1e6 div (deg(a)+deg(b)-cn).
    *
    * Scale shape: candidate pairs come from ONE self-join of the
    * symmetrized adjacency keyed on the shared neighbor — join groups
    * are neighbor-list-sized, and centers above `maxDegree` are
    * dropped first (a degree-d hub contributes d² wedge pairs and
    * near-zero signal: every celebrity co-neighbor pair — the
    * standard cap in production candidate generation; dropped-center
    * count is knowable from [[degreeProfile]]). The existing-edge
    * anti-join and the two degree joins are all vertex- or
    * candidate-sized. */
  def linkPredict(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Long = 1L, maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1 (got $maxDegree)")
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = e0.select(explode(array(
        struct(col("a").as("id"), col("b").as("nb")),
        struct(col("b").as("id"), col("a").as("nb")))).as("t"))
      .select(col("t.*"))
    val deg = sym.groupBy(col("id")).agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()
    val centers = sym.join(
      deg.filter(col("d") <= maxDegree).select(col("id")), "id")
    val cand = centers.as("s1")
      .join(centers.as("s2"),
        col("s1.id") === col("s2.id") && col("s1.nb") < col("s2.nb"))
      .select(col("s1.id").as("z"), col("s1.nb").as("a"),
        col("s2.nb").as("b"))
      .join(deg.select(col("id").as("z"), col("d").as("dz")), "z")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000L div dz")).as("ra_ppm"))
      .filter(col("cn") >= minCommon)
      .join(e0, Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(col("a").as("item_a"), col("b").as("item_b"), col("cn"),
        col("ra_ppm"),
        expr("(cn * 1000000L) div (da + db - cn)").as("jacc_ppm"))
  }

  /** Bounded-round k-core peeling (Matula & Beck 1983, the
    * distributed formulation): repeatedly delete vertices whose
    * degree in the CURRENT induced subgraph is below `k`. After
    * `rounds` sweeps the survivor set is a superset of the true
    * k-core, equal to it once a sweep deletes nothing — callers pick
    * `rounds` by graph diameter expectations (peeling converges in
    * few sweeps on power-law graphs; the degeneracy ordering needs
    * |V| rounds only on pathological paths). The dense-core signal
    * for curation: spam link farms and template clusters live in
    * high-k cores.
    *
    * Output: surviving (id, deg) — `deg` is the QUALIFYING degree,
    * i.e. within the subgraph induced by the previous sweep's
    * survivors (the value the final `>= k` test saw).
    *
    * Scale shape: each sweep is one vertex-sized degree agg plus two
    * semi-joins of the edge table against the survivor set; the edge
    * frame shrinks monotonically, and lineage is truncated through
    * the per-sweep persist handoff (previous pin released as soon as
    * the next materializes). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50] (got $rounds)")
    var sym = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .select(explode(array(
        struct(col("a").as("id"), col("b").as("nb")),
        struct(col("b").as("id"), col("a").as("nb")))).as("t"))
      .select(col("t.*"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    var deg = sym.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var r = 1
    while (r < rounds) {
      val keep = deg.filter(col("deg") >= k).select(col("id"))
      val next = sym.join(keep, "id")
        .join(keep.select(col("id").as("nb")), "nb")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      sym.unpersist()
      sym = next
      deg = sym.groupBy(col("id")).agg(count(lit(1)).as("deg"))
      r += 1
    }
    deg.filter(col("deg") >= k)
  }

  /** Market-basket co-occurrence pairs — the item-item edge builder
    * for co-purchase / co-visitation graphs (the input to
    * collaborative-filter candidate generation and to
    * [[pageRankInt]]-style item ranking). Canonical unordered pairs
    * (a < b) of DISTINCT items within a basket, counted corpus-wide,
    * pruned at `minCount` before leaving the agg.
    *
    * Scale shape: one distinct on (basket, item), then a self-join
    * keyed on the basket id — join groups are basket-sized, so the
    * quadratic blowup is bounded by `maxBasket` (baskets above it are
    * dropped ENTIRELY first: a 10k-item crawl-artifact basket would
    * otherwise contribute 50M pairs and its pairs are uninformative
    * anyway — the standard cap in co-occurrence mining). The pair agg
    * is map-side combined down to the distinct-pair vocabulary. */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 1L, maxBasket: Int = 1000): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2 (got $maxBasket)")
    val bi = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("it").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ok = bi.groupBy(col("bk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBasket)
      .select(col("bk"))
    // bi is read three times (basket-size census + both join sides);
    // the pin stays cached (LRU-managed) for the result's lifetime.
    val b = bi.join(ok, "bk")
    b.as("x").join(b.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("item_a"), col("y.it").as("item_b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Degree-assortativity raw moments (Newman 2002) — the exact
    * integer sufficient statistics for the degree-degree Pearson
    * correlation over the symmetrized edge set: n, Σx, Σy, Σxy,
    * Σx², Σy² with x = deg(source endpoint), y = deg(other
    * endpoint), every ordered edge direction counted once (the
    * standard symmetric convention, so Σx = Σy). The correlation
    * itself is a float ratio the CALLER derives; shipping moments
    * keeps the operator engine-exact and mergeable across shards
    * (moments add; correlations don't). Positive assortativity =
    * hub-hub linking (social-graph shape), negative = hub-leaf
    * (web/crawl shape) — a one-row graph-health fingerprint.
    *
    * Scale shape: one degree agg + two vertex-keyed joins onto the
    * edge list + one scalar agg — all map-side combined. */
  def assortativityMoments(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val sym = e0.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("t"))
      .select(col("t.*"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("id"))
      .agg(count(lit(1)).as("d"))
    sym
      .join(deg.select(col("id").as("u"), col("d").as("x")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("y")), "v")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y") * col("y")).as("sum_y2"))
  }

  /** Distinct reach within two hops — the neighborhood-size feature
    * (|{w : 0 < dist(v,w) <= 2}|) feeding graph-feature tables and
    * sampling-fanout estimates for GNN-style training. One wedge
    * join over the symmetrized adjacency unioned with the 1-hop
    * set, one distinct, one count — hub centers above `maxDegree`
    * don't relay 2-hop paths (same cap doctrine as [[linkPredict]]:
    * a celebrity hub makes everyone 2-hop-adjacent and the count
    * stops meaning anything).
    *
    * Output: (id, reach1, reach2) — distinct 1-hop and <=2-hop
    * neighbor counts (self excluded). */
  def twoHopReach(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1 (got $maxDegree)")
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val sym = e0.select(explode(array(
        struct(col("a").as("id"), col("b").as("nb")),
        struct(col("b").as("id"), col("a").as("nb")))).as("t"))
      .select(col("t.*"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    val deg = sym.groupBy(col("id")).agg(count(lit(1)).as("d"))
    val relay = sym.join(
      deg.filter(col("d") <= maxDegree).select(col("id").as("nb")), "nb")
    val hop2 = relay.as("x").join(sym.as("y"),
        col("x.nb") === col("y.id") && col("x.id") =!= col("y.nb"))
      .select(col("x.id").as("id"), col("y.nb").as("w"))
    val reach2 = sym.select(col("id"), col("nb").as("w")).union(hop2)
      .distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("reach2"))
    deg.select(col("id"), col("d").as("reach1"))
      .join(reach2, "id")
  }

  /** Frequent triple mining over baskets — the 3-itemset step of
    * Apriori (Agrawal & Srikant 1994): canonical (a < b < c) item
    * triples co-occurring in at least `minSupport` baskets. Items
    * are pre-pruned to those in a frequent pair (the Apriori
    * antimonotonicity prune: a triple's support is bounded by its
    * pairs'), so the cubic enumeration runs over the reduced
    * item set only.
    *
    * Scale shape: the basket self-joins key on the basket id — join
    * groups are basket-sized and the `maxBasket` cap (shared with
    * [[basketPairs]]) bounds the per-basket cube; the triple agg is
    * map-side combined. For k-itemsets beyond 3, iterate the same
    * prune-join step. */
  def basketTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1 (got $minSupport)")
    val bi = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("it").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ok = bi.groupBy(col("bk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBasket)
      .select(col("bk"))
    val b0 = bi.join(ok, "bk")
    // Apriori prune: keep only items appearing in a frequent pair
    val fp = b0.as("x").join(b0.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
    val keep = fp.select(col("a").as("it"))
      .union(fp.select(col("b").as("it"))).distinct()
    val b = b0.join(keep, "it").select(col("bk"), col("it"))
    b.as("x")
      .join(b.as("y"), col("x.bk") === col("y.bk") &&
        col("x.it") < col("y.it"))
      .join(b.as("z"), col("x.bk") === col("z.bk") &&
        col("y.it") < col("z.it"))
      .groupBy(col("x.it").as("item_a"), col("y.it").as("item_b"),
        col("z.it").as("item_c"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
  }

  /** Event-type transition edges from an event log: one weighted
    * directed edge per ordered pair of CONSECUTIVE event types within
    * a user's timeline (`lead` over (user, ts, tie)), weight = number
    * of occurrences corpus-wide. The standard Markov-transition
    * derivation feeding [[pageRankInt]] — at scale the window runs
    * one shuffle on the partition key and the edge agg is
    * map-side-combined down to |types|² rows. */
  /** HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) in exact
    * integers. Per superstep: auth_raw(v) = Σ_{u→v} hub(u)·w(u,v),
    * renormalized, then hub_raw(u) = Σ_{u→v} auth_new(v)·w(u,v),
    * renormalized — the classic sequential update (power iteration on
    * AᵀA). Normalization is parts-per-million OF THE MAX raw score
    * (L∞) instead of the paper's L2 norm: same fixed-point direction,
    * but the flooring point is a plain integral divide, so any
    * engine/replay/oracle reproduces every round bit-for-bit (the
    * moments-not-floats doctrine; sqrt would inject float rounding
    * into each superstep).
    *
    * Plan shape per superstep: one frontier join + map-side-combined
    * agg per direction; the round max rides a broadcast 1-row
    * aggregate attached by cross join (no driver action per round —
    * the r8 trainBpe lesson), and the exchange under it is reused for
    * the vertex join (spark.sql.exchange.reuse). Each side's scores
    * are lineage-pinned EVERY round via ColumnBridge: a HITS round
    * references the previous frame twice (max + join), so unpinned
    * lineage would double the analyzed plan tree per round — pinning
    * keeps it linear, the same reason pageRankInt pins on long runs,
    * just at period 1. Pins are vertex-sized and LRU-evictable.
    *
    * Overflow: sums ride DECIMAL(38,0) — scores are ≤ 1e6 post-
    * normalization, so raw ≤ in_degree·max_w·1e6 must stay under
    * 1e32 (comfortable at web-graph degrees; Long would cap the
    * degree·weight product at ~9e6).
    *
    * Output: (id, auth_ppm, hub_ppm) — one row per vertex; each
    * side's argmax vertex carries exactly 1e6. Sinks have hub 0,
    * sources auth 0, matching the oracle's COALESCE(…, 0). */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100] (got $iterations)")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // per-iteration lineage truncation ([[ColumnBridge.pinned]])
    def pin(df: DataFrame): DataFrame = ColumnBridge.pinned(df)._1
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // One renormalized power step along one direction: raw(v) =
    // Σ over edges into v (keyed `joinKey` → grouped `outKey`) of
    // score·w in DECIMAL(38,0), then ppm-of-max via integral div
    // (IntegralDivide on decimals returns BIGINT in both engines).
    def step(scores: DataFrame, scoreCol: String, joinKey: String,
        outKey: String, outCol: String): DataFrame = {
      val raw = e
        .join(scores.select(col("id").as(joinKey), col(scoreCol)), joinKey)
        .select(col(outKey).as("id"),
          expr(s"CAST($scoreCol AS DECIMAL(38,0)) * w").as("x"))
        .groupBy(col("id")).agg(sum(col("x")).as("raw"))
      val mx = raw.agg(max(col("raw")).as("mx"))
      pin(verts.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(mx))
        .select(col("id"),
          expr("CAST((coalesce(raw, CAST(0 AS DECIMAL(38,0))) * 1000000)" +
            " div mx AS BIGINT)").as(outCol)))
    }

    var auth = verts.select(col("id"), lit(1000000L).as("auth_ppm"))
    var hub = verts.select(col("id"), lit(1000000L).as("hub_ppm"))
    var i = 0
    while (i < iterations) {
      auth = step(hub, "hub_ppm", "src", "dst", "auth_ppm")
      hub = step(auth, "auth_ppm", "dst", "src", "hub_ppm")
      i += 1
    }
    verts.join(auth, Seq("id"), "left").join(hub, Seq("id"), "left")
      .select(col("id"), coalesce(col("auth_ppm"), lit(0L)).as("auth_ppm"),
        coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"))
  }

  /** Per-community modularity sufficient statistics (Newman 2004,
    * weighted form) for a given labeling: with the symmetrized
    * directed weight M2 = Σ_ij A_ij, each community's intra-weight
    * E_c = Σ_{i,j∈c} A_ij and total degree D_c = Σ_{i∈c} k_i give
    * `Q = Σ_c (E_c/M2 − (D_c/M2)²)` — equivalently
    * `Q·M2² = M2·ΣE_c − ΣD_c²`, all integers. The ratio is the
    * CALLER's last float (Q can be negative; an integral divide's
    * trunc-vs-floor would differ across engines on negatives —
    * exactly why only the integer moments cross the oracle
    * boundary). Feed it [[labelPropagation]]'s labels to score how
    * community-like they actually are — the graph-clustering
    * quality gate.
    *
    * Input `edges` are canonical undirected pairs (a < b) with
    * weight; `labels` maps every vertex to its community. Output:
    * (community, n_nodes, e_in, d_tot, m2), one row per community.
    * Scale shape: symmetrize, two vertex-keyed label joins onto the
    * edge list, then community-keyed aggs; M2 attaches as a
    * broadcast 1-row agg. */
  def modularityByCommunity(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, labels: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val e2 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(wCol).cast("long").as("w"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b"),
        col(wCol).cast("long").as("w")))
    // The labeling is referenced by BOTH endpoint joins and the
    // node-count agg, and the labeled edge frame feeds three aggs
    // (m2 / d_tot / e_in) — pin both so an upstream iterative
    // labeler (LPA supersteps) and the edge derivation execute once,
    // not once per consumer.
    val lab = labels.select(col(idCol).as("__id"),
        col(labelCol).as("__lab"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val j = e2
      .join(lab.select(col("__id").as("a"), col("__lab").as("ca")), "a")
      .join(lab.select(col("__id").as("b"), col("__lab").as("cb")), "b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m2 = j.agg(sum(col("w")).as("m2"))
    val dt = j.groupBy(col("ca").as("community"))
      .agg(sum(col("w")).as("d_tot"))
    val ei = j.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(sum(col("w")).as("e_in"))
    val nn = lab.groupBy(col("__lab").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
    nn.join(dt, Seq("community"))
      .join(ei, Seq("community"), "left")
      .crossJoin(broadcast(m2))
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        col("m2"))
  }

  /** Laplace-smoothed Markov transition matrix over an event
    * timeline: for every ordered state pair (src, dst) in the FULL
    * k×k grid — including never-observed transitions — the observed
    * count `w` and the add-α next-state probability in exact ppm,
    * `p_ppm = 1e6·(w + α) div (rowTotal + α·k)`, plus `is_mode` = 1
    * on each source's deterministic argmax next state (highest
    * p_ppm, then smallest dst — a total order, engine-reproducible).
    * States with no outgoing transitions (timeline-final states) get
    * the uniform row 1e6·α div (α·k) — the reason smoothing exists:
    * a session-path model must score unseen continuations > 0.
    *
    * Scale shape: the corpus is touched once, by
    * [[transitionEdges]]'s user-partitioned lead window + count agg;
    * everything after operates on the EDGE table (state²-sized,
    * categorical by contract — persisted across its three uses). k
    * arrives as a broadcast 1-row aggregate, never a driver action;
    * the mode flag's window partitions by src over the k²-row grid.
    * Overflow: (w + α)·1e6 must fit a Long — w ≤ 9.2e12 transitions
    * per cell, comfortable at any corpus this engine targets.
    *
    * `maxStates` guards the dense k×k grid: the state alphabet is
    * categorical BY CONTRACT (event types, session stages), and the
    * crossJoin densification is quadratic in it — passing a
    * high-cardinality column (user ids, urls) would silently build a
    * billions-row grid. The guard is the repo's bounded-action
    * doctrine: a `limit(maxStates+1).count()` over the distinct
    * states (edge-table-sized, already persisted upstream) fails
    * fast BEFORE any k×k work is scheduled. */
  def transitionProbs(events: DataFrame, keyCol: String, typeCol: String,
      orderCol: Column, tieCol: Column, alpha: Long = 1L,
      maxStates: Int = 10000): DataFrame = {
    require(alpha >= 1, s"alpha must be >= 1 (got $alpha)")
    require(maxStates >= 1 && maxStates < Int.MaxValue,
      s"maxStates must be in [1, 2^31-2] (got $maxStates)")
    val e = transitionEdges(events, keyCol, typeCol, orderCol, tieCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val states = e.select(col("src").as("st"))
      .union(e.select(col("dst"))).distinct()
    val nStates = states.limit(maxStates + 1).count()
    require(nStates <= maxStates,
      s"transitionProbs: state alphabet exceeds maxStates=$maxStates — " +
        "the k×k grid is quadratic in the alphabet; pass a categorical " +
        "type column or raise maxStates explicitly")
    val kdf = states.agg(count(lit(1)).as("k"))
    val rt = e.groupBy(col("src")).agg(sum(col("w")).as("rt"))
    val grid = states.select(col("st").as("src"))
      .crossJoin(states.select(col("st").as("dst")))
      .join(e, Seq("src", "dst"), "left")
      .join(rt, Seq("src"), "left")
      .crossJoin(broadcast(kdf))
      .select(col("src"), col("dst"),
        coalesce(col("w"), lit(0L)).as("w"),
        expr(s"((coalesce(w, 0L) + $alpha) * 1000000) div" +
          s" (coalesce(rt, 0L) + $alpha * k)").as("p_ppm"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
      .orderBy(col("p_ppm").desc, col("dst"))
    grid.withColumn("is_mode",
      when(row_number().over(win) === 1, lit(1L)).otherwise(lit(0L)))
  }

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
