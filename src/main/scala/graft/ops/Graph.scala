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
    var pinnedRdds = List.empty[org.apache.spark.rdd.RDD[_]]
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
        // RDD and rewrap. Keeps the optimizer's input bounded on
        // long runs; intermediate pins are released at the end.
        val rdd = ColumnBridge.internalRdd(rank).map(_.copy())
          .persist(StorageLevel.MEMORY_AND_DISK)
        rank = ColumnBridge.internalCreateDataFrame(rank, rdd, rank.schema)
        pinnedRdds = rdd :: pinnedRdds
      }
    }
    rank
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
