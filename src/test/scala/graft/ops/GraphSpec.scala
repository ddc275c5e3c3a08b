package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer PageRank vs an independent in-memory reference — the same
  * ppm arithmetic re-derived over plain Scala maps, so a misplaced
  * `div` or a join that drops dangling vertices on either side breaks
  * the comparison. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: Map(id -> rank_ppm) after `iters` supersteps.
    * `seeds = None` → uniform teleport; `Some(set)` → personalized. */
  private def refRank(edges: Seq[(String, String, Long)], iters: Int,
      dPpt: Long = 850L, seeds: Option[Set[String]] = None)
      : Map[String, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val basePpm = ((1000L - dPpt) * 1000000L) / 1000L
    def base(v: String): Long =
      if (seeds.forall(_.contains(v))) basePpm else 0L
    var rank = verts.map(v =>
      v -> (if (seeds.forall(_.contains(v))) 1000000L else 0L)).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (rank(s) * w) / ow(s) }.sum
      }
      rank = verts.map(v =>
        v -> (base(v) + (dPpt * in.getOrElse(v, 0L)) / 1000L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int,
      pinEvery: Int = 8): Map[String, Long] =
    Graph.pageRankInt(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters, pinEvery = pinEvery)
      .as[(String, Long)].collect().toMap

  private val diamond = Seq(
    ("a", "b", 2L), ("a", "c", 1L), ("b", "d", 1L), ("c", "d", 1L),
    ("d", "a", 1L))

  test("matches the reference scorer on a weighted diamond") {
    (0 to 4).foreach { iters =>
      assert(run(diamond, iters) == refRank(diamond, iters),
        s"diverged at $iters iterations")
    }
  }

  test("dangling vertices keep receiving the base rank") {
    // b has no out-edges: it must stay a vertex (rank row present)
    // and simply stop contributing
    val e = Seq(("a", "b", 1L), ("c", "a", 1L))
    val got = run(e, 3)
    assert(got.keySet == Set("a", "b", "c"))
    assert(got == refRank(e, 3))
  }

  test("lineage pinning does not change results") {
    assert(run(diamond, 5, pinEvery = 2) == run(diamond, 5, pinEvery = 100))
  }

  test("zero iterations returns uniform 1e6") {
    assert(run(diamond, 0).values.toSet == Set(1000000L))
  }

  test("transition edges derive consecutive pairs per key") {
    val ev = Seq(
      (1L, "x", 10L, 1L), (1L, "y", 20L, 2L), (1L, "x", 30L, 3L),
      (2L, "y", 5L, 4L)).toDF("user_id", "event_type", "ts", "event_id")
    val got = Graph.transitionEdges(ev, "user_id", "event_type",
        col("ts"), col("event_id"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("x", "y", 1L), ("y", "x", 1L)))
  }

  test("personalized teleport matches the seeded reference") {
    val seeds = Set("a")
    (1 to 4).foreach { iters =>
      val got = Graph.pageRankInt(diamond.toDF("src", "dst", "w"),
          "src", "dst", "w", iters, 850L, 8,
          Some((Seq("a", "zz_not_in_graph").toDF("id"), "id")))
        .as[(String, Long)].collect().toMap
      assert(got == refRank(diamond, iters, seeds = Some(seeds)),
        s"diverged at $iters iterations")
    }
  }

  test("non-seed vertices start at zero and earn rank via in-edges") {
    val e = Seq(("a", "b", 1L))
    val got = Graph.pageRankInt(e.toDF("src", "dst", "w"),
        "src", "dst", "w", 1, 850L, 8, Some((Seq("a").toDF("id"), "id")))
      .as[(String, Long)].collect().toMap
    // b: base 0 + 850 * (1e6 * 1 / 1) / 1000 = 850000
    assert(got == Map("a" -> 150000L, "b" -> 850000L))
  }

  test("degree profile counts directions, weights and self-loops") {
    val e = Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("a", "a", 5L), ("b", "a", 3L))
    val got = Graph.degreeProfile(e.toDF("src", "dst", "w"),
        "src", "dst", "w")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      // id -> (out_deg, in_deg, out_w, in_w, self_w)
      "a" -> ((3L, 2L, 8L, 8L, 5L)),
      "b" -> ((1L, 1L, 3L, 2L, 0L)),
      "c" -> ((0L, 1L, 0L, 1L, 0L))))
  }

  /** Reference walker: md5-hex first 15 chars parsed base-16 mod
    * deg, dst-sorted distinct adjacency — independent of the Spark
    * expressions. */
  private def refWalks(edges: Seq[(String, String)], steps: Int,
      walks: Int): Set[(String, Long, Int, String)] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).distinct.sorted }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def h(start: String, wid: Long, t: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$start:$wid:$t".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    (for {
      v <- verts; wid <- 0L until walks.toLong
    } yield {
      var node = v
      var rows = List((v, wid, 0, v))
      var t = 1
      var alive = true
      while (t <= steps && alive) {
        adj.get(node) match {
          case Some(ns) =>
            node = ns((h(v, wid, t) % ns.length).toInt)
            rows = (v, wid, t, node) :: rows
          case None => alive = false
        }
        t += 1
      }
      rows
    }).flatten.toSet
  }

  test("random walks match the independent md5 reference walker") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("b", "d")) // d dangles
    val got = Graph.randomWalks(
        edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        "src", "dst", steps = 4, walksPerVertex = 3)
      .as[(String, Long, Int, String)].collect().toSet
    assert(got == refWalks(edges, 4, 3))
  }

  test("walks end early at dangling vertices") {
    val got = Graph.randomWalks(
        Seq(("a", "b", 1L)).toDF("src", "dst", "w"),
        "src", "dst", steps = 5, walksPerVertex = 1)
      .as[(String, Long, Int, String)].collect().toSet
    // a: step0 a, step1 b (deg 1), then b dangles; b: step0 only
    assert(got == Set(("a", 0L, 0, "a"), ("a", 0L, 1, "b"),
      ("b", 0L, 0, "b")))
  }

  test("skip-gram pairs window correctly and count with multiplicity") {
    val walks = Seq(
      // one walk a->b->c->a (steps 0..3)
      ("a", 0L, 0, "a"), ("a", 0L, 1, "b"), ("a", 0L, 2, "c"),
      ("a", 0L, 3, "a")).toDF("start", "walk_id", "step", "node")
    val got = Graph.skipGramPairs(walks, window = 1)
      .as[(String, String, Long)].collect().toSet
    // adjacent-only pairs, both directions, (c,a)+(a,c) etc.
    assert(got == Set(
      ("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 1L),
      ("c", "a", 1L), ("a", "c", 1L)))
    val w2 = Graph.skipGramPairs(walks, window = 2)
      .as[(String, String, Long)].collect()
      .map { case (c, x, n) => (c, x) -> n }.toMap
    // (a,c) now twice: steps 0->2 and 3->2... 3-2=1 already in w1;
    // w2 adds 0->2 ⇒ ("a","c") count 2, plus ("a","a") from 0<->3? no:
    // |0-3|=3 > 2 — excluded; ("b","a") gains 1->3
    assert(w2(("a", "c")) == 2L && w2(("b", "a")) == 2L)
  }

  /** Reference weighted walker: md5 draw mod out-weight lands in the
    * dst-sorted cumulative interval. */
  private def refWeightedWalks(edges: Seq[(String, String, Long)],
      steps: Int, walks: Int): Set[(String, Long, Int, String)] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      val merged = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map(_._3).sum }.toSeq.sortBy(_._1)
      s -> merged
    }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def h(start: String, wid: Long, t: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$start:$wid:$t".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    (for { v <- verts; wid <- 0L until walks.toLong } yield {
      var node = v
      var rows = List((v, wid, 0, v))
      var t = 1
      var alive = true
      while (t <= steps && alive) {
        adj.get(node) match {
          case Some(ns) =>
            val ow = ns.map(_._2).sum
            val r = h(v, wid, t) % ow
            var acc = 0L
            val nxt = ns.find { case (_, w) =>
              val in = r >= acc && r < acc + w; acc += w; in }.get._1
            node = nxt
            rows = (v, wid, t, node) :: rows
          case None => alive = false
        }
        t += 1
      }
      rows
    }).flatten.toSet
  }

  test("weighted walks match the interval reference walker") {
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 2L),
      ("c", "a", 1L), ("c", "b", 3L))
    val got = Graph.weightedRandomWalks(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", steps = 4, walksPerVertex = 3)
      .as[(String, Long, Int, String)].collect().toSet
    assert(got == refWeightedWalks(edges, 4, 3))
  }

  test("weighted walks collapse multi-edges by summing weights") {
    // a->b twice (1+1) vs a->c (1): interval widths 2 and 1
    val e = Seq(("a", "b", 1L), ("a", "b", 1L), ("a", "c", 1L))
    val got = Graph.weightedRandomWalks(e.toDF("src", "dst", "w"),
        "src", "dst", "w", steps = 1, walksPerVertex = 4)
      .as[(String, Long, Int, String)].collect().toSet
    assert(got == refWeightedWalks(e, 1, 4))
  }

  test("rank mass is conserved up to flooring on a stochastic cycle") {
    // pure cycle, uniform weights: every vertex keeps rank exactly 1e6
    val cyc = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    assert(run(cyc, 7).values.toSet == Set(1000000L))
  }
}
