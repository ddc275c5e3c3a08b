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

  test("rank mass is conserved up to flooring on a stochastic cycle") {
    // pure cycle, uniform weights: every vertex keeps rank exactly 1e6
    val cyc = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    assert(run(cyc, 7).values.toSet == Set(1000000L))
  }
}
