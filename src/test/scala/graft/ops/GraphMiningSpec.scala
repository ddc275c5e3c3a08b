package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle counting, label propagation and basket pairs vs
  * independent in-memory references — brute-force triple enumeration
  * and a plain-Map LPA re-deriving the same arg-max rule, so an
  * orientation bug (triangle double-count) or a tie-break drift on
  * either side breaks the comparison. */
class GraphMiningSpec extends SparkSpec {
  import spark.implicits._

  private def triRun(edges: Seq[(String, String)]): Map[String, Long] =
    Graph.triangles(edges.toDF("s", "d"), "s", "d")
      .as[(String, Long)].collect().toMap

  /** Brute-force per-vertex triangle membership over the canonical
    * undirected simple graph. */
  private def triRef(edges: Seq[(String, String)]): Map[String, Long] = {
    val es = edges.collect {
      case (a, b) if a != b =>
        if (a < b) (a, b) else (b, a)
    }.toSet
    val vs = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map(vs.map(_ -> 0L): _*)
    for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      a = vs(i); b = vs(j); c = vs(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangles: K4 plus a pendant vertex") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    val got = triRun(k4 :+ ("d" -> "e"))
    // every K4 vertex sits in C(3,2) = 3 triangles; the pendant in 0
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "e" -> 0L))
  }

  test("triangles: star graph is triangle-free") {
    val star = Seq("b", "c", "d", "e").map(("hub", _))
    assert(triRun(star).values.forall(_ == 0L))
  }

  test("triangles: reversed duplicates and self-loops canonicalize") {
    val messy = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
      ("a", "a"), ("a", "c"))
    assert(triRun(messy) == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangles: matches brute force on a hashed pseudo-random graph") {
    // deterministic edge set: ~60 edges over 16 vertices
    val vs = (0 until 16).map(i => f"v$i%02d")
    val edges = for {
      i <- vs.indices; j <- (i + 1) until vs.size
      if java.util.UUID.nameUUIDFromBytes(
        s"${vs(i)}-${vs(j)}".getBytes).getLeastSignificantBits % 2 == 0
    } yield (vs(i), vs(j))
    assert(triRun(edges) == triRef(edges))
  }

  /** Reference LPA: same synchronous rule (max incident weight,
    * greatest label on ties) over plain maps. */
  private def lpaRef(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, String] = {
    val sym = edges.filter(e => e._1 != e._2 && e._3 > 0)
      .flatMap { case (s, d, w) => Seq((s, d, w), (d, s, w)) }
      .groupBy(e => (e._1, e._2)).map { case ((s, d), es) =>
        (s, d, es.map(_._3).sum) }.toSeq
    var lab = sym.map(_._1).distinct.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      lab = sym.groupBy(_._1).map { case (v, nbs) =>
        val byLab = nbs.groupBy(e => lab(e._2))
          .map { case (l, es) => l -> es.map(_._3).sum }
        val mw = byLab.values.max
        v -> byLab.collect { case (l, w) if w == mw => l }.max
      }
    }
    lab
  }

  private def lpaRun(edges: Seq[(String, String, Long)], iters: Int,
      pinEvery: Int = 8): Map[String, String] =
    Graph.labelPropagation(edges.toDF("src", "dst", "w"), "src", "dst",
        "w", iters, pinEvery)
      .as[(String, String)].collect().toMap

  private val twoCliques = Seq(
    ("a", "b", 5L), ("a", "c", 5L), ("b", "c", 5L),
    ("x", "y", 5L), ("x", "z", 5L), ("y", "z", 5L),
    ("c", "x", 1L))

  test("label propagation matches the reference rule per superstep") {
    (0 to 3).foreach { iters =>
      assert(lpaRun(twoCliques, iters) == lpaRef(twoCliques, iters),
        s"diverged at $iters supersteps")
    }
  }

  test("label propagation: cliques converge to one label each") {
    val got = lpaRun(twoCliques, 3)
    assert(Set(got("a"), got("b"), got("c")).size == 1)
    assert(Set(got("x"), got("y"), got("z")).size == 1)
  }

  test("label propagation tie-break picks the greatest label") {
    // hub sees b and c with equal weight; greatest label wins
    val star = Seq(("hub", "b", 1L), ("hub", "c", 1L))
    assert(lpaRun(star, 1)("hub") == "c")
  }

  test("label propagation lineage pinning does not change results") {
    assert(lpaRun(twoCliques, 3, pinEvery = 1) == lpaRun(twoCliques, 3))
  }

  test("basket pairs: canonical counts with support pruning") {
    val rows = Seq(
      (1L, "p"), (1L, "q"), (1L, "r"),
      (2L, "p"), (2L, "q"),
      (3L, "q"), (3L, "p"), (3L, "p")) // dup (3,p) collapses
    val got = Graph.basketPairs(rows.toDF("bk", "it"), "bk", "it")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("p", "q", 3L), ("p", "r", 1L), ("q", "r", 1L)))
    val pruned = Graph.basketPairs(rows.toDF("bk", "it"), "bk", "it",
        minCount = 2L)
      .as[(String, String, Long)].collect().toSet
    assert(pruned == Set(("p", "q", 3L)))
  }

  test("link prediction: square with one diagonal") {
    // a-b, b-c, c-d, d-a, a-c. Non-adjacent pair (b,d): common nbrs
    // {a, c} with deg(a)=3, deg(c)=3 → cn=2, ra=333333+333333;
    // deg(b)=deg(d)=2 → jacc = 2e6 // (2+2-2) = 1e6 (identical
    // neighborhoods)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"))
    val got = Graph.linkPredict(edges.toDF("s", "d"), "s", "d")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(("b", "d", 2L, 666666L, 1000000L)))
  }

  test("link prediction: existing edges are excluded, minCommon prunes") {
    // triangle a-b-c plus pendant d on a: every adjacent pair shares
    // a neighbor but is excluded; (b,c) adjacent too; only
    // non-adjacent pairs through a: (b,d), (c,d) with cn=1
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"))
    val got = Graph.linkPredict(edges.toDF("s", "d"), "s", "d")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2)) == Set(("b", "d"), ("c", "d")))
    val pruned = Graph.linkPredict(edges.toDF("s", "d"), "s", "d",
      minCommon = 2L).count()
    assert(pruned == 0L)
  }

  test("link prediction: hub centers above maxDegree generate no wedges") {
    val hub = Seq("b", "c", "d").map(("hub", _))
    assert(Graph.linkPredict(hub.toDF("s", "d"), "s", "d").count() == 3L)
    assert(Graph.linkPredict(hub.toDF("s", "d"), "s", "d",
      maxDegree = 2).count() == 0L)
  }

  test("k-core: peeling strips pendants from a clique") {
    // K4 on a..d, pendant chain d-e, e-f
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    val edges = k4 ++ Seq(("d", "e"), ("e", "f"))
    val got = Graph.kCore(edges.toDF("s", "d"), "s", "d", k = 3,
        rounds = 3)
      .as[(String, Long)].collect().toMap
    // after peeling e (deg 2) and f (deg 1), the K4 survives at deg 3
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("k-core: one round filters on raw degree only") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val got = Graph.kCore(path.toDF("s", "d"), "s", "d", k = 2,
        rounds = 1)
      .as[(String, Long)].collect().toMap
    // b and c have raw degree 2; one sweep keeps them
    assert(got == Map("b" -> 2L, "c" -> 2L))
    // more rounds peel the path away entirely
    assert(Graph.kCore(path.toDF("s", "d"), "s", "d", 2, 4).count() == 0)
  }

  test("hits: weighted hand-check, argmax carries 1e6, sinks/sources 0") {
    import spark.implicits._
    // a->c w1, b->c w3, c->d w2. Round 1 by hand:
    //   auth raw: c=4e6, d=2e6 -> auth c=1e6, d=500000, a=b=0
    //   hub  raw: a=1e6, b=3e6, c=1e6 -> hub b=1e6, a=c=333333, d=0
    val e = Seq(("a", "c", 1L), ("b", "c", 3L), ("c", "d", 2L))
      .toDF("src", "dst", "w")
    val got = Graph.hitsInt(e, "src", "dst", "w", iterations = 1)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 0L, 333333L), ("b", 0L, 1000000L),
      ("c", 1000000L, 333333L), ("d", 500000L, 0L)))
  }

  test("hits: second iteration stays normalized and deterministic") {
    import spark.implicits._
    val e = Seq(("a", "c", 1L), ("b", "c", 3L), ("c", "d", 2L),
      ("d", "a", 1L)).toDF("src", "dst", "w")
    val r1 = Graph.hitsInt(e, "src", "dst", "w", iterations = 2)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val r2 = Graph.hitsInt(e, "src", "dst", "w", iterations = 2)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r1 == r2)
    assert(r1.map(_._2).max == 1000000L && r1.map(_._3).max == 1000000L)
    assert(r1.forall { case (_, a, h) =>
      a >= 0 && a <= 1000000L && h >= 0 && h <= 1000000L })
  }

  test("transitionProbs: add-one grid, absorbing state goes uniform") {
    import spark.implicits._
    // user 1: a->b->c ; user 2: a->b. States {a,b,c}, k=3.
    // counts: a->b 2, b->c 1. Row totals: a=2, b=1, c=0.
    val ev = Seq((1L, "a", 10L, 100L), (1L, "b", 20L, 101L),
      (1L, "c", 30L, 102L), (2L, "a", 10L, 103L), (2L, "b", 20L, 104L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Graph.transitionProbs(ev, "user_id", "event_type",
        col("ts"), col("event_id"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size == 9)
    // a row: total 2+k=5; a->b (2+1)/5 = 600000, others 200000
    assert(got(("a", "b")) == (("a", "b", 2L, 600000L, 1L)))
    assert(got(("a", "a")) == (("a", "a", 0L, 200000L, 0L)))
    // b row: total 1+3=4; b->c 500000 mode; others 250000
    assert(got(("b", "c")) == (("b", "c", 1L, 500000L, 1L)))
    assert(got(("b", "a")) == (("b", "a", 0L, 250000L, 0L)))
    // c is absorbing: uniform 333333, mode = smallest dst 'a'
    assert(got(("c", "a")) == (("c", "a", 0L, 333333L, 1L)))
    assert(got(("c", "b")) == (("c", "b", 0L, 333333L, 0L)))
    // each source row sums to ~1e6 and has exactly one mode
    val bySrc = got.values.groupBy(_._1)
    bySrc.values.foreach { rows =>
      assert(rows.map(_._5).sum == 1L)
      assert(math.abs(rows.map(_._4).sum - 1000000L) <= 3)
    }
  }

  test("transitionProbs: over-wide alphabet refused before densifying") {
    import spark.implicits._
    // 5 distinct states > maxStates=3 — must fail fast with the cap
    // in the message, never scheduling the k*k grid.
    val ev = (1 to 5).map(i => (1L, s"s$i", i * 10L, 100L + i))
      .toDF("user_id", "event_type", "ts", "event_id")
    val ex = intercept[IllegalArgumentException] {
      Graph.transitionProbs(ev, "user_id", "event_type",
        col("ts"), col("event_id"), maxStates = 3)
    }
    assert(ex.getMessage.contains("maxStates=3"))
    // at the cap boundary it still runs (k = 5 == maxStates)
    val ok = Graph.transitionProbs(ev, "user_id", "event_type",
      col("ts"), col("event_id"), maxStates = 5)
    assert(ok.count() == 25L)
  }

  test("modularity moments: two clean triangles give Q = 1/2") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L),
      ("x", "y", 1L), ("x", "z", 1L), ("y", "z", 1L))
      .toDF("u", "v", "w")
    val labels = Seq(("a", "t1"), ("b", "t1"), ("c", "t1"),
      ("x", "t2"), ("y", "t2"), ("z", "t2")).toDF("id", "label")
    val got = Graph.modularityByCommunity(edges, "u", "v", "w",
        labels, "id", "label")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("t1", 3L, 6L, 6L, 12L), ("t2", 3L, 6L, 6L, 12L)))
    // Q·M2² = M2·ΣE − ΣD² = 12·12 − 72 = 72 -> Q = 72/144 = 0.5
    val q = (12L * 12L - (36L + 36L)).toDouble / (12.0 * 12.0)
    assert(q == 0.5)
    // everything in ONE community: Q = 0 exactly
    val one = labels.select($"id", lit("all").as("label"))
    val g1 = Graph.modularityByCommunity(edges, "u", "v", "w",
        one, "id", "label")
      .as[(String, Long, Long, Long, Long)].head()
    assert(g1._5 * g1._3 - g1._4 * g1._4 == 0L)
  }

  test("basket pairs: hub baskets above the cap are dropped entirely") {
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "c"))
    val got = Graph.basketPairs(rows.toDF("bk", "it"), "bk", "it",
        minCount = 1L, maxBasket = 2)
      .as[(String, String, Long)].collect().toSet
    // basket 2 (3 items) is dropped; only basket 1's pair remains
    assert(got == Set(("a", "b", 1L)))
  }
}
