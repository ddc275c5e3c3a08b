package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Kruskal–Wallis rank sums vs brute-force pooled ranks (including
  * the Mann–Whitney U identity), Kaplan–Meier risk tables vs hand
  * counts, and t-closeness EMD numerators vs hand-computed grids. */
class SurvivalRankSpec extends SparkSpec {
  import spark.implicits._

  // ---- kruskalStats ----

  private def bruteKruskal(pts: Seq[(String, Long)])
      : (Map[String, (Long, Long)], Long, Long) = {
    val byV = pts.groupBy(_._2).map { case (v, g) => (v, g.size.toLong) }
    var cum = 0L
    val r2 = scala.collection.mutable.Map[Long, Long]()
    for (v <- byV.keys.toSeq.sorted) {
      val c = byV(v); r2(v) = 2 * cum + c + 1; cum += c
    }
    val groups = pts.groupBy(_._1).map { case (g, rows) =>
      (g, (rows.size.toLong, rows.map(r => r2(r._2)).sum))
    }
    val tie = byV.values.map(c => c * c * c - c).sum
    (groups, pts.size.toLong, tie)
  }

  private def engineKruskal(pts: Seq[(String, Long)])
      : (Map[String, (Long, Long)], Long, Long) = {
    val rows = Stats.kruskalStats(pts.toDF("g", "v"), "g", "v")
      .collect()
    val groups = rows.map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2)))).toMap
    val n = if (rows.isEmpty) 0L else rows.head.getLong(3)
    val tie = if (rows.isEmpty) 0L else rows.head.getLong(4)
    (groups, n, tie)
  }

  test("kruskal: matches brute-force pooled tie-averaged ranks") {
    val pts = (1 to 300).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(
        s"kw:$i".getBytes).getLeastSignificantBits
      (s"g${(h % 4 + 4) % 4}", ((h >> 13) % 9 + 9) % 9)
    }
    assert(engineKruskal(pts) == bruteKruskal(pts))
  }

  test("kruskal: Mann–Whitney U identity on two groups") {
    val a = Seq(3L, 5L, 5L, 9L, 12L)
    val b = Seq(1L, 5L, 7L, 7L)
    val pts = a.map(("a", _)) ++ b.map(("b", _))
    val (groups, _, _) = engineKruskal(pts)
    val (na, r2a) = groups("a")
    // 2·U_a = Σ_{x∈a,y∈b} (2·[x>y] + [x=y]) = r2_sum_a − n_a(n_a+1)
    val u2Brute = (for (x <- a; y <- b) yield {
      if (x > y) 2L else if (x == y) 1L else 0L
    }).sum
    assert(r2a - na * (na + 1) == u2Brute)
  }

  test("kruskal: maxRows cap is hard") {
    val pts = (1 to 10).map(i => ("g", i.toLong))
    intercept[IllegalArgumentException] {
      Stats.kruskalStats(pts.toDF("g", "v"), "g", "v", maxRows = 5L)
        .collect()
    }
  }

  // ---- wilcoxonStats ----

  test("wilcoxon: matches brute-force signed ranks with ties and " +
      "zeros") {
    val ds = (1 to 200).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(
        s"wx:$i".getBytes).getLeastSignificantBits
      (h % 9) // signed, includes zeros, heavy ties in |d|
    }
    val r = Stats.wilcoxonStats(ds.toDF("d"), "d").head()
    val nz = ds.filter(_ != 0L)
    val byA = nz.map(math.abs).groupBy(identity)
      .map { case (a, g) => (a, g.size.toLong) }
    var cum = 0L
    val r2 = scala.collection.mutable.Map[Long, Long]()
    for (a <- byA.keys.toSeq.sorted) {
      val c = byA(a); r2(a) = 2 * cum + c + 1; cum += c
    }
    val wp = nz.filter(_ > 0).map(d => r2(math.abs(d))).sum
    val wm = nz.filter(_ < 0).map(d => r2(math.abs(d))).sum
    val tie = byA.values.map(c => c * c * c - c).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) ==
      ((nz.size.toLong, (ds.size - nz.size).toLong, wp, wm, tie)))
    // doubled ranks sum to 2·n(n+1)/2 = n(n+1)
    val nn = nz.size.toLong
    assert(wp + wm == nn * (nn + 1))
  }

  test("wilcoxon: all-zero and empty inputs") {
    val z = Stats.wilcoxonStats(Seq(0L, 0L, 0L).toDF("d"), "d").head()
    assert((z.getLong(0), z.getLong(1), z.getLong(2), z.getLong(3),
      z.getLong(4)) == ((0L, 3L, 0L, 0L, 0L)))
    val e = Stats.wilcoxonStats(Seq.empty[Long].toDF("d"), "d").head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L)
  }

  // ---- inclusionDependencies ----

  test("fk discovery: total, partial, and empty-child containment") {
    val child = Seq(1L, 2L, 2L, 3L).toDF("k")
    val parentFull = Seq(1L, 2L, 3L, 4L).toDF("p")
    val parentPart = Seq(2L, 3L).toDF("p")
    val empty = Seq.empty[Long].toDF("k")
    val rows = Stats.inclusionDependencies(Seq(
      ("full", child, "k", parentFull, "p"),
      ("part", child, "k", parentPart, "p"),
      ("empty", empty, "k", parentFull, "p")))
      .orderBy("candidate")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(("empty", 0L, 0L, 1L), ("full", 3L, 3L, 1L),
      ("part", 3L, 2L, 0L)))
  }

  // ---- kmRiskTable ----

  test("km: hand-computed risk table, censoring split per duration") {
    // (duration, event): two churns at 0, one churn + one censored
    // at 2, one censored at 5
    val subj = Seq((0L, 1L), (0L, 1L), (2L, 0L), (2L, 1L), (5L, 0L))
    val rows = Stats.kmRiskTable(subj.toDF("dur", "ev"), "dur", "ev")
      .orderBy("duration")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 5L, 2L, 0L), (2L, 3L, 1L, 1L),
      (5L, 1L, 0L, 1L)))
  }

  test("km: at-risk is a suffix count — invariant to row order and " +
      "partitioning") {
    val subj = (1 to 500).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(
        s"km:$i".getBytes).getLeastSignificantBits
      (((h % 20) + 20) % 20, (h >> 7) & 1L)
    }
    val df = subj.toDF("dur", "ev").repartition(17)
    val rows = Stats.kmRiskTable(df, "dur", "ev")
      .orderBy("duration")
      .as[(Long, Long, Long, Long)].collect()
    val n = subj.size.toLong
    for ((d, atRisk, nEvent, nCens) <- rows) {
      assert(atRisk == subj.count(_._1 >= d).toLong)
      assert(nEvent == subj.count(s => s._1 == d && s._2 == 1L))
      assert(nCens == subj.count(s => s._1 == d && s._2 == 0L))
    }
    assert(rows.map(r => r._3 + r._4).sum == n)
  }

  // ---- tCloseness ----

  test("t-closeness: hand-computed EMD numerators, absent levels " +
      "still contribute") {
    // g1 holds levels {0,0,1}, g2 holds {1,2} — g2 has no level-0
    // rows, so the grid must still evaluate its |0·n − cum·n_g| term
    val df = Seq(("g1", 0L), ("g1", 0L), ("g1", 1L),
      ("g2", 1L), ("g2", 2L)).toDF("qi", "s")
    val rows = Stats.tCloseness(df, Seq("qi"), "s")
      .orderBy("qi")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // n=5, m=3; global cum = (2,4,5)
    // g1: cumG=(2,3,3) → |10−6|+|15−12|+|15−15| = 7
    // g2: cumG=(0,1,2) → |0−4|+|5−8|+|10−10|   = 7
    assert(rows == Seq(("g1", 3L, 7L, 5L, 3L),
      ("g2", 2L, 7L, 5L, 3L)))
  }

  test("t-closeness: a group matching the global distribution has " +
      "zero numerator") {
    val rows = (1 to 60).flatMap { i =>
      Seq(("a", (i % 3).toLong), ("b", (i % 3).toLong))
    }
    val out = Stats.tCloseness(rows.toDF("qi", "s"), Seq("qi"), "s")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.forall(_._3 == 0L))
  }

  test("t-closeness: level cap fails fast before grid work") {
    val df = (1 to 50).map(i => ("g", i.toLong)).toDF("qi", "s")
    intercept[IllegalArgumentException] {
      Stats.tCloseness(df, Seq("qi"), "s", maxLevels = 10)
    }
  }
}
