package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** Exact Kendall sufficient statistics vs the quadratic pair
  * definition, plus the mergesort/two-pointer kernels. */
class KendallSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val n = pts.length.toLong
    var (tx, ty, txy, nc, nd) = (0L, 0L, 0L, 0L, 0L)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (xa, ya) = pts(i); val (xb, yb) = pts(j)
      if (xa == xb && ya == yb) { tx += 1; ty += 1; txy += 1 }
      else if (xa == xb) tx += 1
      else if (ya == yb) ty += 1
      else if ((xa < xb) == (ya < yb)) nc += 1
      else nd += 1
    }
    (n, n * (n - 1) / 2, tx, ty, txy, nc, nd)
  }

  private def engine(pts: Seq[(Long, Long)], parts: Int = 5)
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val r = Stats.kendallStats(pts.toDF("x", "y"), "x", "y",
      parts = parts).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
  }

  test("kernels: inversions and sorted-merge counts on hand vectors") {
    val inv = Seq(Tuple1(Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)))
      .toDF("a").select(GraftFunctions.seqInversions($"a"))
      .as[Long].head()
    // pairs out of order: (3,1),(3,1),(3,2),(4,1),(4,2),(5,2),(9,2),(9,6)
    assert(inv == 8L)
    assert(Seq(Tuple1(1)).toDF("z").select(GraftFunctions
      .seqInversions(typedLit(Seq.empty[Long]))).as[Long].head() == 0L)
    val mg = Seq(Tuple1(1)).toDF("z").select(
      GraftFunctions.sortedMergeGreater(
        typedLit(Seq(2L, 5L, 7L)), typedLit(Seq(1L, 5L, 6L))))
      .as[Long].head()
    // a>b pairs: 2>1, 5>1, 7>1, 7>5, 7>6
    assert(mg == 5L)
  }

  test("matches the quadratic definition: random data with heavy " +
      "ties, any partition count") {
    // deterministic pseudo-random points with many x and y ties
    val pts = (1 to 400).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(
        s"kend:$i".getBytes).getLeastSignificantBits
      ((h % 13 + 13) % 13, ((h >> 17) % 7 + 7) % 7)
    }
    val want = brute(pts)
    assert(engine(pts, parts = 1) == want)
    assert(engine(pts, parts = 5) == want)
    assert(engine(pts, parts = 64) == want)
  }

  test("edges: perfect agreement, perfect reversal, constant column, " +
      "tiny inputs") {
    val mono = (1L to 50L).map(i => (i, i * 3))
    val (_, np, _, _, _, nc, nd) = engine(mono)
    assert(nc == np && nd == 0L)
    val rev = (1L to 50L).map(i => (i, -i))
    val r = engine(rev)
    assert(r._6 == 0L && r._7 == r._2)
    val const = (1L to 30L).map(i => (i, 7L))
    val c = engine(const)
    assert(c._4 == c._2 && c._6 == 0L && c._7 == 0L) // all ty
    assert(engine(Seq((1L, 1L))) == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(engine(Seq.empty[(Long, Long)]) ==
      ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("scala kernels: in-place inversion sort, greater-count, merge") {
    val a = Array(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    assert(Stats.sortCountingInversions(a) == 8L)
    assert(a.toSeq == Seq(1L, 1L, 2L, 3L, 4L, 5L, 6L, 9L))
    assert(Stats.sortCountingInversions(Array.empty[Long]) == 0L)
    assert(Stats.sortCountingInversions(Array(7L)) == 0L)
    assert(Stats.sortedGreaterCount(
      Array(2L, 5L, 7L), Array(1L, 5L, 6L)) == 5L)
    assert(Stats.sortedGreaterCount(Array.empty[Long],
      Array(1L)) == 0L)
    assert(Stats.mergeAscending(Array(1L, 4L), Array(2L, 3L, 9L))
      .toSeq == Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("mergeGroup is a pure exchange-shape knob: any group size " +
      "gives the same counts") {
    val pts = (1 to 500).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(
        s"kgrp:$i".getBytes).getLeastSignificantBits
      ((h % 17 + 17) % 17, ((h >> 13) % 11 + 11) % 11)
    }
    val want = brute(pts)
    for (g <- Seq(1, 2, 7, 64)) {
      val r = Stats.kendallStats(pts.toDF("x", "y"), "x", "y",
        parts = 64, mergeGroup = g).head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)) == want,
        s"mergeGroup=$g diverged")
    }
  }

  test("grouped cross-merge cuts shuffle volume at parts=64 " +
      "(the n·P/g contract, measured)") {
    val pts = spark.range(200000).select(
      (col("id") * 2654435761L % 1000003L).as("x"),
      (col("id") * 40503L % 999983L).as("y"))
    // at 1e8-row scale the grid side is far past any broadcast
    // threshold — disable broadcast so the test measures the
    // at-scale execution path, not the toy-size one
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def shuffleBytes(g: Int): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            total.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        Stats.kendallStats(pts, "x", "y", parts = 64,
          mergeGroup = g).collect()
        Thread.sleep(1000) // listener bus drains asynchronously
      } finally spark.sparkContext.removeSparkListener(l)
      total.get()
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val ungrouped = shuffleBytes(1)
      val grouped = shuffleBytes(8)
      assert(grouped * 2 < ungrouped,
        s"expected grouped merge to at least halve shuffle read " +
          s"bytes: grouped=$grouped ungrouped=$ungrouped")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("maxRows refuses with the sample-first message") {
    val e = intercept[IllegalArgumentException] {
      Stats.kendallStats((1L to 10L).map(i => (i, i)).toDF("x", "y"),
        "x", "y", maxRows = 5L)
    }
    assert(e.getMessage.contains("scored sample"))
  }
  test("spearmanStats: moments equal scipy-style averaged ranks on " +
      "tied data; monotone data gives rho exactly 1") {
    val pts = Seq((3L, 9L), (1L, 4L), (3L, 4L), (2L, 9L), (1L, 1L),
      (3L, 2L), (2L, 2L))
    // averaged ranks (x): 1->1.5, 2->3.5, 3->6  => 2r: 3, 7, 12
    // averaged ranks (y): 1->1, 2->2.5, 4->4.5, 9->6.5 => 2r: 2,5,9,13
    val rx = Map(1L -> 3L, 2L -> 7L, 3L -> 12L)
    val ry = Map(1L -> 2L, 2L -> 5L, 4L -> 9L, 9L -> 13L)
    val r = Stats.spearmanStats(pts.toDF("x", "y"), "x", "y").head()
    val want = pts.map { case (x, y) => (rx(x), ry(y)) }
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == want.map(_._1).sum)
    assert(r.getLong(2) == want.map(_._2).sum)
    assert(r.getLong(3) == want.map(p => p._1 * p._2).sum)
    assert(r.getLong(4) == want.map(p => p._1 * p._1).sum)
    assert(r.getLong(5) == want.map(p => p._2 * p._2).sum)
    // monotone tie-free data: n*sxy - sx*sy == n*sxx - sx^2 (rho = 1)
    val m = Stats.spearmanStats((1L to 100L).map(i => (i, i * 5 + 2))
      .toDF("x", "y"), "x", "y").head()
    val (n, sx, sy, sxy, sxx, syy) = (m.getLong(0), m.getLong(1),
      m.getLong(2), m.getLong(3), m.getLong(4), m.getLong(5))
    assert(n * sxy - sx * sy == n * sxx - sx * sx)
    assert(n * sxx - sx * sx == n * syy - sy * sy)
    // cap is hard (BIGINT bound), not advisory
    val e = intercept[IllegalArgumentException] {
      Stats.spearmanStats(pts.toDF("x", "y"), "x", "y",
        maxRows = 2000000L)
    }
    assert(e.getMessage.contains("1e6"))
  }
}
