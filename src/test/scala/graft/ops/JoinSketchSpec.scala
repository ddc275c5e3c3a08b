package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinSketchSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward picks the latest right row at or before each left ts") {
    val left = Seq((100L, 1L, 10L), (101L, 1L, 5L), (102L, 2L, 7L),
      (103L, 3L, 4L)).toDF("event_id", "user_id", "ts")
    val right = Seq((900L, 1L, 5L), (901L, 1L, 8L), (902L, 1L, 11L),
      (903L, 2L, 9L)).toDF("event_id", "user_id", "ts")
    val out = AsOf.asofBackward(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id"))
      .select("event_id", "asof_event_id", "asof_ts")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (100L, Some(901L), Some(8L)), // ts10: latest prior is ts8
      (101L, Some(900L), Some(5L)), // equal ts matches (<= semantics)
      (102L, None, None), // user2's only right row is later
      (103L, None, None))) // user3 has no right rows
  }

  test("asofBackward breaks right-ts ties by payload order (max id wins)") {
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, 1L, 10L), (9L, 1L, 10L), (8L, 1L, 10L))
      .toDF("event_id", "user_id", "ts")
    val out = AsOf.asofBackward(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id")).select("asof_event_id").as[Long].head()
    assert(out == 9L)
  }

  test("byBins matches naive containment; inverted intervals dropped") {
    val pts = Seq((1L, 5L), (2L, 16L), (3L, 33L), (4L, -7L)).toDF("pid", "v")
    val iv = Seq((10L, 0L, 10L), (11L, 4L, 40L), (12L, 20L, 2L),
      (13L, -10L, -1L)).toDF("iid", "lo", "hi") // 12 is inverted
    val got = RangeJoin.byBins(pts, "v", iv, "lo", "hi", binSize = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 11L), (4L, 13L)))
    // no duplicate pairs even when an interval spans many bins
    val wide = Seq((20L, 0L, 100L)).toDF("iid", "lo", "hi")
    val dup = RangeJoin.byBins(pts.filter($"v" === 5L), "v", wide,
      "lo", "hi", binSize = 4)
    assert(dup.count() == 1L)
  }

  test("kmv sketch: exact below k, bounded error above, mergeable") {
    val df = spark.range(3000)
      .select(($"id" % 5).cast("string").as("g"), $"id".as("v"))
    val est = Sketch.kmvEstimate(df, Seq("g"), "v", k = 64)
      .select("g", "kmv_n", "est_distinct").as[(String, Long, Long)]
      .collect()
    assert(est.length == 5)
    est.foreach { case (g, n, e) =>
      assert(n == 64L, s"group $g kept $n")
      assert(math.abs(e - 600.0) / 600.0 < 0.35, s"group $g estimate $e")
    }
    val small = spark.range(10).select(lit("x").as("g"), $"id".as("v"))
    val es = Sketch.kmvEstimate(small, Seq("g"), "v", k = 64)
      .select("kmv_n", "est_distinct").as[(Long, Long)].head()
    assert(es == ((10L, 10L)))
    // merging two partial sketches (union, re-rank, keep k) equals
    // the sketch of the union
    val a = Sketch.kmvSketch(df.filter($"v" < 1500), Seq("g"), "v", 64)
    val b = Sketch.kmvSketch(df.filter($"v" >= 1500), Seq("g"), "v", 64)
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"kmv_hash")
    val remerged = a.unionByName(b).select($"g", $"kmv_hash").distinct()
      .withColumn("kmv_rank", row_number().over(rw))
      .filter($"kmv_rank" <= 64)
      .select("g", "kmv_rank", "kmv_hash")
      .as[(String, Int, Long)].collect().toSet
    val direct = Sketch.kmvSketch(df, Seq("g"), "v", 64)
      .as[(String, Int, Long)].collect().toSet
    assert(remerged == direct)
  }

  test("kmv sketch null value ranks first, like plain distinct+rank") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)), ("a", None))
      .toDF("g", "v")
    val rows = Sketch.kmvSketch(df, Seq("g"), "v", k = 64)
      .as[(String, Int, Option[Long])].collect().sortBy(_._2).toSeq
    assert(rows.length == 3) // null + two distinct values
    assert(rows.head._3.isEmpty) // Spark asc = nulls first -> rank 1
    assert(rows.tail.forall(_._3.nonEmpty))
  }

  test("hll registers: mergeable by max; summary z_int bound holds") {
    val df = spark.range(5000)
      .select(($"id" % 2).cast("string").as("g"), $"id".as("v"))
    // merging two partial sketches by re-MAXing equals the sketch of
    // the union (the HLL merge law)
    val a = Sketch.hllSketch(df.filter($"v" < 2500), Seq("g"), "v")
    val b = Sketch.hllSketch(df.filter($"v" >= 2500), Seq("g"), "v")
    val remerged = a.unionByName(b)
      .groupBy($"g", $"hll_bucket").agg(max($"hll_rho").as("hll_rho"))
      .as[(String, Long, Int)].collect().toSet
    val direct = Sketch.hllSketch(df, Seq("g"), "v")
      .as[(String, Long, Int)].collect().toSet
    assert(remerged == direct)
    val summ = Sketch.hllSummary(df, Seq("g"), "v")
      .select("m", "buckets_set", "z_int")
      .as[(Long, Long, Long)].collect()
    summ.foreach { case (m, set, z) =>
      assert(m == 256L && set <= m && set > 0)
      assert(z > 0 && z <= (1L << 61), s"z_int $z out of bound")
    }
  }

  test("hll estimate within tolerance; small range uses linear counting") {
    val big = spark.range(20000).select(lit("g").as("g"), $"id".as("v"))
    val est = Sketch.hllEstimate(Sketch.hllSummary(big, Seq("g"), "v"))
      .select("est_distinct").as[Double].head()
    // p=8 -> RSE ~6.5%; allow 3 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"est $est")
    val small = spark.range(40).select(lit("g").as("g"), $"id".as("v"))
    val es = Sketch.hllEstimate(Sketch.hllSummary(small, Seq("g"), "v"))
      .select("est_distinct").as[Double].head()
    // linear counting is near-exact at 40 << m=256
    assert(math.abs(es - 40.0) < 6.0, s"small est $es")
  }

  test("hll rho: all-zero suffix pinned, register values in range") {
    val df = spark.range(100000).select(lit("g").as("g"), $"id".as("v"))
    val regs = Sketch.hllSketch(df, Seq("g"), "v")
      .select("hll_bucket", "hll_rho").as[(Long, Int)].collect()
    assert(regs.forall { case (b, r) => b >= 0 && b < 256 && r >= 1 && r <= 53 })
  }

  test("hll pair-union equals the sketch of the concatenated data") {
    val df = spark.range(6000)
      .select(($"id" % 3).cast("string").as("g"), ($"id" % 2500).as("v"))
    val pair = Sketch.hllPairUnionSummary(df, "g", "v")
      .filter($"src_a" === "0" && $"src_b" === "1")
      .select("m", "buckets_set", "sum_rho", "z_int")
      .as[(Long, Long, Long, Long)].head()
    val direct = Sketch.hllSummary(df.filter($"g" =!= "2"), Seq("g"), "v")
    // collapse the two groups into one sketch by re-deriving from
    // the raw union — the ground truth the merged pair must equal
    val truth = Sketch.hllSummary(
      df.filter($"g" =!= "2").select(lit("u").as("g"), $"v"),
      Seq("g"), "v")
      .select("m", "buckets_set", "sum_rho", "z_int")
      .as[(Long, Long, Long, Long)].head()
    assert(pair == truth)
    assert(direct.count() == 2) // sanity: two per-group rows existed
  }

  test("kmvPairJaccard: small unions exact, large within tolerance") {
    // A = 0..9, B = 5..14: union 15 < k -> exact 5/15
    val small = spark.range(0, 10).select(lit("A").as("g"), $"id".as("v"))
      .union(spark.range(5, 15).select(lit("B").as("g"), $"id".as("v")))
    val sk = Sketch.kmvSketch(small, Seq("g"), "v", k = 64)
    val got = Sketch.kmvPairJaccard(sk, "g", k = 64)
      .as[(String, String, Long, Long, Long)].head()
    assert(got == (("A", "B", 15L, 5L, 333333L)))
    // A = 0..999, B = 500..1499: J = 1/3; k=64 estimate in range
    val big = spark.range(0, 1000).select(lit("A").as("g"), $"id".as("v"))
      .union(spark.range(500, 1500).select(lit("B").as("g"), $"id".as("v")))
    val skb = Sketch.kmvSketch(big, Seq("g"), "v", k = 64)
    val gb = Sketch.kmvPairJaccard(skb, "g", k = 64)
      .as[(String, String, Long, Long, Long)].head()
    assert(gb._3 == 64L)
    assert(math.abs(gb._5 / 1e6 - 1.0 / 3.0) < 0.15, s"est ${gb._5}")
  }

  test("countMinJoinSize: never undercounts; near-exact when sparse") {
    val a = spark.range(1, 101).select($"id".cast("string").as("v"))
    val b = spark.range(1, 101).select($"id".cast("string").as("v"))
      .union(spark.range(1, 101).select($"id".cast("string").as("v")))
    val ska = Sketch.countMinSketch(a, "v", 3, 4096)
    val skb = Sketch.countMinSketch(b, "v", 3, 4096)
    val est = Sketch.countMinJoinSize(ska, skb)
      .as[Long].head()
    // exact join size = 100 keys × 1 × 2 = 200; 100 keys in 4096
    // slots leave the estimate essentially collision-free
    assert(est >= 200L && est <= 220L, s"est $est")
    // disjoint key sets -> at most a few collision products
    val c = spark.range(5001, 5101).select($"id".cast("string").as("v"))
    val skc = Sketch.countMinSketch(c, "v", 3, 4096)
    val dz = Sketch.countMinJoinSize(ska, skc).as[Long].head()
    assert(dz <= 5L, s"disjoint est $dz")
  }

  test("kmv sketch exchange is sketch-sized, not vocabulary-sized") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val n = 200000L
    val parts = 8
    val k = 64
    val listener = new SparkListener {
      @volatile var written = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        written += s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // 200k DISTINCT values in 2 groups, 8 input partitions, NO
      // pre-shuffle (range is already partitioned): the r5 distinct()
      // form shuffled ~n partition-distinct rows; the bounded-heap
      // form may shuffle only candidates, ≤ k·groups·partitions.
      val df = spark.range(0, n, 1, parts).toDF("v")
        .select(pmod($"v", lit(2)).cast("string").as("g"), $"v")
      val out = Sketch.kmvSketch(df, Seq("g"), "v", k)
      assert(out.count() == 2L * k)
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.written < 2L * k && System.nanoTime() < deadline)
        Thread.sleep(50)
      val cap = k.toLong * 2 * parts * 3 // candidates cross ≤2 exchanges + slack
      assert(listener.written > 0 && listener.written <= cap,
        s"expected a sketch-sized exchange (≤ $cap records), " +
          s"got ${listener.written}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
