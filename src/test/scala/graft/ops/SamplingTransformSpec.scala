package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingTransformSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(1000).toDF("id")

  test("sampleByKey is deterministic and roughly proportional") {
    val kept = df.filter(Sampling.sampleByKey(df, $"id", 0.3, seed = 1))
      .as[Long].collect().toSet
    val again = df.filter(Sampling.sampleByKey(df, $"id", 0.3, seed = 1))
      .as[Long].collect().toSet
    assert(kept == again)
    assert(kept.size > 230 && kept.size < 370)
    val otherSeed = df.filter(Sampling.sampleByKey(df, $"id", 0.3, seed = 2))
      .as[Long].collect().toSet
    assert(kept != otherSeed)
  }

  test("stratified keeps at most k per stratum, deterministically") {
    val docs = spark.range(300)
      .select($"id", (($"id" % 3).cast("string")).as("grp"))
    val s1 = Sampling.stratified(docs, "grp", "id", k = 10, seed = 7)
    val counts = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 10L) && counts.size == 3)
    assert(s1.select(max($"samp_rank")).as[Int].head() == 10)
    // invariant to input partitioning (the determinism contract)
    val s2 = Sampling.stratified(docs.repartition(13), "grp", "id",
      k = 10, seed = 7)
    assert(s1.select("grp", "id").as[(String, Long)].collect().toSet ==
      s2.select("grp", "id").as[(String, Long)].collect().toSet)
    // different seed picks a different sample
    val s3 = Sampling.stratified(docs, "grp", "id", k = 10, seed = 8)
    assert(s1.select("id").as[Long].collect().toSet !=
      s3.select("id").as[Long].collect().toSet)
    // the rank filter is limit-pushed (skewed strata cost mappers,
    // not one reducer)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("temperatureMix: integer sqrt budgets, rank-lowest survivors") {
    // skewed sources: 400 / 100 / 25 rows
    val df = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "small")))
      .toDF("id", "src").repartition(4)
    val out = Sampling.temperatureMix(df, "src", "id",
      totalRows = 100, temperature = 2.0, seed = 3)
      .select($"src", $"id", $"samp_rank")
      .as[(String, Long, Int)].collect()
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    // w = floor(sqrt(n)): big 20, mid 10, small 5; sum 35
    // k = 100*w/35: big 57, mid 28, small 14 (all < n)
    assert(bySrc == Map("big" -> 57, "mid" -> 28, "small" -> 14))
    // survivors are exactly the k rank-lowest of the seeded permutation
    val expect = Sampling.stratified(df, "src", "id", k = 57, seed = 3)
      .select($"src", $"id", $"samp_rank")
      .as[(String, Long, Int)].collect()
      .filter { case (s, _, r) =>
        r <= (s match { case "big" => 57; case "mid" => 28; case _ => 14 }) }
    assert(out.toSet == expect.toSet)
    // T=1 keeps natural proportions (w = n exactly — pow(x,1) is x)
    val nat = Sampling.temperatureMix(df, "src", "id",
      totalRows = 100, temperature = 1.0, seed = 3)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(nat == Map("big" -> 76L, "mid" -> 19L, "small" -> 4L))
    // a huge T flattens toward uniform across sources
    val flat = Sampling.temperatureMix(df, "src", "id",
      totalRows = 60, temperature = 1000.0, seed = 3)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(flat.values.toSet == Set(20L))
  }

  test("weightedUnion composes independent samples") {
    val a = df.filter($"id" < 500).withColumn("src", lit("a"))
    val b = df.filter($"id" >= 500).withColumn("src", lit("b"))
    val u = Sampling.weightedUnion(Seq(a -> 1.0, b -> 0.0), "id", seed = 3)
    val srcs = u.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(srcs("a") == 500L && !srcs.contains("b"))
  }

  test("withShufflePosition: bijective positions, deterministic, decorrelated") {
    val pos = Sampling.withShufflePosition(df, "id", seed = 5)
      .select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (1L to 1000L))
    val corr = Sampling.shuffleQuality(df, "id", seed = 5)
      .as[Double].collect()(0)
    assert(math.abs(corr) < 0.1) // good shuffle ≈ uncorrelated
  }

  test("TransformSpec: func then removals then ordered selection") {
    val d = Seq((1L, "ab"), (2L, "cde")).toDF("id", "s")
    val spec = TransformSpec(
      func = x => x.withColumn("len", length($"s")),
      removedFields = Seq("s"),
      selectedFields = Seq("len", "id"))
    val out = spec(d)
    assert(out.columns.toSeq == Seq("len", "id"))
    assert(out.orderBy("id").as[(Int, Long)].collect().toSeq ==
      Seq((2, 1L), (3, 2L)))
  }

  test("TransformSpec raises on selecting a missing field") {
    val spec = TransformSpec(selectedFields = Seq("nope"))
    intercept[IllegalArgumentException](spec(df))
  }

  test("TransformSpec editedFields validates the func's actual output") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val d = Seq((1L, "ab"), (2L, "cde")).toDF("id", "s")
    // a correct declaration passes and the column flows through
    val good = TransformSpec(
      func = x => x.withColumn("len", length($"s")),
      editedFields = Seq(graft.schema.FieldSpec("len", IntegerType)))
    assert(good(d).columns.contains("len"))
    // declared but never produced → raises with the actual columns
    val absent = TransformSpec(
      editedFields = Seq(graft.schema.FieldSpec("nope", IntegerType)))
    val e1 = intercept[IllegalArgumentException](absent(d))
    assert(e1.getMessage.contains("nope"))
    // produced with the wrong type → raises naming both types
    val wrongType = TransformSpec(
      func = x => x.withColumn("len", length($"s")),
      editedFields = Seq(graft.schema.FieldSpec("len", LongType)))
    val e2 = intercept[IllegalArgumentException](wrongType(d))
    assert(e2.getMessage.contains("bigint") && e2.getMessage.contains("int"))
    // shaped edit: flat array of the element type
    val shaped = TransformSpec(
      func = x => x.withColumn("v", array(length($"s"), length($"s"))),
      editedFields = Seq(graft.schema.FieldSpec("v", IntegerType,
        shape = Seq(2))))
    assert(shaped(d).columns.contains("v"))
  }

  test("TransformSpec editedFields round-trips through GraftRead.transform") {
    import org.apache.spark.sql.types.LongType
    val u = scratch("transform-edit-ds")
    spark.range(20).toDF("x").write.mode("overwrite").parquet(u)
    val out = graft.sources.GraftRead.reader(spark, u)
      .transform(TransformSpec(
        func = d => d.withColumn("y", $"x" * 2),
        editedFields = Seq(graft.schema.FieldSpec("y", LongType)),
        removedFields = Seq("x")))
      .load()
    assert(out.columns.toSeq == Seq("y"))
    assert(out.agg(sum("y")).as[Long].collect()(0) == 380L)
  }

  test("TransformSpec plugs into GraftRead post-decode") {
    val u = scratch("transform-ds")
    spark.range(20).toDF("x").write.mode("overwrite").parquet(u)
    val out = graft.sources.GraftRead.reader(spark, u)
      .transform(TransformSpec(
        func = d => d.withColumn("y", $"x" * 2),
        removedFields = Seq("x")))
      .load()
    assert(out.columns.toSeq == Seq("y"))
    assert(out.agg(sum("y")).as[Long].collect()(0) == 380L)
  }

  test("withRunningTotal is an exclusive prefix sum, any partitioning") {
    val docs = Seq((1L, 10L), (2L, 0L), (3L, 7L), (4L, 5L))
      .toDF("id", "w")
    val out = Ranking.withRunningTotal(docs, Seq($"id"), "w", "cum")
      .select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq(1L -> 0L, 2L -> 10L, 3L -> 10L, 4L -> 17L))
    val rep = Ranking.withRunningTotal(docs.repartition(7), Seq($"id"), "w",
      "cum").select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
    assert(rep == out)
    // int value column and null-as-zero
    val ints = Seq((1L, Some(3)), (2L, None), (3L, Some(4)))
      .toDF("id", "w")
    val outI = Ranking.withRunningTotal(ints, Seq($"id"), "w", "cum")
      .select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
    assert(outI == Seq(1L -> 0L, 2L -> 3L, 3L -> 3L))
  }

  test("packed assigns chunk ids and offsets from the token stream") {
    val docs = Seq((1L, 3000L), (2L, 2000L), (3L, 100L), (4L, 5000L))
      .toDF("id", "n_tok")
    val out = Packing.packed(docs, Seq($"id"), "n_tok", chunkTokens = 4096L)
      .select("id", "tok_start", "chunk_id", "chunk_off")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L),       // starts chunk 0
      (2L, 3000L, 0L, 3000L), // still chunk 0, spans into 1
      (3L, 5000L, 1L, 904L),
      (4L, 5100L, 1L, 1004L)))
  }

  test("distributed rank: empty and single-row frames; bijective at size") {
    val empty = Ranking.withGlobalIndex(
      spark.range(0).toDF("id"), Seq(col("id")), "idx")
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "idx"))
    val one = Ranking.withGlobalIndex(
      spark.range(1).toDF("id"), Seq(col("id")), "idx")
      .as[(Long, Long)].collect().toSeq
    assert(one == Seq((0L, 0L)))
    // dense 0..n-1 positions under an arbitrary total order
    val idx = Ranking.withGlobalIndex(
      spark.range(777).toDF("id"), Seq(col("id").desc), "idx")
      .select("idx").as[Long].collect().sorted.toSeq
    assert(idx == (0L until 777L))
  }

  test("typed reader surface loadAs[T] (row-oriented make_reader flavor)") {
    val u = scratch("typed-ds")
    spark.range(5).toDF("id").withColumn("name", concat(lit("n"), $"id"))
      .write.mode("overwrite").parquet(u)
    val ds = graft.sources.GraftRead.reader(spark, u).loadAs[(Long, String)]()
    assert(ds.collect().sortBy(_._1).toSeq ==
      (0L until 5L).map(i => (i, s"n$i")))
  }

  test("saltedJoin matches the plain join on skewed data; salt spreads the hot key") {
    // 10k rows, 90% on ONE key — the shape AQE's skew split can miss
    val large = spark.range(10000).toDF("rid")
      .withColumn("k", when($"rid" % 10 === 0, $"rid" % 5).otherwise(lit(99L)))
    val small = Seq((99L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "label")
    val plain = large.join(small, Seq("k"))
      .select("rid", "k", "label").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), factor = 8)
      .select("rid", "k", "label").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(salted == plain)
    // a named cheap disambiguator gives identical results without
    // hashing the whole row
    val narrow = Skew.saltedJoin(large, small, Seq("k"), factor = 8,
      saltCols = Seq("rid"))
      .select("rid", "k", "label").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(narrow == plain)
    // the hot key's rows really do spread over many salt buckets
    val salts = large.filter($"k" === 99)
      .withColumn("s", pmod(xxhash64($"rid"), lit(8L)))
      .select("s").distinct().count()
    assert(salts == 8)
    val hist = Skew.keyHistogram(large, Seq("k"), topK = 1)
      .as[(Long, Long)].collect()(0)
    assert(hist._1 == 99L && hist._2 == 9000L)
  }

  test("distributed rank is invariant to input partitioning (q25 contract)") {
    val base = spark.range(500).toDF("id")
      .withColumn("k", md5(concat(lit("x"), $"id".cast("string"))))
    def ranks(parts: Int): Seq[(Long, Long)] =
      Ranking.withGlobalIndex(base.repartition(parts), Seq(col("k"), col("id")),
        "idx").select("id", "idx").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val r1 = ranks(1)
    assert(ranks(7) == r1)
    assert(ranks(32) == r1)
    // and the same through the user-facing seeded permutation
    val p1 = Sampling.withShufflePosition(base.repartition(3), "id", seed = 4)
      .select("id", "pos").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val p2 = Sampling.withShufflePosition(base.repartition(17), "id", seed = 4)
      .select("id", "pos").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(p1 == p2)
  }

  test("declared range partitioning elides downstream sort AND aggregation exchanges") {
    val base = spark.range(2000).toDF("id")
      .withColumn("k", md5($"id".cast("string")))
    val ranked = Ranking.withGlobalIndex(base, Seq(col("id")), "idx")
    // a consumer ordering by the rank's own sort key: no new sort/exchange
    val sorted = ranked.orderBy("id")
    sorted.collect()
    val sortedPlan = sorted.queryExecution.executedPlan.toString
    assert(!sortedPlan.contains("Exchange"),
      s"aligned orderBy was not elided:\n$sortedPlan")
    // a consumer grouping by the rank's sort key: clustering satisfied
    val agged = ranked.groupBy("id").agg(max("idx"))
    agged.collect()
    val aggedPlan = agged.queryExecution.executedPlan.toString
    assert(!aggedPlan.contains("Exchange hashpartitioning"),
      s"aligned groupBy re-shuffled:\n$aggedPlan")
  }

  test("distributed rank shuffles the data exactly once across its two jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val n = 10000L
    val listener = new SparkListener {
      @volatile var written = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        written += s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val base = spark.range(n).toDF("id")
        .withColumn("k", md5($"id".cast("string")))
      val out = Ranking.withGlobalIndex(base, Seq(col("k"), col("id")), "idx")
      assert(out.count() == n) // count job + main job
      // listener events are async — wait for the bus to drain
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.written < n && System.nanoTime() < deadline)
        Thread.sleep(50)
      // one shuffled pass over the data (+ slack for tiny agg rows);
      // a second shuffle of the same rows would read ~2n
      assert(listener.written >= n && listener.written <= n * 3 / 2,
        s"expected ~$n shuffle-written records, got ${listener.written}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sampleByStrata: per-stratum rates, deterministic, default drop") {
    val df = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val out = Sampling.sampleByStrata(df, "s", col("id"),
      Map("a" -> 1.0, "b" -> 0.3), seed = 7)
    val byS = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byS("a") == 1000L)               // fraction 1.0 keeps all
    assert(byS("b") > 200L && byS("b") < 400L) // ~0.3 of 1000
    assert(!byS.contains("c"))              // default 0.0 drops
    // determinism: same seed → identical membership; different seed → not
    val again = Sampling.sampleByStrata(df, "s", col("id"),
      Map("a" -> 1.0, "b" -> 0.3), seed = 7)
    assert(out.select("id").except(again.select("id")).count() == 0)
    val other = Sampling.sampleByStrata(df, "s", col("id"),
      Map("b" -> 0.3), seed = 8)
    assert(other.select("id")
      .except(out.filter($"s" === "b").select("id")).count() > 0)
  }

  test("weightedSample: deterministic, k-bounded, weight-monotone odds") {
    val df = (0L until 400L).map(i =>
      (i, if (i < 40L) 50L else 1L)).toDF("id", "w") // 10% heavy rows
    val s1 = Sampling.weightedSample(df, col("id"), "w", k = 60, seed = 3)
      .select("id").as[Long].collect().toSet
    assert(s1.size == 60)
    val s2 = Sampling.weightedSample(df, col("id"), "w", k = 60, seed = 3)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // pure function of (seed, key, weight)
    // heavy rows (50 tickets) must be overrepresented: 40 rows carry
    // 2000 of 2360 tickets → expect most of the 60 winners heavy
    val heavy = s1.count(_ < 40L)
    assert(heavy > 25, s"only $heavy heavy winners of 60")
    // null / non-positive weights never win
    val withBad = df.withColumn("w",
      when($"id" === 0L, lit(null)).when($"id" === 1L, 0L).otherwise($"w"))
    val s3 = Sampling.weightedSample(withBad, col("id"), "w", 400, seed = 3)
      .select("id").as[Long].collect().toSet
    assert(!s3.contains(0L) && !s3.contains(1L) && s3.size == 398)
    // fractional weight in (0,1) truncates to ZERO tickets, never two
    val frac = Seq((1L, 0.5), (2L, 1.0)).toDF("id", "w")
    val s4 = Sampling.weightedSample(frac, col("id"), "w", 10, seed = 3)
      .select("id").as[Long].collect().toSet
    assert(s4 == Set(2L))
    // reserved output names are refused up front
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSample(df.withColumn("rank", lit(1)),
        col("id"), "w", 5)
    }
    assert(e.getMessage.contains("rank"))
  }

  test("weightedSample kernel: exact mod-2^60 double-hash arithmetic, " +
      "and the plan carries it (no per-ticket HOF)") {
    // the wrapping-add + mask loop must equal big-integer
    // (h1 + t*h2) mod 2^60 for every ticket — the property the
    // DuckDB oracle's HUGEINT replay relies on
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val h1 = rnd.nextLong() & graft.codecs.HashRace.Mask
      val h2 = rnd.nextLong() & graft.codecs.HashRace.Mask
      val w = 1 + rnd.nextInt(1000)
      val want = (0 until w).map(t =>
        ((BigInt(h1) + BigInt(t) * BigInt(h2))
          .mod(BigInt(2).pow(60))).toLong).min
      assert(graft.codecs.HashRace.raceMin(h1, h2, w.toLong) == want,
        s"h1=$h1 h2=$h2 w=$w")
    }
    // spark.range, not a local Seq — ConvertToLocalRelation would
    // constant-fold the whole projection (kernel included) away
    val df = spark.range(10).select(col("id"), lit(5L).as("w"))
    val plan = Sampling.weightedSample(df, col("id"), "w", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ticket_race_min"), plan)
  }
}
