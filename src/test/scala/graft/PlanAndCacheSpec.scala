package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.NGram
import graft.schema.{CodecSpec, FieldSpec, GraftSchema}
import graft.sources.{GraftRead, Materialize}

/** Physical-plan and caching assertions that back load-bearing
  * performance claims (carried from the r1/r2 verdicts). */
class PlanAndCacheSpec extends SparkSpec {
  import spark.implicits._

  test("q07 top-k window is limit-pushed (WindowGroupLimit in the plan)") {
    // 3-value partition key = skew risk; InferWindowGroupLimit must
    // rewrite rank<=k so each task keeps k rows instead of sorting
    // whole groups. Asserted, not assumed (r1 carry-over).
    val df = SparkEntry.queries("q07_window_topk")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("range join plans as an equi-join on bins, never a nested loop") {
    val df = SparkEntry.queries("q57_range_join")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("__bin"), s"no bin key in join plan:\n$plan")
  }

  test("top-terms and stratified rank filters are limit-pushed") {
    for (q <- Seq("q52_top_terms", "q54_stratified")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$q: no WindowGroupLimit in:\n$plan")
    }
  }

  test("temperature mix rank filter is limit-pushed; budgets broadcast") {
    val df = SparkEntry.queries("q66_temperature_mix")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"budget join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"unexpected shuffle join in:\n$plan")
  }

  test("int8TopK joins are broadcast-only (no corpus shuffle join)") {
    val df = SparkEntry.queries("q64_ann_int8")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"corpus-shuffling join in int8TopK:\n$plan")
  }

  test("q101 unicode span removal: AQE broadcasts the dup-gram side, " +
      "no join degenerates to a nested loop") {
    val df = SparkEntry.queries("q101_unicode_spans")(spark,
      "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join in q101:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE broadcast missing from q101's runtime plan:\n$plan")
  }

  test("reader predicates reach the parquet scan (PushedFilters, F3/F4)") {
    val u = scratch("pushdown-ds")
    spark.range(1000).toDF("id").withColumn("v", $"id" * 2)
      .write.mode("overwrite").parquet(u)
    val df = GraftRead.reader(spark, u).predicate($"id" > 500).load()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,500)]"),
      s"predicate not pushed to scan:\n$scan")
    // and column pruning: selecting v only must not read id into the scan
    val pruned = GraftRead.reader(spark, u).fields("v").load()
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema: struct<v:bigint>"), pruned)
  }

  test("concurrent convert calls share one materialization (race fix)") {
    graft.sources.SparkConverter.clearCache()
    val src = spark.range(200).toDF("id").withColumn("x", $"id" * 3.0)
    val dir = scratch("conv-race")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val handles = Await.result(Future.sequence((1 to 4).map(_ =>
      Future(graft.sources.SparkConverter.convert(
        spark.range(200).toDF("id").withColumn("x", $"id" * 3.0), dir)))),
      120.seconds)
    assert(handles.map(_.url).distinct.size == 1,
      s"double-materialized: ${handles.map(_.url).distinct}")
    assert(graft.sources.SparkConverter.cacheSize == 1)
  }

  test("GraftRead.cache persists the decoded dataset (C1/C2)") {
    val u = scratch("cache-ds")
    spark.range(100).toDF("id").write.mode("overwrite").parquet(u)
    val df = GraftRead.reader(spark, u).cache().load()
    try {
      assert(df.storageLevel == StorageLevel.DISK_ONLY)
      assert(df.count() == 100)
      // second read served from the persisted partitions
      assert(df.count() == 100)
    } finally df.unpersist()
    // equivalent plans share one cache entry, so re-leveling needs the
    // first entry gone (CacheManager semantics)
    val mem = GraftRead.reader(spark, u).cache(StorageLevel.MEMORY_AND_DISK)
      .load()
    try assert(mem.storageLevel == StorageLevel.MEMORY_AND_DISK)
    finally mem.unpersist()
  }

  test("ngram non-overlap: multi-column groups never merge (ADVICE r2)") {
    // ("a","bc") and ("ab","c") collide under naive concat; each group
    // independently yields one greedy window — a merged key would
    // suppress the second group's window entirely.
    val rows = Seq(
      ("a", "bc", 1L, "x1"), ("a", "bc", 2L, "x2"), ("a", "bc", 3L, "x3"),
      ("ab", "c", 1L, "y1"), ("ab", "c", 2L, "y2"), ("ab", "c", 3L, "y3"))
      .toDF("g1", "g2", "ts", "tag")
    val spec = NGram.Spec(
      fields = Map(0 -> Seq("ts", "tag"), 1 -> Seq("tag")),
      deltaThreshold = 100L, timestampField = "ts",
      timestampOverlap = false)
    val out = NGram(rows, spec, groupCols = Seq("g1", "g2"))
      .orderBy("g1", "ts_t0")
      .select($"g1", $"g2", $"tag_t0", $"tag_t1")
      .as[(String, String, String, String)].collect().toSeq
    assert(out == Seq(("a", "bc", "x1", "x2"), ("ab", "c", "y1", "y2")))
  }

  test("ngram regex field selectors resolve against columns") {
    val ev = Seq((1L, 10L, 5L, "a"), (1L, 20L, 6L, "b"), (1L, 30L, 7L, "c"))
      .toDF("user_id", "ts", "val_x", "tag")
    val spec = NGram.Spec(
      fields = Map(0 -> Seq("ts", "val_.*"), 1 -> Seq("tag")),
      deltaThreshold = 100L, timestampField = "ts")
    val out = NGram(ev, spec, groupCols = Seq("user_id"))
    assert(out.columns.contains("val_x_t0"))
    assert(out.count() == 2)
    intercept[IllegalArgumentException] {
      NGram(ev, spec.copy(fields = Map(0 -> Seq("nope_.*"))),
        groupCols = Seq("user_id")).collect()
    }
  }

  test("variable multi-dim tensor shape derives the open dim at encode") {
    val u = scratch("varshape-ds")
    val src = spark.range(5).toDF("id")
      .withColumn("m", transform(sequence(lit(1), (lit(3) * ($"id" + 1)).cast("int")),
        i => i.cast("double")))
    val schema = GraftSchema("var", Seq(
      FieldSpec("id", org.apache.spark.sql.types.LongType),
      FieldSpec("m", org.apache.spark.sql.types.DoubleType,
        shape = Seq(-1, 3), codec = Some(CodecSpec("ndarray")))))
    Materialize.materialize(src, u, schema)
    val back = GraftRead.reader(spark, u).load()
      .select($"id", $"m.dims", $"m.data")
      .as[(Long, Seq[Int], Seq[Double])].collect().sortBy(_._1)
    back.foreach { case (id, dims, data) =>
      assert(dims == Seq((id + 1).toInt, 3))
      assert(data == (1 to 3 * (id.toInt + 1)).map(_.toDouble))
    }
  }

  test("GraftSession.scoped: clones runtime confs, pins shuffle " +
      "width, leaves the parent untouched") {
    val key = "spark.sql.legacy.parquet.nanosAsLong" // Tables' defense
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true") // runtime-set, NOT in SparkConf
      val scoped = GraftSession.scoped(spark, 2)
      // runtime conf survives into the scope (newSession alone drops it)
      assert(scoped.conf.get(key) == "true")
      assert(scoped.conf.get("spark.sql.shuffle.partitions") == "2")
      // parent keeps its width; scoped mutations don't leak back
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
      scoped.conf.set(key, "false")
      assert(spark.conf.get(key) == "true")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
