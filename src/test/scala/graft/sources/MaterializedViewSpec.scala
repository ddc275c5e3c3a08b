package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(tag: String): String =
    scratch(s"mv_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  private def mk(n: Int) = (1 to n).map { i =>
    (i.toLong % 7, s"t${i % 3}", i.toLong)
  }.toDF("k", "g", "x")

  test("incremental == one-shot recompute, and replaying a batch " +
      "is a no-op (partition-overwrite idempotency)") {
    val url = freshUrl("inc")
    val all = mk(200).cache()
    MaterializedView.init(spark, url, Seq("k", "g"), Seq("x"),
      buckets = 8)
    (0 until 4).foreach { b =>
      MaterializedView.applyDelta(spark, url,
        all.filter(pmod(col("x"), lit(4)) === b), b.toLong)
    }
    // replay batch 2 twice more — state must not change
    (0 until 2).foreach { _ =>
      MaterializedView.applyDelta(spark, url,
        all.filter(pmod(col("x"), lit(4)) === 2), 2L)
    }
    val got = MaterializedView.read(spark, url)
      .orderBy("k", "g").collect().map(_.toSeq)
    val want = all.groupBy("k", "g")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum("x").cast("long").as("sum_x"),
        min("x").as("min_x"), max("x").as("max_x"))
      .orderBy("k", "g").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    all.unpersist()
  }

  test("applyDelta rewrites ONLY the delta's partitions — earlier " +
      "batches' files are untouched (O(batch) increments)") {
    val url = freshUrl("touch")
    MaterializedView.init(spark, url, Seq("k"), Seq("x"), buckets = 4)
    MaterializedView.applyDelta(spark, url,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "x"), 0L)
    val root = new java.io.File(url)
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = files()
    MaterializedView.applyDelta(spark, url,
      Seq((3L, 30L)).toDF("k", "x"), 1L)
    val after = files()
    // batch 0's files survive bit-for-bit (same path, same mtime)
    assert(before.forall { case (p, m) => after.get(p).contains(m) })
    assert(after.size > before.size)
    assert(after.keys.filterNot(before.contains)
      .forall(_.contains("__batch=b00000001")))
  }

  test("readKeys prunes to the probed buckets and folds exactly") {
    val url = freshUrl("probe")
    val all = mk(300)
    MaterializedView.init(spark, url, Seq("k"), Seq("x"),
      buckets = 16)
    MaterializedView.applyDelta(spark, url, all.drop("g"), 0L)
    val got = MaterializedView.readKeys(spark, url, Seq(3L, 5L))
      .orderBy("k").collect().map(_.toSeq)
    val want = all.filter(col("k").isin(3L, 5L)).groupBy("k")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum("x").cast("long").as("sum_x"),
        min("x").as("min_x"), max("x").as("max_x"))
      .orderBy("k").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // pruning proof: the scan reads only the probed buckets' dirs
    val plan = MaterializedView.readKeys(spark, url, Seq(3L))
      .queryExecution.executedPlan.toString
    // partition filter must appear on __b (pruned scan), and the
    // single probed key hashes to exactly one bucket
    assert(plan.contains("__b"))
  }

  test("applyCdc maintains a retractable view from the snapshot " +
      "change feed — equals GROUP BY over the latest version, " +
      "through updates AND deletes, replays are no-ops") {
    val store = freshUrl("cdc_store")
    val view = freshUrl("cdc_view")
    val v1 = (1L to 60L).map(i => (i, i % 5, i * 10)).toDF("id", "g", "x")
    Snapshots.create(spark, store, v1, nFiles = 3)
    MaterializedView.init(spark, view, Seq("g"), Seq("x"),
      buckets = 4, retractable = true)
    // seed the view from v1 (a plain +1 delta)
    MaterializedView.applyDeltaKeyed(spark, view,
      v1.drop("id"), "v0-v1")
    // mutate: bump g-4 rows' x, delete g-0 rows, insert new ids
    val ups = v1.filter(col("g") === 4L)
      .select(col("id"), col("g"), (col("x") + 1L).as("x"),
        lit(false).as("del"))
      .unionByName(v1.filter(col("g") === 0L)
        .select(col("id"), col("g"), col("x"), lit(true).as("del")))
      .unionByName(Seq((100L, 7L, 5L, false), (101L, 7L, 6L, false))
        .toDF("id", "g", "x", "del"))
    Snapshots.upsert(spark, store, ups, "id", deleteCol = Some("del"))
    val feed = Snapshots.changes(spark, store, "id", 1, 2,
      includeOld = true)
    MaterializedView.applyCdc(spark, view, feed, "v1-v2")
    // replay the same span — no-op
    MaterializedView.applyCdc(spark, view, feed, "v1-v2")
    val got = MaterializedView.read(spark, view)
      .orderBy("g").collect().map(_.toSeq)
    val want = Snapshots.read(spark, store).groupBy("g")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum("x").cast("long").as("sum_x"))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // g = 0 left the view entirely (cnt folded to zero)
    assert(!got.exists(_.head == 0L))
    // a non-retractable view refuses the feed
    val plain = freshUrl("cdc_plain")
    MaterializedView.init(spark, plain, Seq("g"), Seq("x"))
    val e = intercept[IllegalArgumentException] {
      MaterializedView.applyCdc(spark, plain, feed, "v1-v2")
    }
    assert(e.getMessage.contains("retractable"))
  }

  test("moments views carry signed sum-of-squares partials that " +
      "retract exactly through the CDC feed") {
    val store = freshUrl("mom_store")
    val view = freshUrl("mom_view")
    val v1 = (1L to 50L).map(i => (i, i % 4, i)).toDF("id", "g", "x")
    Snapshots.create(spark, store, v1, nFiles = 3)
    MaterializedView.init(spark, view, Seq("g"), Seq("x"),
      buckets = 4, retractable = true, moments = true)
    MaterializedView.applyDeltaKeyed(spark, view, v1.drop("id"), "v0-v1")
    val ups = v1.filter(col("g") === 2L)
      .select(col("id"), col("g"), (col("x") * 3L).as("x"),
        lit(false).as("del"))
      .unionByName(v1.filter(col("g") === 0L)
        .select(col("id"), col("g"), col("x"), lit(true).as("del")))
    Snapshots.upsert(spark, store, ups, "id", deleteCol = Some("del"))
    MaterializedView.applyCdc(spark, view,
      Snapshots.changes(spark, store, "id", 1, 2, includeOld = true),
      "v1-v2")
    val got = MaterializedView.read(spark, view)
      .orderBy("g").collect().map(_.toSeq)
    val want = Snapshots.read(spark, store).groupBy("g")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum("x").cast("long").as("sum_x"),
        sum(col("x") * col("x")).cast("long").as("sq_x"))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("DistinctView: incremental HLL partials fold to the one-shot " +
      "summary; replays and duplicate deliveries are no-ops") {
    val url = freshUrl("dv")
    val rows = (1L to 300L).map(i => (i, i % 3, i % 97))
      .toDF("id", "g", "u")
    DistinctView.init(spark, url, Seq("g"), "u", p = 6, buckets = 4)
    (0 to 2).foreach { k =>
      DistinctView.applyDeltaKeyed(spark, url,
        rows.filter(col("id") % 3 === k), s"b$k")
    }
    // duplicate delivery of b1 AND a whole re-send of all rows under
    // b0's key: MAX-merge + partition overwrite absorb both
    DistinctView.applyDeltaKeyed(spark, url,
      rows.filter(col("id") % 3 === 1), "b1")
    val got = DistinctView.read(spark, url)
      .orderBy("g").collect().map(_.toSeq)
    val want = graft.ops.Sketch.hllSummary(rows, Seq("g"), "u", p = 6)
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("rebuild folds history into a fresh single-batch view with " +
      "identical reads (blue/green compaction)") {
    val url = freshUrl("fold")
    val url2 = freshUrl("fold2")
    val all = mk(120)
    MaterializedView.init(spark, url, Seq("k", "g"), Seq("x"),
      buckets = 8)
    (0 until 3).foreach { b =>
      MaterializedView.applyDelta(spark, url,
        all.filter(pmod(col("x"), lit(3)) === b), b.toLong)
    }
    MaterializedView.rebuild(spark, url, url2)
    val a = MaterializedView.read(spark, url)
      .orderBy("k", "g").collect().map(_.toSeq)
    val b = MaterializedView.read(spark, url2)
      .orderBy("k", "g").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // folded: exactly one __batch partition value remains
    def batches(u: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(u)).map(_.getPath)
        .flatMap("__batch=([A-Za-z0-9]+)".r.findFirstMatchIn(_))
        .map(_.group(1)).toSet
    }
    assert(batches(url) ==
      Set("b00000000", "b00000001", "b00000002") &&
      batches(url2) == Set("base"))
  }
  test("rebuild forwards retractable+moments flags: the rebuilt view " +
      "reads identically and still accepts the CDC feed") {
    val store = freshUrl("rb_store")
    val view = freshUrl("rb_view")
    val view2 = freshUrl("rb_view2")
    val v1 = (1L to 40L).map(i => (i, i % 3, i)).toDF("id", "g", "x")
    Snapshots.create(spark, store, v1, nFiles = 2)
    MaterializedView.init(spark, view, Seq("g"), Seq("x"),
      buckets = 4, retractable = true, moments = true)
    MaterializedView.applyDeltaKeyed(spark, view, v1.drop("id"), "v0-v1")
    MaterializedView.rebuild(spark, view, view2)
    // the rebuilt meta kept BOTH flags (regression: they were dropped,
    // so read() looked for min_/max_ columns the base never wrote)
    val m2 = MaterializedView.meta(spark, view2)
    assert(m2.retractable && m2.moments)
    val a = MaterializedView.read(spark, view)
      .orderBy("g").collect().map(_.toSeq)
    val b = MaterializedView.read(spark, view2)
      .orderBy("g").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.exists(_.length == 4)) // cnt,sum,sq
    // and the rebuilt view still retracts through CDC
    val ups = v1.filter(col("g") === 0L)
      .select(col("id"), col("g"), col("x"), lit(true).as("del"))
    Snapshots.upsert(spark, store, ups, "id", deleteCol = Some("del"))
    MaterializedView.applyCdc(spark, view2,
      Snapshots.changes(spark, store, "id", 1, 2, includeOld = true),
      "v1-v2")
    val got = MaterializedView.read(spark, view2)
      .orderBy("g").collect().map(_.toSeq)
    val want = Snapshots.read(spark, store).groupBy("g")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum("x").cast("long").as("sum_x"),
        sum(col("x") * col("x")).cast("long").as("sq_x"))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    assert(!got.exists(_.head == 0L))
  }
}
