package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.sources.Snapshots

/** Streaming change-data feed (`format("graft-changes")`): offsets
  * are manifest versions, each micro-batch emits PER-VERSION
  * [[Snapshots.changes]] diffs tagged `_commit_version`, version 1
  * arrives as the initial-contents inserts, restarts resume from the
  * checkpointed version, and the accumulated feed replays to the
  * exact store head — the streaming read for MUTATING stores the
  * append-only table source refuses. */
class GraftCdfSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(tagN: String): (String, String, String) = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    (new java.io.File(scratch(s"cdf/$tagN-$tag")).getAbsolutePath,
      scratch(s"cdf_ck/$tagN-$tag"),
      scratch(s"cdf_out/$tagN-$tag"))
  }

  private def drain(url: String, ck: String, out: String,
      extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft-changes")
      .option("url", url).option("keyCol", "id")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("initial snapshot as inserts, per-version diffs across " +
      "upsert/delete, delta-only resumption, feed replays to the " +
      "head state") {
    val (url, ck, out) = freshDirs("main")
    Snapshots.create(spark, url,
      (1L to 40L).map(i => (i, i * 10, s"p$i")).toDF("id", "v", "tag"),
      nFiles = 2, clusterBy = Some("id"))
    // v2: upsert — updates 5..8, inserts 41..43, deletes 9..10
    Snapshots.upsert(spark, url,
      ((5L to 8L).map(i => (i, i * 1000, s"u$i", false)) ++
        (41L to 43L).map(i => (i, i * 10, s"p$i", false)) ++
        (9L to 10L).map(i => (i, 0L, "", true)))
        .toDF("id", "v", "tag", "del"),
      "id", deleteCol = Some("del"))
    // v3: copy-on-write range delete 1..3
    Snapshots.deleteWhere(spark, url, "id", 1L, 3L)

    drain(url, ck, out)
    val feed = spark.read.parquet(out)
      .select(col("id"), col("v"), col("_change"),
        col("_commit_version"))
      .as[(Long, Long, String, Long)].collect().toSeq

    val v1 = feed.filter(_._4 == 1L)
    assert(v1.size == 40 && v1.forall(_._3 == "insert"),
      s"v1 must be the initial contents as inserts, got ${v1.size}")
    val v2 = feed.filter(_._4 == 2L)
    assert(v2.count(_._3 == "update") == 4 &&
      v2.count(_._3 == "insert") == 3 &&
      v2.count(_._3 == "delete") == 2, s"v2 feed wrong: $v2")
    assert(v2.filter(_._3 == "update").map(r => r._1 -> r._2).toMap
      == (5L to 8L).map(i => i -> i * 1000).toMap,
      "updates must carry NEW values")
    val v3 = feed.filter(_._4 == 3L)
    assert(v3.map(r => (r._1, r._3)).sorted ==
      (1L to 3L).map(i => (i, "delete")),
      s"v3 must be the three banded deletes: $v3")

    // replaying the feed (last change per key wins, deletes drop)
    // reconstructs the head exactly
    val byKey = feed.groupBy(_._1).map { case (k, rows) =>
      k -> rows.maxBy(_._4)
    }
    val replayed = byKey.values.filter(_._3 != "delete")
      .map(r => (r._1, r._2)).toSet
    val head = Snapshots.read(spark, url).select(col("id"), col("v"))
      .as[(Long, Long)].collect().toSet
    assert(replayed == head, "feed replay must equal the head")

    // delta-only resumption: append v4 (pure insert into the feed)
    Snapshots.append(spark, url,
      Seq((100L, 1L, "x")).toDF("id", "v", "tag"))
    drain(url, ck, out)
    val after = spark.read.parquet(out)
      .select(col("id"), col("_commit_version"))
      .as[(Long, Long)].collect().toSeq
    assert(after.size == feed.size + 1 &&
      after.contains((100L, 4L)),
      "restart must emit ONLY the new version's diff")
  }

  test("includeOld emits update_old pre-images; startingVersion " +
      "skips the bootstrap snapshot") {
    val (url, ck, out) = freshDirs("old")
    Snapshots.create(spark, url,
      (1L to 10L).map(i => (i, i * 10)).toDF("id", "v"), nFiles = 1)
    Snapshots.upsert(spark, url,
      Seq((3L, 333L), (11L, 110L)).toDF("id", "v"), "id")
    drain(url, ck, out, Map("includeOld" -> "true",
      "startingVersion" -> "1"))
    val feed = spark.read.parquet(out)
      .select(col("id"), col("v"), col("_change"),
        col("_commit_version"))
      .as[(Long, Long, String, Long)].collect().toSeq
    // no v1 snapshot rows — the feed starts at the 1→2 diff
    assert(feed.forall(_._4 == 2L), s"startingVersion ignored: $feed")
    assert(feed.toSet == Set((3L, 333L, "update", 2L),
      (3L, 30L, "update_old", 2L), (11L, 110L, "insert", 2L)),
      s"got $feed")
  }

  test("metadata-only and compaction commits emit nothing; a " +
      "rename mid-stream keeps the declared schema") {
    val (url, ck, out) = freshDirs("meta")
    Snapshots.create(spark, url,
      (1L to 12L).map(i => (i, i)).toDF("id", "v"), nFiles = 4)
    drain(url, ck, out)
    Snapshots.compactSmall(spark, url,
      smallBytes = Long.MaxValue,
      targetBytes = Long.MaxValue) // v2: pure rewrite
    Snapshots.setTag(spark, url, "t1") // tag: no version
    drain(url, ck, out)
    val feed = spark.read.parquet(out)
    assert(feed.count() == 12L,
      "compaction/tag must add nothing to the feed")
    assert(feed.select(max(col("_commit_version"))).as[Long]
      .head() == 1L)
  }

  test("the CDC stream drives incremental view maintenance: a " +
      "retractable MV maintained by foreachBatch(applyCdc) equals " +
      "the batch GROUP BY across upserts and deletes") {
    import graft.sources.MaterializedView
    val (url, ck, _) = freshDirs("ivm")
    val view = s"$url-view"
    Snapshots.create(spark, url,
      (1L to 60L).map(i => (i, i % 5, i * 10)).toDF("id", "g", "x"),
      nFiles = 3)
    MaterializedView.init(spark, view, Seq("g"), Seq("x"),
      buckets = 4, retractable = true)
    Snapshots.upsert(spark, url,
      ((1L to 12L).map(i => (i, i % 5, i * 1000, false)) ++
        Seq((100L, 7L, 5L, false)) ++
        (55L to 60L).map(i => (i, i % 5, 0L, true)))
        .toDF("id", "g", "x", "del"),
      "id", deleteCol = Some("del"))
    def drain(): Unit = spark.readStream.format("graft-changes")
      .option("url", url).option("keyCol", "id")
      .option("includeOld", "true").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          id: Long) =>
        // the initial snapshot arrives as plain inserts (+1), so
        // the stream bootstraps the view too; batchId keys make
        // replays no-ops (applyCdc's idempotent partition contract)
        MaterializedView.applyCdc(batch.sparkSession, view,
          batch.drop("_commit_version"), s"b$id")
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    drain()
    def state(): Seq[Seq[Any]] = MaterializedView.read(spark, view)
      .orderBy("g").collect().toSeq.map(_.toSeq)
    def want(): Seq[Seq[Any]] = Snapshots.read(spark, url)
      .groupBy("g").agg(count(lit(1)).cast("long").as("cnt"),
        sum("x").cast("long").as("sum_x"))
      .orderBy("g").collect().toSeq.map(_.toSeq)
    assert(state() == want(),
      "stream-maintained view must equal the batch GROUP BY")
    // more mutations, another drain: only the delta is applied
    Snapshots.deleteWhere(spark, url, "id", 20L, 30L)
    drain()
    assert(state() == want(),
      "the second drain must fold the delete retraction exactly")
  }

  test("a resume offset vacuum retired refuses loudly instead of " +
      "re-bootstrapping (silent duplication)") {
    val (url, ck, out) = freshDirs("vac")
    Snapshots.create(spark, url,
      (1L to 10L).map(i => (i, i)).toDF("id", "v"), nFiles = 1)
    drain(url, ck, out) // consumed through v1
    (1 to 3).foreach(k => Snapshots.append(spark, url,
      Seq((10L + k, 0L)).toDF("id", "v"), nFiles = 1))
    // retire everything below v4 — including the checkpointed v1
    Snapshots.vacuum(spark, url, keepFrom = 4, graceMs = 0)
    val e = intercept[Exception] { drain(url, ck, out) }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("vacuumed")),
      s"expected the vacuumed-resume refusal, got ${chain(e).take(3)}")
  }

  test("bootstrap over pre-rename versions aligns by PHYSICAL " +
      "slot: old steps' values appear under the declared (renamed) " +
      "name, never as nulls") {
    val (url, ck, out) = freshDirs("ren-boot")
    Snapshots.create(spark, url,
      (1L to 8L).map(i => (i, i * 10)).toDF("id", "v"), nFiles = 2)
    Snapshots.upsert(spark, url,
      Seq((2L, 222L)).toDF("id", "v"), "id")       // v2, pre-rename
    Snapshots.renameColumn(spark, url, "v", "w")   // v3, metadata-only
    Snapshots.upsert(spark, url,
      Seq((9L, 90L)).toDF("id", "w"), "id")        // v4, post-rename
    drain(url, ck, out) // fresh stream: declared schema has "w"
    val feed = spark.read.parquet(out)
      .select(col("id"), col("w"), col("_change"),
        col("_commit_version"))
      .as[(Long, java.lang.Long, String, Long)].collect().toSeq
    val v1 = feed.filter(_._4 == 1L)
    assert(v1.size == 8 && v1.forall(r => r._2 == r._1 * 10),
      s"pre-rename bootstrap rows must carry real values under the " +
        s"declared name, got $v1")
    assert(feed.filter(_._4 == 2L).map(r => (r._1, r._2.longValue))
      == Seq((2L, 222L)), "pre-rename update must align")
    assert(feed.count(_._4 == 3L) == 0,
      "the rename commit is metadata-only — zero feed rows")
    assert(feed.filter(_._4 == 4L).map(r => (r._1, r._2.longValue))
      == Seq((9L, 90L)), "post-rename step must pass through")
  }

  test("a restart AFTER a rename mid-history resumes with real " +
      "values for the renamed column (physical alignment across " +
      "the restart's re-pinned schema)") {
    val (url, ck, _) = freshDirs("ren-restart")
    Snapshots.create(spark, url,
      (1L to 6L).map(i => (i, i * 10)).toDF("id", "v"), nFiles = 1)
    val got = scala.collection.mutable.ListBuffer
      .empty[(Long, Long, Long)]
    def drainBuf(): Unit = spark.readStream.format("graft-changes")
      .option("url", url).option("keyCol", "id").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vc = if (b.columns.contains("w")) "w" else "v"
        got.synchronized { got ++= b
          .select(col("id"), col(vc), col("_commit_version"))
          .as[(Long, Long, Long)].collect() }
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    drainBuf() // consumed through v1 under declared name "v"
    Snapshots.renameColumn(spark, url, "v", "w") // v2
    Snapshots.upsert(spark, url,
      Seq((3L, 999L)).toDF("id", "w"), "id")     // v3
    got.clear()
    drainBuf() // restart: declared schema re-pins to "w"
    assert(got.toSeq == Seq((3L, 999L, 3L)),
      s"post-restart feed must carry the renamed column's real " +
        s"values, got $got")
  }

  test("maxVersionsPerTrigger drains a long version gap as " +
      "bounded batches; a mid-drain crash resumes exactly (no " +
      "duplicate, no loss); the feed is boundary-invariant") {
    val (url, ck, _) = freshDirs("admit")
    Snapshots.create(spark, url,
      (1L to 5L).map(i => (i, i)).toDF("id", "v"), nFiles = 1)
    // the long-gap shape: many small commits while no stream runs
    (1 to 36).foreach(k => Snapshots.append(spark, url,
      Seq((100L + k, k.toLong)).toDF("id", "v"), nFiles = 1))
    // 37 versions pending; cap 7 → ceil(37/7) = 6 bounded batches
    val batches = scala.collection.mutable.ListBuffer
      .empty[Seq[(Long, Long, Long)]]
    @volatile var crashAfter = -1 // -1 = never crash
    def drainCapped(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("url", url).option("keyCol", "id")
        .option("maxVersionsPerTrigger", "7").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame,
            _: Long) =>
          batches.synchronized { batches += b
            .select(col("id"), col("v"), col("_commit_version"))
            .as[(Long, Long, Long)].collect().toSeq }
          if (crashAfter >= 0 && batches.size >= crashAfter)
            sys.error("injected mid-drain crash")
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch { case e: Exception
          if e.getMessage != null || e.getCause != null => () }
    }
    crashAfter = 2
    drainCapped() // crashes after 2 committed-ish batches
    val consumed = batches.size
    assert(consumed >= 2, s"crash injection did not run: $consumed")
    crashAfter = -1
    drainCapped() // restart: resumes from the checkpoint exactly
    // every batch bounded: ≤ 7 distinct versions each
    batches.foreach { b =>
      assert(b.map(_._3).distinct.size <= 7,
        s"batch exceeded the admission cap: ${b.map(_._3).distinct}")
    }
    assert(batches.size >= 6,
      s"a 37-version gap at cap 7 must take ≥6 batches, got " +
        s"${batches.size}")
    // exactly-once across the crash: the engine replays the failed
    // batch, so dedup by (id, version) must reconstruct the feed
    // with NO loss and the post-dedup feed must equal the uncapped
    // whole-history feed (boundary invariance)
    val feed = batches.flatten.distinct.sortBy(r => (r._3, r._1))
    val want = Snapshots.changesAll(spark, url, "id")
      .select(col("id"), col("v"), col("_commit_version"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._3, r._1))
    assert(feed == want,
      s"capped+crashed drain must replay to the exact feed " +
        s"(${feed.size} vs ${want.size})")
  }

  test("missing options and unknown stores refuse loudly") {
    val (url, _, _) = freshDirs("bad")
    Snapshots.create(spark, url, Seq((1L, 1L)).toDF("id", "v"),
      nFiles = 1)
    val e1 = intercept[Exception] {
      spark.readStream.format("graft-changes")
        .option("url", url).load()
    }
    assert(e1.getMessage.contains("keyCol"))
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-changes")
        .option("url", s"$url-nope").option("keyCol", "id").load()
    }
    assert(e2.getMessage.contains("no snapshot store"))
  }
}
