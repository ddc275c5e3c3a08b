package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental join view: refresh equals a full re-join after any
  * mix of fact/dim inserts, updates and deletes — and refresh is
  * delta-priced, not history-priced. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    scratch(s"jv_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  private def viewSet(url: String): Set[(Long, Long, Long, String)] =
    JoinView.read(spark, url)
      .select(col("ck"), col("ok"), col("amt"), col("seg"))
      .as[(Long, Long, Long, String)].collect().toSet

  test("refresh equals full re-join across fact insert/update/" +
      "delete, dim update/delete, and a dangling fact insert") {
    val factUrl = fresh("fact"); val dimUrl = fresh("dim")
    val viewUrl = fresh("view")
    val fact = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
      (4L, 30L, 400L)).toDF("ok", "ck", "amt")
    val dim = Seq((10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("ck", "seg")
    Snapshots.create(spark, factUrl, fact, nFiles = 2)
    Snapshots.create(spark, dimUrl, dim, nFiles = 1)
    JoinView.init(spark, viewUrl, factUrl, dimUrl, "ok", "ck")
    assert(viewSet(viewUrl) == Set((10L, 1L, 100L, "a"),
      (10L, 2L, 200L, "a"), (20L, 3L, 300L, "b"),
      (30L, 4L, 400L, "c")))
    // fact: update ok=1 (amt), delete ok=2, insert ok=5 (valid dim),
    // insert ok=6 onto a MISSING dim key (must not appear)
    Snapshots.upsert(spark, factUrl, Seq(
      (1L, 10L, 111L, false), (2L, 10L, 0L, true),
      (5L, 20L, 500L, false), (6L, 99L, 600L, false))
      .toDF("ok", "ck", "amt", "del"), "ok",
      deleteCol = Some("del"))
    // dim: update ck=20's segment, delete ck=30 (retracts ok=4)
    Snapshots.upsert(spark, dimUrl, Seq(
      (20L, "B", false), (30L, "x", true))
      .toDF("ck", "seg", "del"), "ck", deleteCol = Some("del"))
    JoinView.refresh(spark, viewUrl, factUrl, dimUrl)
    val expect = Snapshots.read(spark, factUrl)
      .join(Snapshots.read(spark, dimUrl), Seq("ck"), "inner")
      .select(col("ck"), col("ok"), col("amt"), col("seg"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viewSet(viewUrl) == expect)
    assert(viewSet(viewUrl) == Set((10L, 1L, 111L, "a"),
      (20L, 3L, 300L, "B"), (20L, 5L, 500L, "B")))
    // a no-op refresh commits nothing
    val v = Snapshots.latest(spark, viewUrl)
    assert(JoinView.refresh(spark, viewUrl, factUrl, dimUrl) == v)
  }

  test("refresh rewrites only affected view files (copy-on-write, " +
      "delta-priced)") {
    val factUrl = fresh("cow_f"); val dimUrl = fresh("cow_d")
    val viewUrl = fresh("cow_v")
    val fact = (1L to 200L).map(i => (i, i % 10, i * 2))
      .toDF("ok", "ck", "amt")
    val dim = (0L to 9L).map(k => (k, s"s$k")).toDF("ck", "seg")
    Snapshots.create(spark, factUrl, fact, nFiles = 4)
    Snapshots.create(spark, dimUrl, dim, nFiles = 1)
    JoinView.init(spark, viewUrl, factUrl, dimUrl, "ok", "ck",
      nFiles = 8)
    // cluster by key so files hold disjoint key bands, then the
    // factKey bloom sidecar makes the upsert prune-able
    Snapshots.cluster(spark, viewUrl, "ok", nFiles = 8)
    val idx = fresh("cow_idx")
    RowGroupIndex.buildBloom(spark, viewUrl, Seq("ok"), idx)
    Snapshots.upsert(spark, factUrl,
      Seq((7L, 7L, 777L, false)).toDF("ok", "ck", "amt", "del"),
      "ok", deleteCol = Some("del"))
    val before = Snapshots
      .snap(spark, viewUrl, Snapshots.latest(spark, viewUrl))
      .files.toSet
    JoinView.refresh(spark, viewUrl, factUrl, dimUrl,
      bloomIndexUrl = Some(idx))
    val after = Snapshots
      .snap(spark, viewUrl, Snapshots.latest(spark, viewUrl))
      .files.toSet
    // the single-key refresh must keep most of the base files
    assert((before intersect after).nonEmpty,
      "refresh rewrote every file — not copy-on-write")
    assert(JoinView.read(spark, viewUrl)
      .filter(col("ok") === 7L).select(col("amt"))
      .as[Long].head() == 777L)
  }

  test("dim-driven invalidation prunes the fact probe by stats " +
      "bands and still matches the full re-join") {
    val factUrl = fresh("pr_f"); val dimUrl = fresh("pr_d")
    val viewUrl = fresh("pr_v")
    val fact = (1L to 400L).map(i => (i, i % 40, i))
      .toDF("ok", "ck", "amt")
    val dim = (0L to 39L).map(k => (k, s"s$k")).toDF("ck", "seg")
    Snapshots.create(spark, factUrl, fact, nFiles = 8)
    // cluster the fact store by the JOIN key and index its stats —
    // the layout that makes key-set pruning bite
    Snapshots.cluster(spark, factUrl, "ck", nFiles = 8)
    Snapshots.indexStats(spark, factUrl, Seq("ck"))
    Snapshots.create(spark, dimUrl, dim, nFiles = 1)
    JoinView.init(spark, viewUrl, factUrl, dimUrl, "ok", "ck")
    // the probe for one changed key must open a strict subset
    val fv = Snapshots.latest(spark, factUrl)
    val total = Snapshots.snap(spark, factUrl, fv).files.length
    val pruned = Snapshots.prunedFilesForKeys(spark, factUrl, fv,
      "ck", Seq(7L))
    assert(pruned.nonEmpty && pruned.length < total,
      s"expected a strict subset, got ${pruned.length}/$total")
    Snapshots.upsert(spark, dimUrl,
      Seq((7L, "CHANGED", false)).toDF("ck", "seg", "del"),
      "ck", deleteCol = Some("del"))
    JoinView.refresh(spark, viewUrl, factUrl, dimUrl)
    val expect = Snapshots.read(spark, factUrl)
      .join(Snapshots.read(spark, dimUrl), Seq("ck"), "inner")
      .select(col("ck"), col("ok"), col("amt"), col("seg"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viewSet(viewUrl) == expect)
    assert(JoinView.read(spark, viewUrl)
      .filter(col("seg") === "CHANGED").count() == 10L)
  }

  test("refresh refuses rolled-back bases; rebuild recovers " +
      "blue/green") {
    val factUrl = fresh("rb_f"); val dimUrl = fresh("rb_d")
    val viewUrl = fresh("rb_v"); val newUrl = fresh("rb_v2")
    Snapshots.create(spark, factUrl,
      Seq((1L, 10L, 1L)).toDF("ok", "ck", "amt"), nFiles = 1)
    Snapshots.append(spark, factUrl,
      Seq((2L, 10L, 2L)).toDF("ok", "ck", "amt"), nFiles = 1)
    Snapshots.create(spark, dimUrl,
      Seq((10L, "a")).toDF("ck", "seg"), nFiles = 1)
    JoinView.init(spark, viewUrl, factUrl, dimUrl, "ok", "ck")
    // simulate a store wiped and recreated BELOW the recorded
    // version (restore() itself always moves forward)
    val fs = new org.apache.hadoop.fs.Path(factUrl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(factUrl), true)
    Snapshots.create(spark, factUrl,
      Seq((9L, 10L, 9L)).toDF("ok", "ck", "amt"), nFiles = 1)
    intercept[IllegalArgumentException] {
      JoinView.refresh(spark, viewUrl, factUrl, dimUrl)
    }
    JoinView.rebuild(spark, viewUrl, newUrl, factUrl, dimUrl)
    assert(JoinView.read(spark, newUrl)
      .select(col("ok"), col("amt"), col("seg"))
      .as[(Long, Long, String)].collect().toSet ==
      Set((9L, 9L, "a")))
    // the old view is untouched and still readable
    assert(JoinView.read(spark, viewUrl).count() == 2L)
  }

  test("dim-key uniqueness violations fail loudly, not silently") {
    val factUrl = fresh("dup_f"); val dimUrl = fresh("dup_d")
    val viewUrl = fresh("dup_v")
    Snapshots.create(spark, factUrl,
      Seq((1L, 10L, 1L)).toDF("ok", "ck", "amt"), nFiles = 1)
    Snapshots.create(spark, dimUrl,
      Seq((10L, "a")).toDF("ck", "seg"), nFiles = 1)
    JoinView.init(spark, viewUrl, factUrl, dimUrl, "ok", "ck")
    // append (not upsert) a DUPLICATE dim key, then touch the fact
    // row so the refresh recomputes it → two current rows for one
    // fact key → the view upsert's duplicate check must throw
    Snapshots.append(spark, dimUrl,
      Seq((10L, "dup")).toDF("ck", "seg"), nFiles = 1)
    Snapshots.upsert(spark, factUrl,
      Seq((1L, 10L, 2L, false)).toDF("ok", "ck", "amt", "del"),
      "ok", deleteCol = Some("del"))
    intercept[IllegalArgumentException] {
      JoinView.refresh(spark, viewUrl, factUrl, dimUrl)
    }
  }
}
