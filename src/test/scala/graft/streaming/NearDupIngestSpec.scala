package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** nearDupIngest: cross-batch pairing against the persisted band
  * table, no intra-batch or self pairs, corpus accretion, restart
  * continuity.
  */
class NearDupIngestSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and then runs far away into the deep dark forest tonight"

  private def land(dir: java.io.File, name: String, modTime: Long,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = scratch("ndi-tmp-" + name)
    rows.toDF("doc_id", "text").coalesce(1).write
      .mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(dir, name)
    java.nio.file.Files.copy(part.toPath, dst.toPath)
    assert(dst.setLastModified(modTime))
  }

  private def ingest(srcDir: String, root: String): Unit = {
    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = GraftStream.nearDupIngest(src, "doc_id", "text",
        s"$root/bands", s"$root/docs", s"$root/pairs", streamId = "run1")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("batches pair only against earlier batches; corpus accretes") {
    val root = scratch("ndi-" + java.util.UUID.randomUUID().toString.take(8))
    val srcDir = new java.io.File(s"$root/src"); srcDir.mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    // batch 1: two near-identical docs — must NOT pair (intra-batch)
    land(srcDir, "a.parquet", t0,
      Seq((1L, base), (2L, base + " extra")))
    // batch 2: near-dup of doc 1 + an unrelated doc
    land(srcDir, "b.parquet", t0 + 5000,
      Seq((10L, base + " indeed"),
        (11L, "completely different words about cooking pasta with " +
          "tomatoes basil garlic olive oil and fresh bread rolls")))
    ingest(srcDir.getAbsolutePath, root)

    val pairs = spark.read.parquet(s"$root/pairs")
      .select("id_new", "id_corpus", "jaccard_ppm")
      .as[(Long, Long, Long)].collect().toSet
    // batch-2 doc 10 pairs with BOTH batch-1 docs (1 and 2); doc 11
    // with nothing; no intra-batch (1,2) pair
    assert(pairs.map(p => (p._1, p._2)) == Set((10L, 1L), (10L, 2L)))
    assert(pairs.forall(_._3 >= 500000L))
    // corpus now holds all four docs' bands and texts
    assert(spark.read.parquet(s"$root/docs").count() == 4)
    assert(spark.read.parquet(s"$root/bands")
      .select("doc_id").distinct().count() == 4)
  }

  test("a later run (restart) pairs against the persisted corpus") {
    val root = scratch("ndi2-" + java.util.UUID.randomUUID().toString.take(8))
    val src1 = new java.io.File(s"$root/src1"); src1.mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    land(src1, "a.parquet", t0, Seq((1L, base)))
    ingest(src1.getAbsolutePath, s"$root/state")

    // fresh stream, fresh checkpoint — tomorrow's run
    val src2 = new java.io.File(s"$root/src2"); src2.mkdirs()
    land(src2, "b.parquet", t0 + 5000, Seq((20L, base + " anew")))
    val s2 = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(src2.getAbsolutePath)
    // fresh checkpoint restarts batch ids at 0 — the distinct
    // streamId keeps run-2 batch 0 from colliding with run-1 batch 0
    val q = GraftStream.nearDupIngest(s2, "doc_id", "text",
        s"$root/state/bands", s"$root/state/docs", s"$root/state/pairs",
        streamId = "run2")
      .option("checkpointLocation", s"$root/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val pairs = spark.read.parquet(s"$root/state/pairs")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(pairs == Set((20L, 1L)))
  }

  test("a replayed batch is idempotent: no self-pairs, no duplicated " +
      "corpus rows (r7 advice: retry after append, before checkpoint)") {
    val root = scratch("ndi3-" + java.util.UUID.randomUUID().toString.take(8))
    val b1 = Seq((1L, base), (2L, base + " extra")).toDF("doc_id", "text")
    val b2 = Seq((10L, base + " indeed"), (11L, base + " indeed also"))
      .toDF("doc_id", "text")
    def ingest(df: DataFrame, id: Long): Unit =
      GraftStream.ingestBatch(df, id, "doc_id", "text",
        s"$root/bands", s"$root/docs", s"$root/pairs", streamId = "r")
    ingest(b1, 0)
    ingest(b2, 1)
    val firstPairs = spark.read.parquet(s"$root/pairs")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    // batch-2 docs pair only with batch-1 corpus docs — never with
    // each other (10/11 are near-identical, so a self-corpus bug
    // WOULD pair them)
    assert(firstPairs.nonEmpty)
    assert(firstPairs.forall { case (n, c) =>
      Set(10L, 11L)(n) && Set(1L, 2L)(c) })
    // the retry: batch 2 replays AFTER its bands/docs/pairs landed —
    // it must not see itself as corpus, and must not duplicate rows
    ingest(b2, 1)
    val replayPairs = spark.read.parquet(s"$root/pairs")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSeq
    assert(replayPairs.toSet == firstPairs)
    assert(replayPairs.size == firstPairs.size) // overwrote, not appended
    assert(spark.read.parquet(s"$root/docs").count() == 4)
    assert(spark.read.parquet(s"$root/bands")
      .groupBy("doc_id", "band_key").count()
      .filter($"count" > 1).isEmpty)
    // replay with a stricter threshold (operator restarted with new
    // args): the batch now verifies ZERO pairs — its stale pre-crash
    // partition must be CLEARED, not left in place by a skipped write
    GraftStream.ingestBatch(b2, 1, "doc_id", "text",
      s"$root/bands", s"$root/docs", s"$root/pairs", streamId = "r",
      minJaccardPpm = 1000000L)
    assert(!new java.io.File(s"$root/pairs/ingest_key=r_b1").exists(),
      "stale pairs partition survived an empty-result replay")
  }

  test("empty-replay hygiene: a batch that re-reads as EMPTY clears " +
      "its pre-crash partitions instead of leaving them as corpus " +
      "(r8 advice)") {
    val root = scratch("ndi5-" + java.util.UUID.randomUUID().toString.take(8))
    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    val b2 = Seq((10L, base + " indeed")).toDF("doc_id", "text")
    def ingest(df: DataFrame, id: Long): Unit =
      GraftStream.ingestBatch(df, id, "doc_id", "text",
        s"$root/bands", s"$root/docs", s"$root/pairs", streamId = "r")
    ingest(b1, 0)
    ingest(b2, 1) // pre-crash attempt: bands/docs/pairs for r_b1 land
    assert(new java.io.File(s"$root/bands/ingest_key=r_b1").exists())
    // the replay re-reads batch 1 as EMPTY (retention expiry on a
    // non-replayable source): every r_b1 partition must be dropped
    ingest(b1.filter($"doc_id" < 0L), 1)
    Seq("bands", "docs", "pairs").foreach { store =>
      assert(!new java.io.File(s"$root/$store/ingest_key=r_b1").exists(),
        s"stale $store partition survived an empty replay")
    }
    // batch 1's corpus is intact; a later batch pairs against it only
    ingest(b2, 2)
    val pairs = spark.read.parquet(s"$root/pairs")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L)),
      s"ghost corpus rows from the dropped batch resurfaced: $pairs")
  }

  test("partial-crash replay: bands landed, docs/pairs did not " +
      "(the r7 advice scenario) — no self-pairs, state converges") {
    val root = scratch("ndi4-" + java.util.UUID.randomUUID().toString.take(8))
    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    val b2 = Seq((10L, base + " indeed"), (11L, base + " indeed also"))
      .toDF("doc_id", "text")
    def ingest(df: DataFrame, id: Long): Unit =
      GraftStream.ingestBatch(df, id, "doc_id", "text",
        s"$root/bands", s"$root/docs", s"$root/pairs", streamId = "r")
    ingest(b1, 0)
    ingest(b2, 1)
    // simulate the crash point: batch 1's BANDS write committed but
    // its docs/pairs writes did not
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr)
      f.delete()
    }
    rmr(new java.io.File(s"$root/docs/ingest_key=r_b1"))
    rmr(new java.io.File(s"$root/pairs/ingest_key=r_b1"))
    // the retry: its own pre-crash bands are in the store but must be
    // invisible to it
    ingest(b2, 1)
    val pairs = spark.read.parquet(s"$root/pairs")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (n, c) => Set(10L, 11L)(n) && c == 1L },
      s"self-pairs leaked through a partial-crash replay: $pairs")
    assert(spark.read.parquet(s"$root/docs").count() == 3)
    assert(spark.read.parquet(s"$root/bands")
      .groupBy("doc_id", "band_key").count()
      .filter($"count" > 1).isEmpty)
  }
}
