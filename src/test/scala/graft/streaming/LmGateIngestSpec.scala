package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.TextAnalysis

/** lmGateIngest: static-LM gating per micro-batch, partition-per-
  * batch layout, replay idempotence incl. the changed-admissions
  * and empty-replay edges.
  */
class LmGateIngestSpec extends SparkSpec {
  import spark.implicits._

  // LM corpus: "a b" dominates (kept bigram), everything else backs off
  private val lmCorpus = Seq(
    (1L, "a b a b a b"), (2L, "a b c d")).toDF("doc_id", "text")
  private def lm = TextAnalysis.lmTables(lmCorpus, "text", minCount = 2L)

  private def land(dir: java.io.File, name: String, modTime: Long,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = scratch("lmg-tmp-" + name)
    rows.toDF("doc_id", "text").coalesce(1).write
      .mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(dir, name)
    java.nio.file.Files.copy(part.toPath, dst.toPath)
    assert(dst.setLastModified(modTime))
  }

  test("multi-batch gate: admitted docs land per-batch and equal " +
      "the batch scoring; below-threshold docs are dropped") {
    val root = scratch("lmg-" + java.util.UUID.randomUUID().toString.take(8))
    val srcDir = new java.io.File(s"$root/src"); srcDir.mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    // doc 10 "a b a b": p(a b)=4/4, p(b a)=2/4 (both bigrams kept)
    // → mean (2·1000000 + 500000) div 3 = 833333; "x y z" backs off to 0
    land(srcDir, "a.parquet", t0, Seq((10L, "a b a b"), (11L, "x y z")))
    land(srcDir, "b.parquet", t0 + 5000, Seq((20L, "a b")))
    val (uni, bi) = lm
    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.getAbsolutePath)
    val q = GraftStream.lmGateIngest(src, "doc_id", "text", uni, bi,
        minMeanPpm = 500000L, s"$root/out", streamId = "run1")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$root/out")
      .select($"doc_id", $"text", $"mean_ppm", $"ingest_key")
      .as[(Long, String, Long, String)].collect().toSet
    assert(out == Set(
      (10L, "a b a b", 833333L, "run1_b0"),
      (20L, "a b", 1000000L, "run1_b1")))
  }

  test("replay idempotence: same batch twice = one copy; a replay " +
      "with nothing admitted drops its own stale partition") {
    val root = scratch("lmg-" + java.util.UUID.randomUUID().toString.take(8))
    val (uni, bi) = lm
    val b0 = Seq((1L, "a b a b")).toDF("doc_id", "text")
    GraftStream.lmGateBatch(b0, 0L, "doc_id", "text", uni, bi,
      500000L, s"$root/out", "run1")
    GraftStream.lmGateBatch(b0, 0L, "doc_id", "text", uni, bi,
      500000L, s"$root/out", "run1")
    assert(spark.read.parquet(s"$root/out").count() == 1L)
    // replay of batch 0 that now admits nothing: partition vanishes
    GraftStream.lmGateBatch(
      Seq((1L, "x y")).toDF("doc_id", "text"), 0L, "doc_id", "text",
      uni, bi, 500000L, s"$root/out", "run1")
    val p = new java.io.File(s"$root/out/ingest_key=run1_b0")
    assert(!p.exists(), "stale partition survived a changed replay")
  }

  test("compactIngestStore: per-partition file merge, data and " +
      "layout intact, idempotent, replay still partition-scoped") {
    val root = scratch("lmg-" + java.util.UUID.randomUUID().toString.take(8))
    val url = s"$root/out"
    // two batches in the gate's schema, each force-written as 4
    // files per partition
    val rows = (1L to 40L).map(i => (i, s"doc $i body", 1L, 0L, 0L))
    val cols = Seq("doc_id", "text", "n_trans", "score_sum", "mean_ppm")
    rows.take(20).toDF(cols: _*).repartition(4)
      .withColumn("ingest_key", lit("run1_b0"))
      .write.partitionBy("ingest_key").parquet(url)
    rows.drop(20).toDF(cols: _*).repartition(4)
      .withColumn("ingest_key", lit("run1_b1"))
      .write.mode("append").partitionBy("ingest_key").parquet(url)
    val beforeData = spark.read.parquet(url)
      .select($"doc_id", $"text", $"ingest_key")
      .as[(Long, String, String)].collect().toSet
    val (rw, nb, na) = GraftStream.compactIngestStore(spark, url)
    assert(rw == 2 && nb == 8 && na == 2, s"($rw, $nb, $na)")
    val afterData = spark.read.parquet(url)
      .select($"doc_id", $"text", $"ingest_key")
      .as[(Long, String, String)].collect().toSet
    assert(afterData == beforeData)
    // second pass: nothing left to do
    assert(GraftStream.compactIngestStore(spark, url) == ((0, 2, 2)))
    // a replay after compaction still overwrites ONLY its partition
    val (uni, bi) = lm
    GraftStream.lmGateBatch(Seq((99L, "a b a b")).toDF("doc_id", "text"),
      0L, "doc_id", "text", uni, bi, 500000L, url, "run1")
    val post = spark.read.parquet(url)
      .select($"doc_id", $"ingest_key").as[(Long, String)].collect().toSet
    assert(post.filter(_._2 == "run1_b0").map(_._1) == Set(99L))
    assert(post.filter(_._2 == "run1_b1").map(_._1) == (21L to 40L).toSet)
  }

  test("compactIngestStore crash recovery: committed staging rolls " +
      "FORWARD (no rows lost), uncommitted staging rolls BACK") {
    val root = scratch("lmg-" + java.util.UUID.randomUUID().toString.take(8))
    val url = s"$root/out"
    val cols = Seq("doc_id", "text", "n_trans", "score_sum", "mean_ppm")
    (1L to 20L).map(i => (i, s"doc $i", 1L, 0L, 0L)).toDF(cols: _*)
      .repartition(3).withColumn("ingest_key", lit("run1_b0"))
      .write.partitionBy("ingest_key").parquet(url)
    val part = new java.io.File(s"$url/ingest_key=run1_b0")
    def parquets() = part.listFiles().filter(_.getName.endsWith(".parquet"))
    // simulate a crash AFTER the commit marker and old-file deletes,
    // BEFORE promotion: stage the coalesced rewrite, write _COMMIT
    // listing the olds, delete the olds
    val tmp = new java.io.File(part, "_compact_tmp")
    spark.read.parquet(part.getAbsolutePath).coalesce(1)
      .write.parquet(tmp.getAbsolutePath)
    val oldNames = parquets().map(_.getName)
    java.nio.file.Files.write(new java.io.File(tmp, "_COMMIT").toPath,
      oldNames.mkString("\n").getBytes("UTF-8"))
    oldNames.foreach(n => new java.io.File(part, n).delete())
    // the store now looks EMPTY to readers — recovery must restore it
    val (rw, nb, na) = GraftStream.compactIngestStore(spark, url)
    assert(!tmp.exists())
    assert((rw, nb, na) == ((0, 1, 1)), s"($rw, $nb, $na)")
    assert(spark.read.parquet(url).select($"doc_id")
      .as[Long].collect().toSet == (1L to 20L).toSet)
    // uncommitted staging (no marker): roll back, old rows untouched
    spark.read.parquet(part.getAbsolutePath).limit(3).coalesce(1)
      .write.parquet(tmp.getAbsolutePath)
    assert(GraftStream.compactIngestStore(spark, url) == ((0, 1, 1)))
    assert(!tmp.exists())
    assert(spark.read.parquet(url).count() == 20L)
  }

  test("empty replay on a store that does not exist yet is a no-op") {
    val root = scratch("lmg-" + java.util.UUID.randomUUID().toString.take(8))
    val (uni, bi) = lm
    GraftStream.lmGateBatch(
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      0L, "doc_id", "text", uni, bi, 500000L, s"$root/out", "run1")
    assert(!new java.io.File(s"$root/out").exists())
  }
}
