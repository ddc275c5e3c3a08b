package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Store-layer hardening from the round-15 deep review: pinned
  * schema on pruned reads, honest nullability across evolution,
  * case-insensitive CHECK applicability, empty-version readability,
  * and the crash-debris vacuum sweep. */
class StoreHardeningSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    scratch(s"hard_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  test("readWhere keeps evolved columns when pruning lands on " +
      "pre-evolution files only") {
    val url = fresh("rw")
    val base = (1L to 100L).map(i => (i, i)).toDF("id", "a")
    Snapshots.create(spark, url, base, nFiles = 2)
    Snapshots.cluster(spark, url, "a", nFiles = 2)
    Snapshots.append(spark, url,
      (101L to 110L).map(i => (i, i, s"v$i")).toDF("id", "a", "b"),
      nFiles = 1)
    Snapshots.indexStats(spark, url, Seq("a"))
    val out = Snapshots.readWhere(spark, url, "a", 1L, 50L)
    assert(out.columns.contains("b"),
      s"evolved column vanished: ${out.columns.mkString(",")}")
    assert(out.count() == 50L)
    assert(out.filter(col("b").isNull).count() == 50L)
  }

  test("append that omits a base column widens it to nullable — " +
      "null audits see the new rows") {
    val url = fresh("nul")
    Snapshots.create(spark, url,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), nFiles = 1)
    Snapshots.append(spark, url,
      Seq(Tuple1(3L)).toDF("id"), nFiles = 1)
    val df = Snapshots.read(spark, url)
    assert(df.schema("x").nullable,
      "pinned schema still claims x is non-nullable")
    assert(df.filter(col("x").isNull).count() == 1L)
  }

  test("CHECK constraints apply case-insensitively, like Spark's " +
      "own resolution") {
    val url = fresh("ck")
    Snapshots.create(spark, url,
      Seq((1L, 5L)).toDF("id", "amount"), nFiles = 1)
    Snapshots.addConstraint(spark, url, "pos", "AMOUNT > 0")
    intercept[IllegalArgumentException] {
      Snapshots.upsert(spark, url,
        Seq((2L, -1L)).toDF("id", "amount"), "id")
    }
    // and a satisfied write still lands
    Snapshots.upsert(spark, url,
      Seq((2L, 7L)).toDF("id", "amount"), "id")
    assert(Snapshots.read(spark, url).count() == 2L)
  }

  test("an all-delete upsert leaves a readable empty version whose " +
      "CDC feed and re-inserts keep working") {
    val url = fresh("empty")
    Snapshots.create(spark, url,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), nFiles = 1)
    Snapshots.upsert(spark, url,
      Seq((1L, "a", true), (2L, "b", true)).toDF("id", "v", "del"),
      "id", deleteCol = Some("del"))
    assert(Snapshots.read(spark, url).count() == 0L)
    val feed = Snapshots.changes(spark, url, "id", 1, 2,
      includeOld = false)
    assert(feed.filter(col("_change") === "delete").count() == 2L)
    Snapshots.upsert(spark, url,
      Seq((9L, "z")).toDF("id", "v"), "id")
    assert(Snapshots.read(spark, url).as[(Long, String)]
      .collect().toSet == Set((9L, "z")))
  }

  test("vacuum sweeps crashed staging dirs and tmp manifests") {
    val url = fresh("debris")
    Snapshots.create(spark, url,
      Seq((1L, "a")).toDF("id", "v"), nFiles = 1)
    val root = new Path(url)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(root, "_snap_stage_deadbeef")
    fs.mkdirs(stage)
    val junk = new Path(stage, "part-00000.parquet")
    fs.create(junk, false).close()
    val tmpManifest = new Path(new Path(root, "_snap"), "_tmp-v99-x")
    fs.create(tmpManifest, false).close()
    val old = System.currentTimeMillis() - 10000
    fs.setTimes(stage, old, old)
    fs.setTimes(tmpManifest, old, old)
    Snapshots.vacuum(spark, url, keepFrom = 1, graceMs = 1000L)
    assert(!fs.exists(stage), "staging dir debris survived vacuum")
    assert(!fs.exists(tmpManifest), "tmp manifest survived vacuum")
    assert(Snapshots.read(spark, url).count() == 1L)
  }
}
