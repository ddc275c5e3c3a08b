package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** mergeUpsert: replace/insert/delete semantics, bloom-bounded file
  * rewrites, and the guard rails. */
class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def store(tag: String, withBloom: Boolean): (String, Option[String]) = {
    val data = scratch(s"merge_${tag}_data")
    (1 to 400).map(i => (i.toLong, s"v$i", i % 8))
      .toDF("id", "payload", "bucket")
      .repartition(8, col("bucket"))
      .write.mode("overwrite").parquet(data)
    val idx = if (withBloom) {
      val i = scratch(s"merge_${tag}_idx")
      RowGroupIndex.buildBloom(spark, data, Seq("id"), i, 1000L)
      Some(i)
    } else None
    (data, idx)
  }

  test("merge replaces, inserts and deletes; result is exact") {
    val (data, idx) = store("sem", withBloom = true)
    val updates = Seq(
      (5L, "CHANGED", 5, false), (13L, "CHANGED", 5, false),
      (9001L, "NEW", 1, false),
      (7L, "", 7, true)) // tombstone
      .toDF("id", "payload", "bucket", "del")
    Materialize.mergeUpsert(spark, data, updates, "id",
      bloomIndexUrl = idx, deleteCol = Some("del"))
    val got = spark.read.parquet(data)
    assert(got.count() == 400L - 1L + 1L)
    assert(got.filter(col("id") === 5L).select("payload")
      .as[String].head() == "CHANGED")
    assert(got.filter(col("id") === 9001L).count() == 1L)
    assert(got.filter(col("id") === 7L).count() == 0L)
    assert(got.filter(col("id") === 8L).select("payload")
      .as[String].head() == "v8") // untouched rows survive verbatim
  }

  test("bloom index bounds the rewrite to affected files") {
    val (data, idx) = store("bound", withBloom = true)
    val total = Materialize.listParquetFiles(spark, data).length
    val updates = Seq((5L, "X", 5, false)).toDF("id", "payload",
      "bucket", "del")
    val (rewritten, all) = Materialize.mergeUpsert(spark, data,
      updates, "id", bloomIndexUrl = idx, deleteCol = Some("del"))
    assert(all == total)
    assert(rewritten < total, s"no skip: $rewritten/$total")
    assert(spark.read.parquet(data).count() == 400L)
  }


  test("stale bloom sidecar cannot cause duplicate keys: files the " +
      "sidecar never indexed are conservatively affected") {
    val (data, idx) = store("stale", withBloom = true)
    // land a NEW file AFTER the sidecar was built — key 9500 lives
    // only there, and the sidecar has no row for that file
    Seq((9500L, "late", 3)).toDF("id", "payload", "bucket")
      .coalesce(1).write.mode("append").parquet(data)
    val updates = Seq((9500L, "MERGED", 3, false))
      .toDF("id", "payload", "bucket", "del")
    Materialize.mergeUpsert(spark, data, updates, "id",
      bloomIndexUrl = idx, deleteCol = Some("del"))
    val hits = spark.read.parquet(data).filter(col("id") === 9500L)
      .select("payload").as[String].collect().toSeq
    // pre-guard this was Seq("late", "MERGED") — a duplicate key
    assert(hits == Seq("MERGED"))
  }

  test("without an index every file is rewritten — still exact") {
    val (data, _) = store("full", withBloom = false)
    val updates = Seq((1L, "Y", 1)).toDF("id", "payload", "bucket")
    val (rewritten, all) = Materialize.mergeUpsert(spark, data,
      updates, "id")
    assert(rewritten == all)
    val got = spark.read.parquet(data)
    assert(got.count() == 400L)
    assert(got.filter(col("id") === 1L).select("payload")
      .as[String].head() == "Y")
  }

  test("duplicate update keys are refused") {
    val (data, _) = store("dup", withBloom = false)
    val updates = Seq((1L, "a", 1), (1L, "b", 1))
      .toDF("id", "payload", "bucket")
    intercept[IllegalArgumentException] {
      Materialize.mergeUpsert(spark, data, updates, "id")
    }
  }

  test("schema drift in the update batch is refused") {
    val (data, _) = store("drift", withBloom = false)
    val updates = Seq((1L, "a")).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      Materialize.mergeUpsert(spark, data, updates, "id")
    }
  }

  test("merge is idempotent on re-apply") {
    val (data, idx) = store("idem", withBloom = true)
    val updates = Seq((5L, "Z", 5, false)).toDF("id", "payload",
      "bucket", "del")
    Materialize.mergeUpsert(spark, data, updates, "id", idx,
      Some("del"))
    Materialize.mergeUpsert(spark, data, updates, "id",
      bloomIndexUrl = None, deleteCol = Some("del"))
    val got = spark.read.parquet(data)
    assert(got.count() == 400L)
    assert(got.filter(col("id") === 5L).count() == 1L)
  }
}
