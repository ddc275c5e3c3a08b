package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom file index: skip-proof, superset guarantee, empty-admit
  * path, and multi-field sidecars. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def store(tag: String): (String, String) = {
    val data = scratch(s"bloom_${tag}_data")
    val idx = scratch(s"bloom_${tag}_idx")
    // 8 files keyed so each id lands in a known bucket
    (1 to 800).map(i => (i.toLong, s"u${i % 97}", i % 8))
      .toDF("id", "user", "bucket")
      .repartition(8, col("bucket"))
      .write.mode("overwrite").parquet(data)
    RowGroupIndex.buildBloom(spark, data, Seq("id", "user"), idx,
      expectedPerFile = 1000L)
    (data, idx)
  }

  test("bloom probe skips files and keeps results exact") {
    val (data, idx) = store("basic")
    // hash-partitioning 8 buckets into 8 tasks leaves some empty
    // (collisions) — several non-empty files is what matters
    val total = Materialize.listParquetFiles(spark, data).length
    assert(total >= 4, s"fixture too small: $total files")
    val sel = RowGroupIndex.bloomSelectedFiles(spark, data, idx,
      "id", Seq(5L, 13L))
    // two ids live in at most 2 buckets; fpp may admit a few more,
    // but at fpp 1% over 8 files skipping must actually happen
    assert(sel.nonEmpty && sel.length < total,
      s"no skip: ${sel.length}/$total")
    val got = RowGroupIndex.readBloomSelected(spark, data, idx,
        "id", Seq(5L, 13L))
      .filter(col("id").isin(5L, 13L))
      .select("id", "user").as[(Long, String)].collect().toSet
    assert(got == Set((5L, "u5"), (13L, "u13")))
  }

  test("absent probe values admit (almost) nothing, read stays sane") {
    val (data, idx) = store("absent")
    val got = RowGroupIndex.readBloomSelected(spark, data, idx,
        "id", Seq(99999L))
      .filter(col("id") === 99999L)
    assert(got.count() == 0L)
    // schema survives even when zero files are admitted
    assert(got.columns.toSeq == Seq("id", "user", "bucket"))
  }

  test("second indexed field probes independently") {
    val (data, idx) = store("multi")
    // u13 appears for ids 13, 110, 207, ... across many buckets
    val sel = RowGroupIndex.bloomSelectedFiles(spark, data, idx,
      "user", Seq("u13"))
    assert(sel.nonEmpty)
    val got = RowGroupIndex.readBloomSelected(spark, data, idx,
        "user", Seq("u13"))
      .filter(col("user") === "u13")
    val expect = spark.read.parquet(data).filter(col("user") === "u13")
    assert(got.count() == expect.count() && got.count() > 0L)
  }

  test("sidecar is file-count-sized per field") {
    val (data, idx) = store("size")
    val n = spark.read.parquet(idx)
      .groupBy("field").count().as[(String, Long)].collect().toMap
    assert(n("id") <= 8L && n("user") <= 8L)
  }
}
