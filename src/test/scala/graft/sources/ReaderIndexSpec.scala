package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `GraftRead.index()/bloomIndex()` — the reader-param composition of
  * index skipping with fields/predicate/shard (`make_reader`'s
  * `rowgroup_selector=`, reader.py:92/:599-618): results exact,
  * files actually skipped, shard membership independent of the
  * selector, empty admission yields schema-correct zero rows. */
class ReaderIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore(tag: String): (String, String) = {
    val data = scratch(s"rdidx_${tag}_data")
    val idx = scratch(s"rdidx_${tag}_idx")
    (1 to 400).map(i => (i.toLong, s"g${i % 8}", i % 8))
      .toDF("id", "grp", "bucket")
      .repartition(8, col("bucket"))
      .write.mode("overwrite").parquet(data)
    RowGroupIndex.build(spark, data,
      Seq(RowGroupIndex.Indexer("grp")), idx)
    (data, idx)
  }

  test("index() composes with predicate and reads fewer files") {
    val (data, idx) = mkStore("basic")
    val total = Materialize.listParquetFiles(spark, data).length
    val df = GraftRead.reader(spark, data)
      .index(idx, RowGroupIndex.ValueIn("grp", Seq("g3")))
      .predicate(col("grp") === "g3")
      .load()
    val expect = spark.read.parquet(data).filter(col("grp") === "g3")
      .select("id").as[Long].collect().sorted.toSeq
    assert(df.select("id").as[Long].collect().sorted.toSeq == expect)
    // the scan actually shrank: count distinct files feeding the plan
    val filesRead = df.select(input_file_name()).distinct().count()
    assert(filesRead < total, s"no skip: $filesRead/$total")
  }

  test("index() + shard: shard membership is positional in the full " +
      "listing, selection only narrows") {
    val (data, idx) = mkStore("shard")
    val sel = RowGroupIndex.ValueIn("grp", Seq("g3"))
    // union of all shards under the selector == unsharded selector read
    val all = (0 until 2).flatMap { sh =>
      GraftRead.reader(spark, data)
        .index(idx, sel).predicate(col("grp") === "g3")
        .shard(sh, 2).load()
        .select("id").as[Long].collect()
    }.sorted.toSeq
    val unsharded = GraftRead.reader(spark, data)
      .index(idx, sel).predicate(col("grp") === "g3")
      .load().select("id").as[Long].collect().sorted.toSeq
    assert(all == unsharded, "shards under a selector must partition " +
      "the selected rows exactly")
  }

  test("bloomIndex() composes and keeps results exact") {
    val (data, _) = mkStore("bloom")
    val bidx = scratch("rdidx_bloom_idx2")
    RowGroupIndex.buildBloom(spark, data, Seq("id"), bidx, 1000L)
    val got = GraftRead.reader(spark, data)
      .bloomIndex(bidx, "id", Seq(7L, 300L))
      .predicate(col("id").isin(7L, 300L))
      .load().select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(7L, 300L))
  }

  test("empty admission returns zero rows with the store schema") {
    val (data, idx) = mkStore("empty")
    val df = GraftRead.reader(spark, data)
      .index(idx, RowGroupIndex.ValueIn("grp", Seq("nope")))
      .load()
    assert(df.count() == 0L)
    assert(df.columns.toSeq == Seq("id", "grp", "bucket"))
  }

  test("index() refuses multi-store readers") {
    val (data, idx) = mkStore("multi")
    intercept[IllegalArgumentException] {
      GraftRead.reader(spark, Seq(data, data))
        .index(idx, RowGroupIndex.ValueIn("grp", Seq("g1")))
        .load()
    }
  }
}
