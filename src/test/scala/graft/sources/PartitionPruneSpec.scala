package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.schema.{FieldSpec, GraftSchema}

/** P2/F2 parity: hive-partitioned stores and partition pruning
  * (reference: reader.py:620-652 applies predicates on the partition
  * key without reading data; partitioned test store
  * tests/test_common.py:161-245; pruning tests
  * tests/test_end_to_end.py:434-510). Here the proof is physical: the
  * scan's numFiles metric must shrink to the matching partition's
  * files only. */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    val u = scratch("part-store")
    val src = spark.range(300).toDF("id")
      .withColumn("cat", concat(lit("c"), pmod($"id", lit(3))))
      .withColumn("val", $"id" * 2)
    val schema = GraftSchema("part", Seq(
      FieldSpec("id", LongType),
      FieldSpec("val", LongType),
      FieldSpec("cat", StringType)))
    Materialize.materialize(src, u, schema, partitionCols = Seq("cat"))
    u
  }

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics fill
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
  }

  test("partitioned materialize lays out cat=... directories") {
    val dirs = new java.io.File(url).listFiles().map(_.getName)
      .filter(_.startsWith("cat=")).sorted
    assert(dirs.toSeq == Seq("cat=c0", "cat=c1", "cat=c2"))
  }

  test("partition-key predicate prunes the scan to one partition's files") {
    val all = Materialize.listParquetFiles(spark, url)
    val one = GraftRead.reader(spark, url).predicate($"cat" === "c1").load()
    val pruned = scanFileCount(one)
    assert(pruned > 0 && pruned < all.length,
      s"expected pruning: $pruned of ${all.length} files")
    // and the rows are complete + partition column round-trips
    assert(one.count() == 100)
    assert(one.select("cat").distinct().as[String].collect().toSeq == Seq("c1"))
    val full = scanFileCount(GraftRead.reader(spark, url).load())
    assert(full == all.length)
  }

  test("partition column survives schema view + shard file-list reads") {
    val df = GraftRead.reader(spark, url).fields("id", "cat").load()
    assert(df.columns.toSeq == Seq("id", "cat"))
    assert(df.filter($"cat" === "c2").count() == 100)
  }

  test("sidecar row-group counts key by relative path (no basename collisions)") {
    val counts = Materialize.rowGroupCounts(spark, url)
    assert(counts.nonEmpty)
    assert(counts.keys.forall(k => k.startsWith("cat=")),
      s"expected partition-relative keys, got ${counts.keys.take(3)}")
    // one entry per physical file — collisions would collapse these
    assert(counts.size == Materialize.listParquetFiles(spark, url).length)
  }

  test("index-backed read scans strictly fewer files (skip-proof)") {
    val base = scratch("index-skip")
    val (dataUrl, idxUrl) = (base + "/data", base + "/index")
    spark.range(200).toDF("id")
      .withColumn("cat", concat(lit("c"), pmod($"id", lit(4))))
      .repartition(8, $"cat")
      .write.mode("overwrite").parquet(dataUrl)
    RowGroupIndex.build(spark, dataUrl,
      Seq(RowGroupIndex.Indexer("cat")), idxUrl)
    val all = Materialize.listParquetFiles(spark, dataUrl)
    val sel = RowGroupIndex.selectedFiles(spark, dataUrl, idxUrl,
      RowGroupIndex.ValueIn("cat", Seq("c2")))
    assert(sel.nonEmpty && sel.length < all.length,
      s"expected file skipping: ${sel.length} of ${all.length}")
    val df = RowGroupIndex.readSelected(spark, dataUrl, idxUrl,
      RowGroupIndex.ValueIn("cat", Seq("c2"))).filter($"cat" === "c2")
    assert(df.count() == 50)
    // the plan's inputFiles are exactly the admitted list
    assert(df.inputFiles.length == sel.length)
  }

  test("co-bucketed tables join without a shuffle (bucketed materialize)") {
    import org.apache.spark.sql.types.LongType
    val schema = GraftSchema("b", Seq(
      FieldSpec("k", LongType), FieldSpec("v", LongType)))
    val a = spark.range(1000).toDF("k").withColumn("v", $"k" * 2)
    val b = spark.range(1000).toDF("k").withColumn("v", $"k" * 3)
    Materialize.materializeBucketed(a, "bkt_a", scratch("bkt-a"), schema,
      Seq("k"), buckets = 4)
    Materialize.materializeBucketed(b, "bkt_b", scratch("bkt-b"), schema,
      Seq("k"), buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
