package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** jsonlQuarantineBatch: routing, replay idempotency, and the
  * changed/empty-replay partition hygiene. */
class JsonlIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  private def run(lines: Seq[String], batchId: Long, base: String): Unit =
    GraftStream.jsonlQuarantineBatch(lines.toDF("value"), batchId,
      schema, s"$base/good", s"$base/bad", "t")

  test("routes good and corrupt lines to their stores") {
    val base = scratch("jsonl_stream_route")
    run(Seq("""{"id":1,"s":"a"}""", "broken {", """{"id":2,"s":"b"}"""),
      0L, base)
    val good = spark.read.parquet(s"$base/good")
    assert(good.select("id").as[Long].collect().toSet == Set(1L, 2L))
    val bad = spark.read.parquet(s"$base/bad")
    assert(bad.select("raw_line").as[String].collect().toSeq ==
      Seq("broken {"))
  }

  test("same-batch replay replaces, never duplicates") {
    val base = scratch("jsonl_stream_replay")
    run(Seq("""{"id":1,"s":"a"}""", "x"), 0L, base)
    run(Seq("""{"id":1,"s":"a"}""", "x"), 0L, base)
    assert(spark.read.parquet(s"$base/good").count() == 1L)
    assert(spark.read.parquet(s"$base/bad").count() == 1L)
  }

  test("changed replay drops the stale side's partition") {
    val base = scratch("jsonl_stream_changed")
    run(Seq("""{"id":1,"s":"a"}""", "x"), 0L, base)
    // replay now parses clean — the quarantine partition must go
    run(Seq("""{"id":1,"s":"a"}""", """{"id":2,"s":"b"}"""), 0L, base)
    assert(spark.read.parquet(s"$base/good").count() == 2L)
    val badDir = new java.io.File(s"$base/bad/ingest_key=t_b0")
    assert(!badDir.exists())
  }

  test("batches accumulate by partition") {
    val base = scratch("jsonl_stream_acc")
    run(Seq("""{"id":1,"s":"a"}"""), 0L, base)
    run(Seq("""{"id":2,"s":"b"}"""), 1L, base)
    val good = spark.read.parquet(s"$base/good")
    assert(good.count() == 2L)
    assert(good.select("ingest_key").distinct().count() == 2L)
  }

  test("empty line and type mismatch both quarantine") {
    val base = scratch("jsonl_stream_types")
    run(Seq("", """{"id":"NaN-ish","s":"a"}""", """{"id":3,"s":"c"}"""),
      0L, base)
    assert(spark.read.parquet(s"$base/good").count() == 1L)
    assert(spark.read.parquet(s"$base/bad").count() == 2L)
  }
}
