package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReaderAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("GraftRead resolves a Snapshots store through its manifest: " +
      "latest by default, asOf pinned, never the raw listing") {
    val url = scratch(
      s"rd_asof/${java.util.UUID.randomUUID().toString.take(8)}")
    val v1 = (1L to 30L).map(i => (i, i * 2)).toDF("id", "x")
    Snapshots.create(spark, url, v1, nFiles = 3)
    Snapshots.upsert(spark, url,
      Seq((1L, 99L), (31L, 1L)).toDF("id", "x"), "id")
    // the DIRECTORY now holds v1's originals AND v2's rewrites — a
    // raw listing would double-count; the reader must not
    val latest = GraftRead.reader(spark, url).load()
    assert(latest.count() == 31)
    assert(latest.filter(col("id") === 1L).select("x")
      .as[Long].head() == 99L)
    val pinned = GraftRead.reader(spark, url).asOf(1).load()
    assert(pinned.count() == 30)
    assert(pinned.filter(col("id") === 1L).select("x")
      .as[Long].head() == 2L)
    // composes with the rest of the builder chain
    val composed = GraftRead.reader(spark, url).asOf(1)
      .fields("x").predicate(col("x") > 40L).load()
    assert(composed.columns.toSeq == Seq("x"))
    assert(composed.count() == 10) // x = 42..60 even
    // a non-snapshot store refuses asOf with a clear message
    val plain = scratch(
      s"rd_asof/plain_${java.util.UUID.randomUUID().toString.take(8)}")
    v1.write.parquet(plain)
    val e = intercept[IllegalArgumentException] {
      GraftRead.reader(spark, plain).asOf(1).load()
    }
    assert(e.getMessage.contains("Snapshots store"))
  }
}
