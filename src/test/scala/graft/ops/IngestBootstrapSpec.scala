package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.sources.JsonlIngest

/** JSONL quarantine semantics (never drop, never abort) and the
  * bootstrap band's determinism/coverage invariants. */
class IngestBootstrapSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("jsonl: corrupt lines quarantined, good lines parsed") {
    val dir = scratch("jsonl_basic")
    Seq("""{"id":1,"s":"a"}""", """{"id":2,"s":"b"}""",
      """{"id":3,"s":""", "not json at all",
      """{"id":4,"s":"d"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val read = JsonlIngest.readQuarantined(spark, dir, schema,
      pin = true)
    val rep = JsonlIngest.report(read).as[(Long, Long)].head()
    assert(rep == (3L, 2L))
    assert(JsonlIngest.admitted(read).count() == 3L)
    assert(JsonlIngest.admitted(read).columns.toSeq == Seq("id", "s"))
    // quarantine keeps the raw offending lines for replay
    val q = JsonlIngest.quarantine(read).as[String].collect().toSet
    assert(q == Set("""{"id":3,"s":""", "not json at all"))
    read.unpersist()
  }

  test("jsonl: type mismatch lands in quarantine too") {
    val dir = scratch("jsonl_type")
    Seq("""{"id":"xyz","s":"a"}""", """{"id":7,"s":"b"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val read = JsonlIngest.readQuarantined(spark, dir, schema,
      pin = true)
    val rep = JsonlIngest.report(read).as[(Long, Long)].head()
    assert(rep == (1L, 1L))
    read.unpersist()
  }

  test("jsonl: refuses a schema already carrying the corrupt column") {
    val bad = StructType(schema.fields :+
      StructField(JsonlIngest.CorruptCol, StringType))
    intercept[IllegalArgumentException] {
      JsonlIngest.readQuarantined(spark, scratch("x"), bad)
    }
  }

  test("bootstrap: band brackets the mean and is partition-stable") {
    val df = (1 to 200)
      .map(i => ("g", i.toLong, (i % 17).toDouble)).toDF("g", "id", "v")
    val a = Stats.bootstrapMeans(df, Seq("g"), "v", "id")
      .as[(String, Long, Long, Long, Long, Long)].head()
    val (_, n, mean, nBoots, lo, hi) = a
    assert(n == 200L && nBoots == 40L)
    assert(lo <= mean && mean <= hi, s"band [$lo,$hi] vs mean $mean")
    assert(lo < hi)
    val b = Stats.bootstrapMeans(df.repartition(13), Seq("g"), "v", "id")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(a == b)
  }

  test("bootstrap: replicate means vary (weights are not constant)") {
    val df = (1 to 50).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val r = Stats.bootstrapMeans(df, Seq("g"), "v", "id").head()
    assert(r.getLong(4) != r.getLong(5))
  }

  test("bootstrap: a null group key is a group (eqNullSafe join)") {
    val df = ((1 to 60).map(i => (Option("g"), i.toLong, 2.0)) ++
      (1 to 60).map(i => (Option.empty[String], 1000L + i, 5.0)))
      .toDF("g", "id", "v")
    val m = Stats.bootstrapMeans(df, Seq("g"), "v", "id").collect()
      .map(r => (Option(r.getString(0)), r.getLong(2))).toMap
    // the repo convention (quantileBins/groupEcdf/exactSplit): null
    // groups are groups — the plain equi-join silently dropped them
    assert(m.keySet == Set(Some("g"), None), s"groups: ${m.keySet}")
    assert(m(None) == 5000000L && m(Some("g")) == 2000000L)
  }

  test("bootstrap: groups are independent (separate bands)") {
    val df = ((1 to 60).map(i => ("lo", i.toLong, 1.0)) ++
      (1 to 60).map(i => ("hi", 1000L + i, 100.0)))
      .toDF("g", "id", "v")
    val m = Stats.bootstrapMeans(df, Seq("g"), "v", "id")
      .collect().map(r => (r.getString(0),
        (r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(m("lo")._1 == 1000000L)
    assert(m("hi")._1 == 100000000L)
    // constant values → degenerate (exact) bands at the value
    assert(m("lo")._2 == 1000000L && m("lo")._3 == 1000000L)
  }
}
