package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** exactSplit: exact Hamilton sizes, disjoint-complete coverage,
  * determinism, and the null-key edges. */
class ExactSplitSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq(("train", 8L), ("val", 1L), ("test", 1L))

  test("sizes are exact Hamilton quotas per stratum") {
    // 23 rows in A (8/1.5/1.5 → quotas 18/2/3 or 18/3/2 by ties),
    // 10 in B (8/1/1 exactly)
    val df = ((1 to 23).map(i => ("A", i.toLong)) ++
      (101 to 110).map(i => ("B", i.toLong))).toDF("g", "id")
    val got = Sampling.exactSplit(df, Seq("g"), splits, "id")
      .groupBy("g", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (g, s, n) => ((g, s), n) }.toMap
    assert(got(("B", "train")) == 8L && got(("B", "val")) == 1L &&
      got(("B", "test")) == 1L)
    // A: base = floor(23*8/10)=18, floor(23/10)=2, 2; R=1 goes to
    // the largest remainder (train rem 4, val rem 3, test rem 3 →
    // train gets it) → 19/2/2
    assert(got(("A", "train")) == 19L && got(("A", "val")) == 2L &&
      got(("A", "test")) == 2L)
  }

  test("disjoint and complete: every row lands in exactly one split") {
    val df = (1 to 97).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val out = Sampling.exactSplit(df, Seq("g"), splits, "id")
    assert(out.count() == 97L)
    assert(out.select("id").distinct().count() == 97L)
  }

  test("deterministic under repartitioning") {
    val df = (1 to 200).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "id")
    val a = Sampling.exactSplit(df, Seq("g"), splits, "id")
      .select("id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.exactSplit(df.repartition(11), Seq("g"), splits,
        "id")
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("null stratum is a stratum; null ids are excluded") {
    val df = Seq((Some("A"), Some(1L)), (Some("A"), Some(2L)),
      (None, Some(3L)), (None, Some(4L)), (None, Some(5L)),
      (Some("A"), None)).toDF("g", "id")
    val out = Sampling.exactSplit(df, Seq("g"),
      Seq(("x", 1L), ("y", 1L)), "id")
    assert(out.count() == 5L) // null id dropped
    val nullStratum = out.filter(col("g").isNull)
    assert(nullStratum.count() == 3L)
    assert(nullStratum.select("split").distinct().count() == 2L)
  }

  test("seed changes the deal, sizes stay exact") {
    val df = (1 to 50).map(i => ("g", i.toLong)).toDF("g", "id")
    val a = Sampling.exactSplit(df, Seq("g"), splits, "id", seed = "s1")
    val b = Sampling.exactSplit(df, Seq("g"), splits, "id", seed = "s2")
    val sa = a.filter(col("split") === "train")
      .select("id").as[Long].collect().toSet
    val sb = b.filter(col("split") === "train")
      .select("id").as[Long].collect().toSet
    assert(sa != sb)
    assert(sa.size == 40 && sb.size == 40)
  }
}
