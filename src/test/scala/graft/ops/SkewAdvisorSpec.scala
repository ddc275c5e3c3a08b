package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Join-skew advisor: exact pair costs, integer-ceil salt factors,
  * cap and top-k behavior. */
class SkewAdvisorSpec extends SparkSpec {
  import spark.implicits._

  test("advisor: pair costs and ceil salts, hot key first") {
    // hot key: 30×40 = 1200 pairs; cold: 2×3 = 6; left-only key
    // never appears (inner containment)
    val left = (Seq.fill(30)("hot") ++ Seq.fill(2)("cold") ++
      Seq("orphan")).toDF("k")
    val right = (Seq.fill(40)("hot") ++ Seq.fill(3)("cold"))
      .toDF("k")
    val rows = Skew.joinSkewAdvisor(left, "k", right, "k",
      targetPairs = 500L, maxSalt = 64, topK = 10)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // ceil(1200/500) = 3; ceil(6/500) = 1
    assert(rows == Seq(("hot", 30L, 40L, 1200L, 3L),
      ("cold", 2L, 3L, 6L, 1L)))
  }

  test("advisor: maxSalt caps and topK bounds the output") {
    val left = Seq.fill(100)("x").toDF("k")
    val rows = Skew.joinSkewAdvisor(left, "k", left, "k",
      targetPairs = 10L, maxSalt = 8, topK = 1)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // 10000 pairs / 10 = 1000 → capped at 8
    assert(rows == Seq(("x", 100L, 100L, 10000L, 8L)))
  }

  test("autoSaltedJoin equals the plain join and actually spreads " +
      "the hot key; uniform joins degenerate to the unsalted plan") {
    // hot key 0 on ~half the large side
    val large = spark.range(2000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val small = spark.range(1000).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val factor = Skew.recommendSaltFactor(large, small, Seq("k"),
      targetPairs = 100L, maxSalt = 16)
    // hot key: 1000×1 = 1000 pairs → ceil(1000/100) = 10
    assert(factor == 10)
    val got = Skew.autoSaltedJoin(large, small, Seq("k"),
      targetPairs = 100L, maxSalt = 16)
      .select("k", "v", "w").as[(Long, Long, Long)].collect().toSet
    val want = large.join(small, Seq("k"))
      .select("k", "v", "w").as[(Long, Long, Long)].collect().toSet
    // 1000 hot-key rows + the 500 odd ids under 1000
    assert(got == want && want.size == 1500)
    // the hot key's rows really landed in >1 salt bucket
    val spread = large.filter(col("k") === 0L)
      .withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(factor.toLong)))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(spread > 1L, s"hot key collapsed into $spread buckets")
    // uniform join: factor 1 → the plain join, no salt machinery
    val uni = spark.range(500).select(col("id").as("k"))
    assert(Skew.recommendSaltFactor(uni, small, Seq("k"),
      targetPairs = 100L) == 1)
    val plan = Skew.autoSaltedJoin(uni, small, Seq("k"),
      targetPairs = 100L).queryExecution.analyzed.toString
    assert(!plan.contains("__salt"))
  }
}
