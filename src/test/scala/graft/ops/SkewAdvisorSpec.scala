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
}
