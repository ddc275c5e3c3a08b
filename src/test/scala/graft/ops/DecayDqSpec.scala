package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shift-decay scoring and data-quality rule rows on hand-built
  * fixtures. */
class DecayDqSpec extends SparkSpec {
  import spark.implicits._

  test("decayed count: halving per half-life from the latest bucket") {
    // user u: 8 events at bucket 0, 6 at bucket 1, 5 at bucket 2
    val rows = Seq.fill(8)(("u", 5L)) ++ Seq.fill(6)(("u", 15L)) ++
      Seq.fill(5)(("u", 25L))
    val got = Resample.decayedCount(rows.toDF("k", "ts"), "k",
        col("ts"), bucketUs = 10L, halfLifeBuckets = 1L)
      .as[(String, Long, Long)].collect().head
    // ref=2: 5/1 + 6/2 + 8/4 = 5+3+2 = 10
    assert(got == (("u", 10L, 2L)))
  }

  test("decayed count: ages beyond the shift cap contribute zero") {
    val rows = Seq(("u", 0L), ("u", 700L)) // buckets 0 and 70
    val got = Resample.decayedCount(rows.toDF("k", "ts"), "k",
        col("ts"), bucketUs = 10L, halfLifeBuckets = 1L)
      .as[(String, Long, Long)].collect().head
    assert(got == (("u", 1L, 70L))) // old event fully decayed
  }

  test("decayed count: half-life > 1 groups ages") {
    val rows = Seq(("u", 0L), ("u", 10L), ("u", 20L), ("u", 30L))
    val got = Resample.decayedCount(rows.toDF("k", "ts"), "k",
        col("ts"), bucketUs = 10L, halfLifeBuckets = 2L)
      .as[(String, Long, Long)].collect().head
    // ages 3,2,1,0 → //2 → 1,1,0,0 → 0+0+1+1... careful:
    // buckets 0..3, ref 3; ages 3,2,1,0; age//2 = 1,1,0,0
    // contributions 1/2=0, 1/2=0, 1/1=1, 1/1=1 → 2
    assert(got == (("u", 2L, 3L)))
  }

  test("dq rule counts violations and denominator in one pass") {
    val df = Seq(1L, -2L, 3L, -4L, 5L).toDF("v")
    val got = Stats.dqRule("neg", df, col("v") < 0)
      .as[(String, Long, Long)].collect().head
    assert(got == (("neg", 2L, 5L)))
  }

  test("dq rule on an empty frame reports 0/0") {
    val df = spark.emptyDataset[Long].toDF("v")
    val got = Stats.dqRule("neg", df, col("v") < 0)
      .as[(String, Long, Long)].collect().head
    assert(got == (("neg", 0L, 0L)))
  }

  test("dq orphans: unmatched and null child keys are violations") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Stats.dqOrphans("fk", child, col("fk"), parent,
        col("pk"))
      .as[(String, Long, Long)].collect().head
    assert(got == (("fk", 2L, 4L))) // 9 and null
  }
}
