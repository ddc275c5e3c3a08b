package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CUPED adjustment and the seasonal profile on hand-built data. */
class CupedSeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("cuped: perfect covariate equalizes adjusted means") {
    // y = 100·x exactly → theta = 100 (1e8 ppm) and BOTH arms'
    // adjusted means collapse to the pooled mean of y
    val units = Seq(("A", 0L, 0L), ("A", 2L, 200L),
      ("B", 1L, 100L), ("B", 3L, 300L)).toDF("arm", "x", "y")
    val got = Stats.cupedAdjust(units, "arm", "x", "y")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("A") == (2L, 1000000L, 100000000L, 100000000L,
      150000000L))
    assert(got("B") == (2L, 2000000L, 200000000L, 100000000L,
      150000000L))
  }

  test("cuped: zero-variance covariate means no adjustment") {
    val units = Seq(("A", 5L, 10L), ("A", 5L, 30L), ("B", 5L, 20L))
      .toDF("arm", "x", "y")
    val got = Stats.cupedAdjust(units, "arm", "x", "y")
      .collect().map(r => (r.getString(0),
        (r.getLong(4), r.getLong(3), r.getLong(5)))).toMap
    got.values.foreach { case (theta, meanY, adj) =>
      assert(theta == 0L && adj == meanY)
    }
  }

  test("cuped: null arm/covariate rows are excluded") {
    val units = Seq((Some("A"), Some(1L), Some(10L)),
      (Some("A"), None, Some(99L)), (None, Some(2L), Some(7L)),
      (Some("B"), Some(2L), Some(20L)))
      .toDF("arm", "x", "y")
    val got = Stats.cupedAdjust(units, "arm", "x", "y")
    assert(got.count() == 2L)
    assert(got.agg(sum("n")).as[Long].head() == 2L)
  }

  test("seasonal profile: exact phase buckets and index") {
    val df = Seq(("g", 5L), ("g", 15L), ("g", 25L), ("g", 45L))
      .toDF("g", "ts")
    val got = Resample.seasonalProfile(df, Seq("g"), col("ts"),
        periodUs = 40L, buckets = 4)
      .orderBy("bucket")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("g", 0L, 2L, 500000L, 2000000L),
      ("g", 1L, 1L, 250000L, 1000000L),
      ("g", 2L, 1L, 250000L, 1000000L)))
  }

  test("seasonal profile: period must divide into buckets") {
    val df = Seq(("g", 1L)).toDF("g", "ts")
    intercept[IllegalArgumentException] {
      Resample.seasonalProfile(df, Seq("g"), col("ts"), 41L, 4)
    }
  }
}
