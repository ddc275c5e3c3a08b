package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zipf octaves, power moments, embedding audit and the distinct
  * sample — hand-built fixtures with adversarial edges (NaN/Inf
  * vectors, negative values, hash-rank determinism). */
class CorpusHealthSpec extends SparkSpec {
  import spark.implicits._

  test("zipfOctaves: octave boundaries and shares are exact") {
    // freqs: a=1 (oct 0), b=2, c=3 (oct 1), d=4 (oct 2)
    val docs = Seq("a b b c c", "c d d d d").toDF("text")
    val got = TextAnalysis.zipfOctaves(docs, "text")
      .orderBy("octave")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // (octave, freq_lo, n_types, sum_tokens, type_ppm, token_ppm)
    assert(got == Seq(
      (0L, 1L, 1L, 1L, 250000L, 100000L),
      (1L, 2L, 2L, 5L, 500000L, 500000L),
      (2L, 4L, 1L, 4L, 250000L, 400000L)))
  }

  test("powerMoments: signed values, exact decimal sums") {
    val df = Seq(("a", -1.5), ("a", 2.0), ("b", 0.0009)).toDF("g", "v")
    val got = Stats.powerMoments(df, Seq("g"), "v", scale = 1000L)
      .select(col("g"), col("n"), col("s1"),
        col("s2").cast("string"), col("s3").cast("string"),
        col("s4").cast("string"))
      .as[(String, Long, Long, String, String, String)]
      .collect().map { case (g, n, s1, s2, s3, s4) =>
        (g, (n, s1, s2, s3, s4)) }.toMap
    // a: e = -1500, 2000 → s1=500, s2=2250000+4e6, s3=-3.375e9+8e9,
    // s4=5.0625e12+1.6e13
    assert(got("a") == (2L, 500L, "6250000", "4625000000",
      "21062500000000"))
    // b: floor(0.9)=0
    assert(got("b") == (1L, 0L, "0", "0", "0"))
  }

  test("powerMoments: ungrouped and null-excluding") {
    val df = Seq(Some(2.0), None, Some(3.0)).toDF("v")
    val r = Stats.powerMoments(df, Nil, "v", scale = 1L).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    assert(r.getDecimal(2).longValueExact() == 13L)
    assert(r.getDecimal(3).longValueExact() == 35L)
    assert(r.getDecimal(4).longValueExact() == 97L)
  }

  test("embeddingAudit: dims classes, zero/NaN flags, norm range") {
    val rows = Seq(
      (1L, Some(Seq(1.0f, 0.0f))),              // dims 2, norm 1e12
      (2L, Some(Seq(0.0f, 0.0f))),              // zero vector
      (3L, Some(Seq(Float.NaN, 1.0f))),         // NaN carrier
      (4L, Some(Seq(2.0f))),                    // dims 1, norm 4e12
      (5L, None),                               // null → dims -1
      (6L, Some(Seq.empty[Float])))             // empty → dims 0
    val got = Gram.embeddingAudit(rows.toDF("id", "v"), "id", "v")
      .orderBy("dims").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(-1L) == (1L, 0L, 0L))
    assert(got(0L) == (1L, 0L, 0L))
    assert(got(1L) == (1L, 0L, 0L))
    assert(got(2L) == (3L, 1L, 1L))
    val d2 = Gram.embeddingAudit(rows.toDF("id", "v"), "id", "v")
      .filter(col("dims") === 2L).collect()(0)
    // norms among dims-2: 1e12 (vec 1), 0 (vec 2), 1e12 (vec 3 —
    // NaN element contributes 0, the 1.0f element 1e12)
    assert(d2.getLong(4) == 0L && d2.getLong(5) == 1000000000000L)
  }

  test("embeddingAudit: Inf elements are flagged, not summed") {
    val rows = Seq((1L, Seq(Float.PositiveInfinity, 1.0f)))
    val r = Gram.embeddingAudit(rows.toDF("id", "v"), "id", "v")
      .collect()(0)
    assert(r.getLong(3) == 1L && r.getLong(5) == 1000000000000L)
  }

  test("distinctSample: bottom-k by (hash, value), reproducible") {
    val df = (1 to 100).map(i => ("g", i)).toDF("g", "v")
    val a = Sketch.distinctSample(df, Seq("g"), "v", k = 7)
      .orderBy("smp_rank").as[(String, Long, String)].collect().toSeq
    // matches the plain distinct+rank spelling
    val expect = df.select(col("g"), col("v").cast("string").as("value"))
      .distinct()
      .withColumn("__h", Sketch.hash60(
        concat_ws(":", lit("ds"), col("value"))))
      .orderBy(col("__h"), col("value")).limit(7)
      .collect().map(_.getString(1)).toSeq
    assert(a.map(_._3) == expect)
    assert(a.map(_._2) == (1L to 7L))
    // repartitioning must not change the draw
    val b = Sketch.distinctSample(df.repartition(7), Seq("g"), "v", 7)
      .orderBy("smp_rank").as[(String, Long, String)].collect().toSeq
    assert(a == b)
  }

  test("groupEcdf: within-group percentiles, null edges") {
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("a"), Some(20L)),
      (3L, Some("a"), Some(20L)), (4L, Some("a"), Some(30L)),
      (5L, Some("b"), Some(5L)),
      (6L, None, Some(7L)),              // null group is a group
      (7L, Some("a"), None))             // null value -> null cdf
      .toDF("id", "g", "v")
    val got = Stats.groupEcdf(df, Seq("g"), "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) == 250000L)
    assert(got(2L) == 750000L && got(3L) == 750000L) // ties share
    assert(got(4L) == 1000000L)
    assert(got(5L) == 1000000L)
    assert(got(6L) == 1000000L)
    assert(got(7L) == -1L)
  }

  test("distinctSample: duplicates collapse; k beyond domain is all") {
    val df = Seq(("g", 1), ("g", 1), ("g", 2)).toDF("g", "v")
    val got = Sketch.distinctSample(df, Seq("g"), "v", k = 10)
      .collect().map(_.getString(2)).toSet
    assert(got == Set("1", "2"))
  }
}
