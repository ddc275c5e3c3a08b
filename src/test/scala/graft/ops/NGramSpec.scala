package graft.ops

import graft.SparkSpec

/** NGram semantics on the reference's delta-threshold test vectors
  * (timestamps {0,3,8,10,11,20,23} — tests/test_ngram_end_to_end.py:
  * 329-437), both overlap modes, per-offset projection, grouping. */
class NGramSpec extends SparkSpec {
  import spark.implicits._

  // ts deltas: 3,5,2,1,9,3
  private lazy val df = Seq(0L, 3L, 8L, 10L, 11L, 20L, 23L)
    .zipWithIndex.map { case (ts, i) => (ts, s"v$i") }.toDF("ts", "v")

  private def bigram(thr: Long, overlap: Boolean) =
    NGram(df, NGram.Spec(Map(0 -> Seq("ts"), 1 -> Seq("ts")), thr, "ts", overlap))
      .orderBy("ts_t0")

  test("overlap bigrams: qualifying starts only") {
    val starts = bigram(4, overlap = true).select("ts_t0").as[Long].collect().toSeq
    assert(starts == Seq(0L, 8L, 10L, 20L)) // deltas 3,2,1,3 qualify
  }

  test("non-overlap bigrams: greedy selection skips consumed rows") {
    val starts = bigram(4, overlap = false).select("ts_t0").as[Long].collect().toSeq
    // qualifying positions 0,2,3,5 → greedy with L=2 keeps 0,2,5
    assert(starts == Seq(0L, 8L, 20L))
  }

  test("trigram with loose threshold: all windows; non-overlap keeps every Lth") {
    val spec3 = NGram.Spec(Map(0 -> Seq("ts"), 1 -> Seq("ts"), 2 -> Seq("ts")), 10, "ts")
    val all = NGram(df, spec3).orderBy("ts_t0").select("ts_t0").as[Long].collect().toSeq
    assert(all == Seq(0L, 3L, 8L, 10L, 11L))
    val no = NGram(df, spec3.copy(timestampOverlap = false))
      .orderBy("ts_t0").select("ts_t0").as[Long].collect().toSeq
    assert(no == Seq(0L, 10L)) // greedy: 0 consumes rows 0-2; next qual ≥3 is idx3 (ts=10)
  }

  test("threshold 0 yields nothing; huge threshold yields n-L+1 windows") {
    assert(bigram(0, overlap = true).count() == 0)
    assert(bigram(1000, overlap = true).count() == 6)
  }

  test("per-offset field projection with negative offsets (fields map)") {
    val spec = NGram.Spec(Map(-1 -> Seq("v"), 0 -> Seq("ts", "v")), 100, "ts")
    val out = NGram(df, spec).orderBy("ts_t1")
    assert(out.columns.toSeq == Seq("v_t0", "ts_t1", "v_t1"))
    val first = out.collect()(0)
    assert(first.getString(0) == "v0" && first.getLong(1) == 3L && first.getString(2) == "v1")
  }

  test("windows never cross group boundaries") {
    val g = Seq((1, 0L), (1, 1L), (2, 2L), (2, 3L)).toDF("grp", "ts")
    val spec = NGram.Spec(Map(0 -> Seq("ts"), 1 -> Seq("ts")), 100, "ts")
    val out = NGram(g, spec, groupCols = Seq("grp"))
      .orderBy("ts_t0").select("grp", "ts_t0", "ts_t1")
      .as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((1, 0L, 1L), (2, 2L, 3L))) // no (1-ts,2-ts) cross window
  }

  test("global blocked evaluation crosses block cuts correctly (both modes)") {
    // 50 rows, all deltas qualify; tiny blockSize forces windows to
    // straddle many block boundaries. The global result must equal
    // the constant-group result (same semantics, grouped machinery).
    val data = (0L until 50L).map(t => (t, s"v$t")).toDF("ts", "v")
    val spec = NGram.Spec(
      Map(0 -> Seq("ts", "v"), 1 -> Seq("ts"), 2 -> Seq("ts")), 5, "ts")
    def viaGroup(s: NGram.Spec) =
      NGram(data.withColumn("g", org.apache.spark.sql.functions.lit(1)),
        s, groupCols = Seq("g")).drop("g")
        .orderBy("ts_t0").collect().toSeq
    def global(s: NGram.Spec) =
      NGram(data.repartition(7), s, blockSize = 4)
        .orderBy("ts_t0").collect().toSeq
    assert(global(spec) == viaGroup(spec))
    assert(global(spec).size == 48) // all n-L+1 windows
    val noOv = spec.copy(timestampOverlap = false)
    assert(global(noOv) == viaGroup(noOv))
    assert(global(noOv).size == 16) // ceil(48/3) greedy picks
  }

  test("segmented global greedy matches sequential greedy on irregular gaps") {
    // Irregular deltas: the qualifying anchors are sparse and the
    // carried nextAllowed enters blocks at varying offsets 0..L-1 —
    // the case the per-block entry tabulation has to get right.
    val deltas = (1 to 120).map(i => 1L + ((i * 2654435761L >>> 7) % 8))
    val ts = deltas.scanLeft(0L)(_ + _)
    val L = 3
    val thr = 4L
    // sequential reference answer, computed straight from the data
    val qual = (0 to ts.length - L).filter { i =>
      (1 until L).forall(k => ts(i + k) - ts(i + k - 1) <= thr)
    }
    var na = Int.MinValue
    val picks = scala.collection.mutable.ArrayBuffer.empty[Int]
    qual.foreach { i => if (i >= na) { picks += i; na = i + L } }
    val expected = picks.map(ts).toSeq
    assert(expected.size > 5, s"fixture too easy: ${expected.size} picks")

    val data = ts.map(t => (t, s"v$t")).toDF("ts", "v")
    val spec = NGram.Spec(
      Map(0 -> Seq("ts"), 1 -> Seq("ts"), 2 -> Seq("ts")), thr, "ts",
      timestampOverlap = false)
    val got = NGram(data.repartition(5), spec, blockSize = L)
      .orderBy("ts_t0").select("ts_t0").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("global path refuses a blockSize smaller than the window") {
    val spec = NGram.Spec(Map(0 -> Seq("ts"), 1 -> Seq("ts"), 2 -> Seq("ts")),
      100, "ts")
    intercept[IllegalArgumentException](NGram(df, spec, blockSize = 2))
  }

  test("non-overlap greedy resets across groups") {
    val g = Seq((1, 0L), (1, 1L), (1, 2L), (2, 10L), (2, 11L), (2, 12L))
      .toDF("grp", "ts")
    val spec = NGram.Spec(Map(0 -> Seq("ts"), 1 -> Seq("ts")), 100, "ts",
      timestampOverlap = false)
    val out = NGram(g, spec, groupCols = Seq("grp"))
      .orderBy("grp", "ts_t0").select("grp", "ts_t0")
      .as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 0L), (2, 10L))) // one bigram each; position 2/12 leftover
  }
}
