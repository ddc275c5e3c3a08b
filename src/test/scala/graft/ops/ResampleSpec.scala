package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** gapFill: dense per-key grid vs a naive reference, fill semantics,
  * argument validation, and the span guard. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("gapFill densifies each key's own span with the fill value") {
    val sparse = Seq(("a", 3L, 10L), ("a", 6L, 20L), ("b", 100L, 1L))
      .toDF("k", "b", "n")
    val out = Resample.gapFill(sparse, "k", "b", Map("n" -> lit(0L)))
      .orderBy("k", "b").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 3L, 10L), ("a", 4L, 0L), ("a", 5L, 0L), ("a", 6L, 20L),
      ("b", 100L, 1L))) // a singleton key yields exactly its one bucket
  }

  test("gapFill matches a naive dense reference on irregular data") {
    val rows = (for (k <- 0 until 5; i <- 0 until 12) yield {
      val b = ((k * 31 + i * 17) % 40).toLong
      (s"k$k", b, (k * 100 + i).toLong)
    }).groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = Resample.gapFill(rows.toDF("k", "b", "n"), "k", "b",
      Map("n" -> lit(-1L)))
      .as[(String, Long, Long)].collect().toSet
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      (rs.map(_._2).min to rs.map(_._2).max)
        .map(b => (k, b, m.getOrElse(b, -1L)))
    }.toSet
    assert(got == expected)
  }

  test("gapFill refuses unfilled or unknown value columns up front") {
    val df = Seq(("a", 1L, 2L)).toDF("k", "b", "n")
    intercept[IllegalArgumentException](
      Resample.gapFill(df, "k", "b", Map.empty))
    intercept[IllegalArgumentException](
      Resample.gapFill(df, "k", "b", Map("n" -> lit(0L), "zz" -> lit(0L))))
  }

  test("maxBucketsPerKey guard fires for a key spanning past the cap") {
    val df = Seq(("wide", 0L, 1L), ("wide", 10L, 1L), ("ok", 1L, 1L))
      .toDF("k", "b", "n")
    val e = intercept[Exception] {
      Resample.gapFill(df, "k", "b", Map("n" -> lit(0L)),
        maxBucketsPerKey = 5L).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") +
        messages(t.getCause)
    assert(messages(e).contains("resample key spans"))
  }

  test("rollingCount: trailing window includes self and exact edges") {
    // key k at ts 0, 50, 100, 149, 150: window 100 →
    // ts0:1; ts50:2; ts100:3 (0 is 100 back: ts-99..ts includes 0? 0 >= 100-99=1? no → 2)
    val df = Seq(("k", 0L), ("k", 50L), ("k", 100L), ("k", 149L),
      ("k", 150L), ("j", 100L)).toDF("key", "ts_us")
    val out = Resample.rollingCount(df, "key", "ts_us", windowUs = 100L)
      .orderBy("key", "ts_us").as[(String, Long, Long)].collect().toSeq
    // frame = [ts-99, ts]: 0→{0}; 50→{0,50}; 100→{50,100} (0 excluded);
    // 149→{50,100,149}; 150→{100,149,150} (50 excluded, 51 < 150-99)
    assert(out == Seq(("j", 100L, 1L), ("k", 0L, 1L), ("k", 50L, 2L),
      ("k", 100L, 2L), ("k", 149L, 3L), ("k", 150L, 3L)))
  }

  test("rollingCount: equal timestamps are peers and count together") {
    val df = Seq(("k", 10L), ("k", 10L), ("k", 10L)).toDF("key", "ts_us")
    val out = Resample.rollingCount(df, "key", "ts_us", 5L)
      .select("n_trailing").as[Long].collect().toSeq
    assert(out == Seq(3L, 3L, 3L))
  }
}
