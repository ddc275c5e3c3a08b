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
}
