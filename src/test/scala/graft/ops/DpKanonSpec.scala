package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DpKanonSpec extends SparkSpec {
  import spark.implicits._

  test("dpGroupCounts: contribution bounding caps a heavy unit, " +
      "noise is a clip-multiple offset, seed-deterministic") {
    // unit 1 spams key "a" 1000 times; unit 2..21 touch it once
    val rows = (1 to 1000).map(_ => (1L, "a")) ++
      (2L to 21L).map(u => (u, "a")) ++
      (1L to 5L).map(u => (u, "b"))
    val df = rows.toDF("u", "key")
    val out = Stats.dpGroupCounts(df, Seq("key"), "u",
      clip = 3, seed = "s1")
      .as[(String, Long)].collect().toMap
    // true clipped sums: a = 3 + 20 = 23, b = 5
    assert(math.abs(out("a") - 23L) % 3 == 0)
    assert(math.abs(out("b") - 5L) % 3 == 0)
    // bounded: the spammer moved "a" by at most clip
    val without = Stats.dpGroupCounts(df.filter(col("u") =!= 1L),
      Seq("key"), "u", clip = 3, seed = "s1")
      .as[(String, Long)].collect().toMap
    assert(math.abs(out("a") - without("a")) <= 3)
    // same seed → identical release; noise rides md5(seed:key)
    val again = Stats.dpGroupCounts(df, Seq("key"), "u",
      clip = 3, seed = "s1").as[(String, Long)].collect().toMap
    assert(again == out)
  }

  test("dpGroupCounts noise distribution: dyadic discrete Laplace " +
      "(difference of Geom(1/2) bit-length draws) is centered and " +
      "mostly small") {
    // 2000 singleton keys, clip 1 → noised - 1 IS the noise draw
    val df = (1L to 2000L).map(k => (k, k)).toDF("u", "key")
    val noise = Stats.dpGroupCounts(df, Seq("key"), "u",
      clip = 1, seed = "nz")
      .select((col("noised_count") - 1L).as("z"))
      .as[Long].collect()
    val zero = noise.count(_ == 0L)
    // P(z=0) = sum_j P(g1=j)^2 = 1/3; allow wide tolerance
    assert(zero > 2000 * 0.25 && zero < 2000 * 0.42, s"zero=$zero")
    assert(math.abs(noise.sum.toDouble / noise.length) < 0.2)
    assert(noise.exists(_ > 0) && noise.exists(_ < 0))
    assert(noise.forall(z => math.abs(z) <= 60))
  }

  test("kAnonymity: class-size histogram with null QIs as classes") {
    val df = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"),
      ("de", "b"), ("de", "b"),
      ("fr", null), ("fr", null),
      (null, null)).toDF("country", "seg")
    val got = Stats.kAnonymity(df, Seq("country", "seg"), k = 3)
      .orderBy("class_size")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // sizes: 1 (null,null), 2 ("de","b"), 2 ("fr",null), 3 ("us","a")
    assert(got == Seq((1L, 1L, 1L, 1L), (2L, 2L, 4L, 1L),
      (3L, 1L, 3L, 0L)))
  }
}
