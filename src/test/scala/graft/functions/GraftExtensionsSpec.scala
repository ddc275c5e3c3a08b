package graft.functions

import graft.SparkSpec

/** The SQL faces of the custom expressions (registered via
  * FunctionRegistry / SparkSessionExtensions). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.registerAll(spark)

  test("tensor codec round-trips through pure SQL") {
    val r = spark.sql(
      """SELECT graft_decode_tensor(
        |  graft_encode_tensor(array(2, 2), array(1.5D, 2.5D, 3.5D, 4.5D),
        |                      'float64', true), 'float64') AS t""".stripMargin)
      .select($"t.dims", $"t.data").as[(Seq[Int], Seq[Double])].head()
    assert(r == ((Seq(2, 2), Seq(1.5, 2.5, 3.5, 4.5))))
  }

  test("image encode/decode/resize through pure SQL") {
    val r = spark.sql(
      """SELECT graft_resize_nearest(img.dims, img.data, 1, 2) AS rz FROM (
        |  SELECT graft_decode_image(graft_encode_image(
        |    array(2, 2), array(10S, 20S, 30S, 40S), 'png')) AS img)""".stripMargin)
      .select($"rz.dims", $"rz.data").as[(Seq[Int], Seq[Short])].head()
    assert(r._1 == Seq(1, 2))
    assert(r._2 == Seq[Short](10, 20))
  }

  test("dot, simhash32, pcm16 through pure SQL") {
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head() == 11.0)
    assert(spark.sql("SELECT graft_simhash32(array(3L, 3L, 1L))")
      .as[Long].head() == 3L) // bit0: 3 ones; bit1: 2 of 3 → both set
    assert(spark.sql("SELECT graft_decode_pcm16(X'0100FF7F')")
      .as[Seq[Short]].head() == Seq[Short](1, 32767))
  }

  test("span, BPE, sampling and sum kernels through pure SQL " +
      "(r8 verdict #5)") {
    // splice: starts [1] with n=2 covers positions 1..2
    assert(spark.sql(
      "SELECT graft_splice_out_spans(array('a','b','c','d'), array(1L), 2)")
      .as[Seq[String]].head() == Seq("a", "d"))
    // repeated grams: (a b)@0, (b a)@1, (a b)@2 → repeat at 2
    assert(spark.sql(
      "SELECT graft_repeated_gram_starts(array('a','b','a','b'), 2)")
      .as[Seq[Long]].head() == Seq(2L))
    // BPE apply under 'a a,aa a': aaab → [aa,a,b] → [aaa,b]
    assert(spark.sql("SELECT graft_apply_bpe('aaab', 'a a,aa a')")
      .as[Seq[String]].head() == Seq("aaa", "b"))
    assert(spark.sql("SELECT graft_apply_bpe('ab', '')")
      .as[Seq[String]].head() == Seq("a", "b")) // '' = char segmentation
    // ticket race: min over t<4 of (5 + 3t) mod 2^60 = 5
    assert(spark.sql("SELECT graft_ticket_race_min(5L, 3L, 4L)")
      .as[Long].head() == 5L)
    assert(spark.sql("SELECT graft_array_sum_long(array(1L, 2L, 3L))")
      .as[Long].head() == 6L)
    // floor-micros embedding space: -0.5 floors DOWN (not toward 0)
    assert(spark.sql(
        "SELECT graft_floor_micros(array(CAST(1.5 AS FLOAT), CAST(-0.5 AS FLOAT)))")
      .as[Seq[Long]].head() == Seq(1500000L, -500000L))
    // hashed bigram histogram: md5('a b')%64 = bucket 13
    assert(spark.sql(
        "SELECT graft_hashed_gram_counts(array('a','b'), 2, 64)")
      .as[Seq[Long]].head()(13) == 1L)
    // simple lowercase: word-final sigma maps to σ (not Java's ς)
    assert(spark.sql("SELECT graft_simple_lower('ΜΥΣ')")
      .as[String].head() == "μυσ")
    // NFC: combining acute composes; precomposed input is identity
    assert(spark.sql("SELECT graft_nfc_normalize('café')")
      .as[String].head() == "café")
    assert(spark.sql("SELECT graft_nfc_normalize('café')")
      .as[String].head() == "café")
    // script counts: one-pass struct (latin, cyrillic, han, arabic,
    // greek, letters)
    assert(spark.sql(
      "SELECT s.* FROM (SELECT graft_script_counts('ab мир 世 δ!') AS s)")
      .as[(Long, Long, Long, Long, Long, Long)].head() ==
      ((2L, 3L, 1L, 0L, 1L, 7L)))
  }

  test("non-literal dtype raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_decode_tensor(X'00', concat('float', '64'))")
        .collect()
    }
    assert(e.getMessage.contains("string literal"))
  }
}
