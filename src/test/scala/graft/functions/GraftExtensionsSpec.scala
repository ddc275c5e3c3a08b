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

  test("non-literal dtype raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_decode_tensor(X'00', concat('float', '64'))")
        .collect()
    }
    assert(e.getMessage.contains("string literal"))
  }
}
