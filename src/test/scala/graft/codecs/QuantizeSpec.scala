package graft.codecs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftExtensions, GraftFunctions}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs: Seq[(Long, Seq[Float])] = Seq(
    (0L, Seq(0.5f, -1.25f, 3.75f, 0.001f)),
    (1L, Seq(-0.0004f, 0.0002f, 0.0001f, -0.0003f)), // tiny magnitudes
    (2L, Seq(0f, 0f, 0f, 0f)),                       // zero vector
    (3L, Seq(127f, -127f, 64f, 1f)))

  test("quantize round-trip error is bounded by half a step") {
    val out = vecs.toDF("id", "v")
      .select($"id", $"v", GraftFunctions.quantizeInt8($"v").as("qz"))
      .select($"id", $"v", $"qz.scale".as("s"), $"qz.q".as("q"))
      .as[(Long, Seq[Float], Double, Seq[Byte])].collect()
    for ((id, v, s, q) <- out) {
      assert(q.length == v.length)
      if (id == 2L) {
        assert(s == 0.0 && q.forall(_ == 0))
      } else {
        assert(s > 0)
        v.zip(q).foreach { case (x, qi) =>
          assert(qi >= -127 && qi <= 127)
          val err = math.abs(qi / s - x.toDouble)
          assert(err <= 0.5 / s + 1e-12,
            s"id=$id x=$x q=$qi s=$s err=$err bound=${0.5 / s}")
        }
        // the max-magnitude element always hits ±127 exactly
        assert(q.map(b => math.abs(b.toInt)).max == 127)
      }
    }
  }

  test("dotI8 is the exact integer inner product") {
    val df = Seq((Seq[Byte](1, -2, 127, -127), Seq[Byte](3, 4, -128, 127)))
      .toDF("a", "b")
    val got = df.select(GraftFunctions.dotI8($"a", $"b"))
      .as[Long].collect().head
    assert(got == 1L * 3 + (-2L) * 4 + 127L * (-128) + (-127L) * 127)
  }

  test("int8 rescale approximates the float dot within the bound") {
    // deterministic pseudo-vectors; compare dot8/(sa*sb) to exact dot
    val dim = 64
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(i => (((seed * 7919 + i * 104729) % 2000) - 1000) / 500.0f)
    val pairs = (0 until 20).map(i => (vec(i), vec(i + 100)))
    val df = pairs.toDF("a", "b")
      .select($"a", $"b",
        GraftFunctions.quantizeInt8($"a").as("qa"),
        GraftFunctions.quantizeInt8($"b").as("qb"))
      .select(
        GraftFunctions.column(DotProduct(
          GraftFunctions.expr($"a"), GraftFunctions.expr($"b"))).as("exact"),
        (GraftFunctions.dotI8($"qa.q", $"qb.q") /
          ($"qa.scale" * $"qb.scale")).as("approx"),
        aggregate($"a", lit(0.0d), (s, x) => s + abs(x)).as("l1a"),
        aggregate($"b", lit(0.0d), (s, x) => s + abs(x)).as("l1b"),
        $"qa.scale".as("sa"), $"qb.scale".as("sb"))
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    for ((exact, approx, l1a, l1b, sa, sb) <- df) {
      val bound = 0.5 / sb * l1a + 0.5 / sa * l1b + dim * 0.25 / (sa * sb)
      assert(math.abs(exact - approx) <= bound + 1e-9,
        s"exact=$exact approx=$approx bound=$bound")
    }
  }

  test("null vectors pass through as null; SQL surface registered") {
    GraftExtensions.registerAll(spark)
    val df = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None))
      .toDF("id", "v")
    df.createOrReplaceTempView("qz_in")
    val rows = spark.sql(
      """SELECT id, graft_quantize_int8(v).scale AS s,
        |  graft_dot_i8(graft_quantize_int8(v).q, graft_quantize_int8(v).q) AS d
        |FROM qz_in ORDER BY id""".stripMargin)
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(rows.head._1 == 1L && rows.head._2.isDefined)
    // q = [64, 127] (0.5 step rounds up) → self-dot 64² + 127²
    assert(rows.head._3.contains(64L * 64 + 127L * 127))
    assert(rows(1)._2.isEmpty && rows(1)._3.isEmpty)
  }
}
