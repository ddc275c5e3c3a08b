package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** containmentJoin: recall 1.0 vs brute force, asymmetry (the pair
  * Jaccard-LSH structurally misses), directionality, exact ppm.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val words = "alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliet kilo lima mike november oscar papa quebec " +
    "romeo sierra tango uniform victor whiskey xray yankee zulu " +
    "amber birch cedar dune ember fjord grove heath iris jade"

  private def fixture: DataFrame = {
    val all = words.split(" ")
    Seq(
      (1L, all.mkString(" ")),              // big: 36 tokens
      (2L, all.slice(5, 15).mkString(" ")), // excerpt → contained in 1
      (3L, all.slice(5, 15).mkString(" ") + " extra trailing words"),
      (4L, "unrelated content entirely different from everything here")
    ).toDF("doc_id", "text")
  }

  private def brute(df: DataFrame, tPpm: Long): Set[(Long, Long, Long)] = {
    val sets = NearDedup.shingleSets(df, "doc_id", "text", 3)
      .as[(Long, Seq[String])].collect().toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      i = sa.toSet.intersect(sb.toSet).size.toLong
      ppm = i * 1000000L / sb.size
      if ppm >= tPpm
    } yield (a, b, ppm)).toSet
  }

  private def run(df: DataFrame, tPpm: Long): Set[(Long, Long, Long)] =
    NearDedup.containmentJoin(df, "doc_id", "text", tPpm)
      .as[(Long, Long, Long)].collect().toSet

  test("matches brute force exactly at several thresholds") {
    for (t <- Seq(400000L, 700000L, 900000L, 1000000L)) {
      assert(run(fixture, t) == brute(fixture, t), s"t=$t")
    }
  }

  test("catches full containment where Jaccard is structurally low") {
    val out = run(fixture, 1000000L)
    // doc 2 (8 shingles) fully inside doc 1 (34 shingles):
    // containment 1.0 but Jaccard 8/34 ≈ 0.24
    assert(out.contains((1L, 2L, 1000000L)))
    // and the SYMMETRIC op at a modest threshold misses the pair
    val jac = NearDedup.jaccardJoin(fixture, "doc_id", "text", 500000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(!jac.exists(p => Set(p._1, p._2) == Set(1L, 2L)))
  }

  test("directional: big-contains-small only, never the reverse") {
    val out = run(fixture, 900000L)
    assert(out.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!out.exists(p => p._1 == 2L && p._2 == 1L))
    assert(out.forall(p => p._1 != p._2))
  }

  test("shared-prefix docs qualify both directions when sizes agree") {
    val twin = Seq(
      (7L, "one two three four five six"),
      (8L, "one two three four five six")).toDF("doc_id", "text")
    val out = run(twin, 1000000L)
    assert(out == Set((7L, 8L, 1000000L), (8L, 7L, 1000000L)))
  }

  test("distributed input agrees with brute force") {
    val all = words.split(" ")
    val rows = (0L until 30L).map { i =>
      if (i % 3 == 0) (i, all.mkString(" "))
      else if (i % 3 == 1) (i, all.slice((i % 10).toInt, (i % 10).toInt + 12)
        .mkString(" "))
      else (i, s"unique${i}a unique${i}b unique${i}c unique${i}d")
    }
    val df = rows.toDF("doc_id", "text").repartition(4)
    assert(run(df, 800000L) == brute(df, 800000L))
  }
}
