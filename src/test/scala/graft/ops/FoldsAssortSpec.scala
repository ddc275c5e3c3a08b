package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Group-aware fold assignment and assortativity moments. */
class FoldsAssortSpec extends SparkSpec {
  import spark.implicits._

  test("group folds: same group always lands in the same fold") {
    val rows = (0 until 60).map(i => (i.toLong, s"g${i % 7}"))
    val got = Sampling.groupFolds(rows.toDF("id", "g"), col("g"), k = 3)
      .select(col("g"), col("fold")).as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    got.foreach { case (g, folds) =>
      assert(folds.size == 1, s"group $g split across folds $folds")
    }
  }

  test("group folds: deterministic and in range, seeds differ") {
    val rows = (0 until 40).map(i => (i.toLong, s"g$i"))
    val a = Sampling.groupFolds(rows.toDF("id", "g"), col("g"), 4)
      .select(col("id"), col("fold")).as[(Long, Long)].collect().toMap
    val b = Sampling.groupFolds(rows.toDF("id", "g"), col("g"), 4)
      .select(col("id"), col("fold")).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.forall(f => f >= 0 && f < 4))
    val c = Sampling.groupFolds(rows.toDF("id", "g"), col("g"), 4,
        seed = 9)
      .select(col("id"), col("fold")).as[(Long, Long)].collect().toMap
    assert(a != c) // different hash family
  }

  test("assortativity moments on a star: hubs anti-correlate") {
    // star hub-4 leaves: 8 ordered edge-ends; x=deg(u), y=deg(v)
    val star = Seq("b", "c", "d", "e").map(("hub", _))
    val got = Graph.assortativityMoments(star.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // directions: 4x (hub→leaf): x=4,y=1; 4x (leaf→hub): x=1,y=4
    assert(got == ((8L, 20L, 20L, 32L, 68L, 68L)))
    // the derived correlation is perfectly negative:
    // r = (n·Σxy - Σx·Σy) / (n·Σx² - (Σx)²) = (256-400)/(544-400) = -1
    assert(8 * got._4 - got._2 * got._3 == -(8 * got._5 - got._2 * got._2))
  }

  test("assortativity moments on a clique are degenerate-equal") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    val got = Graph.assortativityMoments(k4.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // 12 ordered ends, every degree 3
    assert(got == ((12L, 36L, 36L, 108L, 108L, 108L)))
  }
}
