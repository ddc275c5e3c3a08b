package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-hop reach vs brute-force BFS, and distribution drift vs a
  * hand-computed total-variation table. */
class ReachDriftSpec extends SparkSpec {
  import spark.implicits._

  private def reachRun(edges: Seq[(String, String)], cap: Int = 10000)
      : Map[String, (Long, Long)] =
    Graph.twoHopReach(edges.toDF("s", "d"), "s", "d", maxDegree = cap)
      .as[(String, Long, Long)].collect()
      .map { case (id, r1, r2) => id -> ((r1, r2)) }.toMap

  private def reachRef(edges: Seq[(String, String)])
      : Map[String, (Long, Long)] = {
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    adj.map { case (v, n1) =>
      val n2 = n1.flatMap(adj(_)) ++ n1 - v
      v -> ((n1.size.toLong, n2.size.toLong))
    }
  }

  test("two-hop reach matches BFS on a path and a cycle") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(reachRun(path) == reachRef(path))
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    assert(reachRun(cycle) == reachRef(cycle))
  }

  test("two-hop reach matches BFS on a hashed pseudo-random graph") {
    val vs = (0 until 14).map(i => f"v$i%02d")
    val edges = for {
      i <- vs.indices; j <- (i + 1) until vs.size
      if java.util.UUID.nameUUIDFromBytes(
        s"${vs(i)}~${vs(j)}".getBytes).getLeastSignificantBits % 3 == 0
    } yield (vs(i), vs(j))
    assert(reachRun(edges) == reachRef(edges))
  }

  test("two-hop reach: capped hubs do not relay") {
    // star: hub degree 4; leaves reach everything THROUGH the hub
    val star = Seq("b", "c", "d", "e").map(("hub", _))
    val uncapped = reachRun(star)
    assert(uncapped("b") == ((1L, 4L))) // hub + 3 siblings
    val capped = reachRun(star, cap = 3)
    assert(capped("b") == ((1L, 1L))) // hub no longer relays
    // the hub's own 1-hop set is unaffected by its own cap
    assert(capped("hub") == ((4L, 4L)))
  }

  test("distribution drift: hand-computed day pair") {
    // day 0: a=3, b=1 → 750000 / 250000 ppm
    // day 1: a=1, b=3 → 250000 / 750000 ppm
    // day 2: a=2, b=2 → 500000 / 500000 ppm
    val rows = Seq.fill(3)(("a", 0L)) ++ Seq(("b", 5L)) ++
      Seq(("a", 10L)) ++ Seq.fill(3)(("b", 15L)) ++
      Seq(("a", 20L), ("a", 21L), ("b", 22L), ("b", 23L))
    val got = Resample.distributionDrift(rows.toDF("cat", "ts"), "cat",
        col("ts"), bucketUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1000000L), (1L, 2L, 500000L)))
  }

  test("distribution drift: missing categories count as zero share") {
    // day 0 has only 'a'; day 1 has only 'b' → tv2 = 2e6
    val rows = Seq(("a", 0L), ("a", 1L), ("b", 10L))
    val got = Resample.distributionDrift(rows.toDF("cat", "ts"), "cat",
        col("ts"), bucketUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 2000000L)))
  }

  test("distribution drift: non-adjacent buckets produce no pair") {
    val rows = Seq(("a", 0L), ("a", 25L)) // buckets 0 and 2 only
    val got = Resample.distributionDrift(rows.toDF("cat", "ts"), "cat",
        col("ts"), bucketUs = 10L).count()
    assert(got == 0L)
  }
}
