package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prefix-filtered set-similarity join vs brute force, and CUSUM
  * change-point detection vs a hand-built level shift. */
class SetSimCusumSpec extends SparkSpec {
  import spark.implicits._

  private def simRun(docs: Seq[(Long, String)], theta: Long)
      : Set[(Long, Long, Long, Long)] =
    SetSim.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text",
        thetaPpm = theta)
      .as[(Long, Long, Long, Long)].collect().toSet

  private def simRef(docs: Seq[(Long, String)], theta: Long)
      : Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> "[a-z]+".r.findAllIn(t.toLowerCase).toSet }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      jacc = inter * 1000000L / (sa.size + sb.size - inter)
      if jacc >= theta
    } yield (ia, ib, inter, jacc)).toSet
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown fox leaps"),      // 4/6 with doc 1
    (3L, "the quick brown fox jumps"),      // identical to doc 1
    (4L, "lorem ipsum dolor sit amet"),
    (5L, "lorem ipsum dolor sit"),          // 4/5 with doc 4
    (6L, "totally different words here"),
    (7L, ""))                               // empty: excluded

  test("set-similarity join matches brute force at several thresholds") {
    Seq(500000L, 660000L, 800000L, 1000000L).foreach { th =>
      assert(simRun(corpus, th) == simRef(corpus, th),
        s"diverged at theta $th")
    }
  }

  test("set-similarity join: duplicate tokens collapse to sets") {
    val docs = Seq((1L, "a b b b c"), (2L, "c c a b a"))
    // both sets are {a,b,c} → jaccard 1
    assert(simRun(docs, 1000000L) ==
      Set((1L, 2L, 3L, 1000000L)))
  }

  test("cusum finds a clean level shift") {
    // series x: 10 events/bucket for buckets 0-4, then 30 for 5-9.
    // mean = 20; cusum dips to -50 at bucket 4 then returns to 0 —
    // peak |cusum| at bucket 4, the last pre-shift bucket.
    val rows = (0 until 5).flatMap(b =>
      (0 until 10).map(i => ("x", b * 100L + i))) ++
      (5 until 10).flatMap(b =>
        (0 until 30).map(i => ("x", b * 100L + i)))
    val got = Resample.cusumChangepoint(rows.toDF("k", "ts"), "k",
        col("ts"), bucketUs = 100L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("x", 4L, -50L, 20L, 10L)))
  }

  test("cusum tie-break picks the earliest bucket") {
    // flat series: cusum 0 everywhere → earliest bucket wins
    val rows = (0 until 6).flatMap(b =>
      (0 until 7).map(i => ("f", b * 10L + i)))
    val got = Resample.cusumChangepoint(rows.toDF("k", "ts"), "k",
        col("ts"), bucketUs = 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("f", 0L, 0L, 7L, 6L)))
  }

  test("cusum handles multiple independent series") {
    val rows = Seq(("a", 5L), ("a", 15L), ("b", 5L), ("b", 6L),
      ("b", 15L))
    val got = Resample.cusumChangepoint(rows.toDF("k", "ts"), "k",
        col("ts"), bucketUs = 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
      .map { case (k, cp, cu, m, nb) => k -> ((cp, cu, m, nb)) }.toMap
    // a: counts 1,1 mean 1 → cusum 0,0 → cp bucket 0
    assert(got("a") == ((0L, 0L, 1L, 2L)))
    // b: counts 2,1 mean 1 → cusum 1 at b0, 1 at b1 → cp bucket 0
    assert(got("b") == ((0L, 1L, 1L, 2L)))
  }
}
