package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Conversion funnel / cohort retention semantics on hand-built
  * timelines, and priority sampling's selection + estimator
  * invariants vs an in-memory re-derivation of the same integer
  * arithmetic. */
class FunnelSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(rows: Seq[(Long, String, Long)], gap: Long = 100L) =
    Funnel.conversionFunnel(rows.toDF("u", "t", "ts"), "u", "t",
        col("ts"), Seq("A", "B", "C"), maxGapUs = gap)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)

  test("funnel: strict order and first-match anchoring") {
    val rows = Seq(
      // u1 converts fully: A@10, B@20, C@30
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // u2 has B before A only → stops at stage 1
      (2L, "B", 5L), (2L, "A", 10L),
      // u3 anchors at FIRST A (10); B@5 is before it → stage 1 only
      (3L, "B", 5L), (3L, "A", 10L), (3L, "A", 50L))
    assert(funnel(rows) == Seq((1L, "A", 3L), (2L, "B", 1L),
      (3L, "C", 1L)))
  }

  test("funnel: max gap bounds each stage hop") {
    val rows = Seq(
      (1L, "A", 0L), (1L, "B", 200L), (1L, "C", 250L), // B too late
      (2L, "A", 0L), (2L, "B", 50L), (2L, "C", 300L))  // C too late
    assert(funnel(rows) == Seq((1L, "A", 2L), (2L, "B", 1L),
      (3L, "C", 0L)))
  }

  test("funnel: equal timestamps do not satisfy strict order") {
    val rows = Seq((1L, "A", 10L), (1L, "B", 10L), (1L, "C", 11L))
    assert(funnel(rows) == Seq((1L, "A", 1L), (2L, "B", 0L),
      (3L, "C", 0L)))
  }

  test("cohort retention matches hand-computed triangle") {
    val rows = Seq(
      (1L, 5L), (1L, 15L), (1L, 25L),  // cohort 0, active 0/1/2
      (2L, 12L), (2L, 27L),            // cohort 1, active 1/2
      (3L, 22L))                       // cohort 2, active 2
    val got = Funnel.cohortRetention(rows.toDF("u", "ts"), "u",
        col("ts"), bucketUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 1L, 1L), (1L, 2L, 1L), (2L, 2L, 1L)))
  }

  test("cohort retention counts distinct users per cell") {
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
    val got = Funnel.cohortRetention(rows.toDF("u", "ts"), "u",
        col("ts"), bucketUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 2L)))
  }

  /** In-memory replica of the priority arithmetic. */
  private def refPriorities(rows: Seq[(String, Long)], seed: Long)
      : Map[String, BigInt] = rows.map { case (k, w) =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:pri:$k".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    k -> (BigInt(w) * BigInt(2).pow(60) / BigInt(h + 1))
  }.toMap

  private val pop = (1 to 50).map(i => (f"k$i%02d", i.toLong))

  test("priority sample selects the top-k priorities deterministically") {
    val got = Sampling.prioritySample(pop.toDF("key", "w"), "key", "w",
        k = 10)
      .select(col("key")).as[String].collect().toSet
    val ref = refPriorities(pop, 0L).toSeq
      .sortBy { case (k, p) => (p, k) }(Ordering.Tuple2(
        Ordering[BigInt].reverse, Ordering[String]))
      .take(10).map(_._1).toSet
    assert(got == ref)
  }

  test("priority sample estimator: est_w = max(w, tau)") {
    val df = Sampling.prioritySample(pop.toDF("key", "w"), "key", "w",
        k = 10)
      .select(col("key"), col("w"),
        col("est_w").cast("string"))
      .as[(String, Long, String)].collect()
    val ps = refPriorities(pop, 0L)
    val tau = ps.values.toSeq.sorted(Ordering[BigInt].reverse)(10)
    df.foreach { case (k, w, est) =>
      assert(BigInt(est) == BigInt(w).max(tau),
        s"estimator mismatch for $k")
    }
  }

  test("priority sample with k >= population returns everything exact") {
    val small = Seq(("a", 5L), ("b", 7L))
    val got = Sampling.prioritySample(small.toDF("key", "w"), "key",
        "w", k = 10)
      .select(col("key"), col("est_w").cast("long"))
      .as[(String, Long)].collect().toMap
    // tau = 0 → est_w = w exactly
    assert(got == Map("a" -> 5L, "b" -> 7L))
  }

  test("priority sample drops non-positive and null weights") {
    val rows = Seq(("a", 5L), ("z", 0L), ("n", -3L))
    val got = Sampling.prioritySample(rows.toDF("key", "w"), "key",
        "w", k = 5)
      .select(col("key")).as[String].collect().toSet
    assert(got == Set("a"))
  }
}
