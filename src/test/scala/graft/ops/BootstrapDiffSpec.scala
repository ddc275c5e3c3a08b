package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** bootstrapDiff: the two-sample band's sign/coverage/determinism
  * invariants, and dqSuite's one-pass rule table. */
class BootstrapDiffSpec extends SparkSpec {
  import spark.implicits._

  private def units(shift: Double) =
    ((1 to 120).map(i => ("control", i.toLong, (i % 10).toDouble)) ++
      (1 to 120).map(i =>
        ("treat", 1000L + i, (i % 10).toDouble + shift)))
      .toDF("arm", "id", "v")

  test("bootstrapDiff: a real effect keeps the band off zero") {
    val r = Stats.bootstrapDiff(units(5.0), "arm", "v", "id",
      "control", "treat").collect()(0)
    val (nC, nT, diff, nBoots, lo, hi) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nC == 120L && nT == 120L && nBoots == 40L)
    assert(diff == 5000000L)
    assert(lo > 0L && hi > 0L && lo <= diff && diff <= hi)
  }

  test("bootstrapDiff: a null effect straddles zero") {
    val r = Stats.bootstrapDiff(units(0.0), "arm", "v", "id",
      "control", "treat").collect()(0)
    val (diff, lo, hi) = (r.getLong(2), r.getLong(4), r.getLong(5))
    assert(lo <= diff && diff <= hi)
    assert(lo < 0L && hi > 0L, s"null effect band [$lo,$hi]")
  }

  test("bootstrapDiff: deterministic under repartitioning") {
    val df = units(2.0)
    val a = Stats.bootstrapDiff(df, "arm", "v", "id",
      "control", "treat").collect()(0).toSeq
    val b = Stats.bootstrapDiff(df.repartition(17), "arm", "v", "id",
      "control", "treat").collect()(0).toSeq
    assert(a == b)
  }

  test("bootstrapDiff: other arms are ignored") {
    val extra = units(1.0).unionByName(
      Seq(("holdout", 9999L, 1e6)).toDF("arm", "id", "v"))
    val withH = Stats.bootstrapDiff(extra, "arm", "v", "id",
      "control", "treat").collect()(0).toSeq
    val without = Stats.bootstrapDiff(units(1.0), "arm", "v", "id",
      "control", "treat").collect()(0).toSeq
    assert(withH == without)
  }

  test("dqSuite: one row per rule, one pass") {
    val df = Seq((1L, "O", 10.0), (2L, "F", -5.0), (3L, "Z", 0.0),
      (4L, "O", 2.5)).toDF("id", "status", "price")
    val got = Stats.dqSuite(df, Seq(
        ("price_positive", col("price") <= 0),
        ("status_known", !col("status").isin("O", "F", "P")),
        ("id_present", col("id").isNull)))
      .as[(String, Long, Long)].collect()
      .map { case (r, v, c) => (r, (v, c)) }.toMap
    assert(got("price_positive") == (2L, 4L))
    assert(got("status_known") == (1L, 4L))
    assert(got("id_present") == (0L, 4L))
    val p = Stats.dqSuite(df, Seq(("a", col("id").isNull),
      ("b", col("price") < 0))).queryExecution.executedPlan.toString
    assert(!p.contains("Union"),
      s"dqSuite must be ONE agg, not a per-rule union:\n$p")
  }

  test("dqSuite: empty frame reports zero violations, zero checked") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val got = Stats.dqSuite(df, Seq(("r", col("id").isNull)))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("r", 0L, 0L)))
  }

  test("sourceOverlapMatrix counts shared fingerprints per pair") {
    val df = Seq(
      ("hello  world", "a"), ("hello world", "b"),  // same fp (ws)
      ("unique to a", "a"), ("unique to b", "b"),
      ("both again", "a"), ("both again", "b"), ("both again", "c"))
      .toDF("text", "source")
    val got = Dedup.sourceOverlapMatrix(df, "text", "source")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map { case (a, b, s, na, nb, p) => ((a, b), (s, na, nb, p)) }
      .toMap
    // a: 3 fps, b: 3 fps, c: 1 fp
    assert(got(("a", "b")) == (2L, 3L, 3L, 666666L))
    assert(got(("a", "c")) == (1L, 3L, 1L, 1000000L))
    assert(got(("b", "c")) == (1L, 3L, 1L, 1000000L))
  }

  test("sourceOverlapMatrix: disjoint sources emit no row") {
    val df = Seq(("x", "a"), ("y", "b")).toDF("text", "source")
    assert(Dedup.sourceOverlapMatrix(df, "text", "source").isEmpty)
  }
}
