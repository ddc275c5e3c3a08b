package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Linear attribution's cent-exactness invariants and the
  * uniqueness/functional-dependency schema-audit semantics on
  * hand-built fixtures. */
class AttributionAuditSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts, id, cents-as-value/100)
  private def attrib(rows: Seq[(Long, String, Long, Long, Long)],
      windowUs: Long = 100L) =
    Funnel.linearAttribution(
      rows.map { case (u, t, ts, id, c) => (u, t, ts, id, c / 100.0) }
        .toDF("u", "t", "ts", "id", "v"),
      "u", "t", col("ts"), "id",
      expr("CAST(round(v*100) AS BIGINT)"),
      convType = "buy", touchTypes = Seq("view", "click"),
      windowUs = windowUs)

  test("attribution: even split with remainder to most recent") {
    // 3 touches, 100 cents → 34/33/33, the extra cent to the latest
    val rows = Seq(
      (1L, "view", 10L, 101L, 0L), (1L, "click", 20L, 102L, 0L),
      (1L, "view", 30L, 103L, 0L),
      (1L, "buy", 40L, 104L, 100L))
    val m = attrib(rows).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // view touches at ts 10 and 30: ts30 is rank1 (gets 33+1), ts10
    // rank3 (33); click ts20 rank2 (33)
    assert(m("view") == (1L, 2L, 67L))
    assert(m("click") == (1L, 1L, 33L))
    assert(m.values.map(_._3).sum == 100L)
  }

  test("attribution: channel cents sum exactly to revenue") {
    // adversarial: prime cents over varying touch counts
    val rows = (1L to 7L).flatMap { u =>
      (1L to u).map(i => (u, if (i % 2 == 0) "view" else "click",
        i, u * 100 + i, 0L)) :+
        (u, "buy", 99L, u * 1000, 997L)
    }
    val total = attrib(rows).agg(sum("attributed_cents"))
      .as[Long].head()
    assert(total == 7L * 997L)
  }

  test("attribution: no in-window touch goes to (direct) in full") {
    val rows = Seq(
      (1L, "view", 10L, 101L, 0L),          // out of window for ts 500
      (1L, "buy", 500L, 102L, 250L),
      (2L, "buy", 50L, 201L, 80L))          // user with no touches
    val m = attrib(rows, windowUs = 100L).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m == Map("(direct)" -> (2L, 0L, 330L)))
  }

  test("attribution: touch strictly after conversion never credits") {
    val rows = Seq(
      (1L, "buy", 100L, 11L, 60L),
      (1L, "click", 100L, 12L, 0L),  // at conv ts: counts (<=)
      (1L, "view", 101L, 13L, 0L))   // after: excluded
    val m = attrib(rows).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(m == Map("click" -> 60L))
  }

  test("attribution: refund (negative cents) still sums exactly") {
    // cents=-5 over 2 touches: floored split -3/-2 sums to -5 — the
    // truncating-div form attributed -4 and broke the invariant
    val rows = Seq(
      (1L, "view", 10L, 101L, 0L), (1L, "click", 20L, 102L, 0L),
      (1L, "buy", 30L, 103L, -5L))
    val m = attrib(rows).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(m.values.sum == -5L, s"credits must sum to -5: $m")
    assert(!m.contains("(direct)"))
  }

  test("uniquenessProfile: key verdict, nulls, multiplicity") {
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "y"),
      (3L, None, "y"), (4L, Some("b"), "y"))
      .toDF("id", "grp", "pay")
    val m = Stats.uniquenessProfile(df, Seq("id", "grp", "pay"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(m("id") == (4L, 0L, 4L, 1L, true))
    assert(m("grp") == (4L, 1L, 2L, 2L, false))
    assert(m("pay") == (4L, 0L, 2L, 3L, false))
  }

  test("uniquenessProfile: all-null column has zero max_mult") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "c")
    val r = Stats.uniquenessProfile(df, Seq("c")).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5)) == (2L, 2L, 0L, 0L, false))
  }

  test("fdViolations: finds mixed groups, counts null as a value") {
    val df = Seq(
      (1L, Some("A")), (1L, Some("A")),           // holds
      (2L, Some("A")), (2L, Some("B")),           // violates
      (3L, Some("A")), (3L, None))                // violates via null
      .toDF("k", "dep")
    val got = Stats.fdViolations(df, Seq("k"), "dep")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 2L, 2L), (3L, 2L, 2L)))
  }

  test("fdViolations: empty result when the FD holds") {
    val df = Seq((1L, "A"), (1L, "A"), (2L, "B")).toDF("k", "dep")
    assert(Stats.fdViolations(df, Seq("k"), "dep").isEmpty)
  }
}
