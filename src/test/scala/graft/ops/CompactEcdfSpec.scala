package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Changelog compaction (argmax + tombstone), Apriori triples, and
  * the eCDF transform on hand-built inputs. */
class CompactEcdfSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // (user, type, id, ts)
    (1L, "signup", 10L, 100L),
    (1L, "view", 11L, 200L),      // winner for user 1
    (2L, "view", 20L, 100L),
    (2L, "error", 21L, 300L),     // tombstone: user 2 drops
    (3L, "click", 30L, 100L),
    (3L, "view", 31L, 100L))      // ts tie → greater event_id wins

  private def compactRun(rows: Seq[(Long, String, Long, Long)]) =
    Dedup.compactLatest(rows.toDF("u", "t", "id", "ts"), Seq("u"),
        col("ts"), col("id"), Seq("ts", "t", "id"),
        tombstone = col("t") === "error")
      .as[(Long, Long, String, Long)].collect().toSet

  test("compaction: latest wins, tombstones drop, ties break by id") {
    assert(compactRun(log) == Set(
      (1L, 200L, "view", 11L),
      (3L, 100L, "view", 31L)))
  }

  test("compaction of an empty log is empty") {
    assert(compactRun(Nil) == Set.empty)
  }

  test("compaction keeps a tombstoned key's earlier state hidden") {
    // even when a non-tombstone row exists, only the WINNER decides
    val rows = Seq((9L, "view", 1L, 100L), (9L, "error", 2L, 200L))
    assert(compactRun(rows).isEmpty)
  }

  test("basket triples: Apriori counts on a known basket set") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "d"))
    val got = Graph.basketTriples(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 2L)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", "c", 2L)))
    // support 1 sees every basket's full triple set
    val all = Graph.basketTriples(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 1L).count()
    assert(all == 2L) // {a,b,c} (x2 baskets) and {a,b,d}
  }

  test("basket triples: items outside any frequent pair are pruned") {
    // 'z' never repeats with anything → cannot reach support 2
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "z"),
      (2L, "a"), (2L, "b"))
    val got = Graph.basketTriples(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 2L).count()
    assert(got == 0L)
  }

  test("ecdf matches the hand-computed percentile table") {
    val vals = Seq(1L, 1L, 2L, 5L, 5L, 5L, 9L, 9L, 9L, 9L)
    val got = Stats.ecdf(vals.toDF("v"), "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 200000L),   // 2/10
      (2L, 1L, 300000L),   // 3/10
      (5L, 3L, 600000L),   // 6/10
      (9L, 4L, 1000000L))) // 10/10
  }

  test("ecdf ignores nulls and truncates doubles") {
    val df = Seq(Some(1.9), Some(1.2), None, Some(3.0))
      .toDF("v")
    val got = Stats.ecdf(df, "v").as[(Long, Long, Long)]
      .collect().toSet
    // 1.9 and 1.2 both truncate to 1
    assert(got == Set((1L, 2L, 666666L), (3L, 1L, 1000000L)))
  }
}
