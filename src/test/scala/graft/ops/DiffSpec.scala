package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** datasetDiff: added/removed/changed routing, changed-column
  * naming, null-vs-value disambiguation, schema-drift refusal.
  */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldDf = Seq(
    (1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L),
    (4L, "delta", 40L), (5L, null.asInstanceOf[String], 50L)
  ).toDF("id", "text", "n")

  private val newDf = Seq(
    (1L, "alpha", 10L),            // unchanged → omitted
    (2L, "beta2", 20L),            // text changed
    (3L, "gamma", 31L),            // n changed
    (5L, "", 50L),                 // null → empty string IS a change
    (6L, "new", 60L)               // added; 4 removed
  ).toDF("id", "text", "n")

  private def run() =
    Diff.datasetDiff(oldDf, newDf, "id").orderBy("id")
      .as[(Long, String, String)].collect().toSeq

  test("routes every id to added/removed/changed; unchanged omitted") {
    assert(run() == Seq(
      (2L, "changed", "text"),
      (3L, "changed", "n"),
      (4L, "removed", ""),
      (5L, "changed", "text"),
      (6L, "added", "")))
  }

  test("multiple changed columns are comma-joined in sorted order") {
    val n2 = newDf.withColumn("n",
      when(col("id") === 2L, 99L).otherwise(col("n")))
    val out = Diff.datasetDiff(oldDf, n2, "id")
      .filter(col("id") === 2L)
      .as[(Long, String, String)].collect().head
    assert(out == ((2L, "changed", "n,text")))
  }

  test("null never collides with a literal value") {
    // old text null vs new "N" (the sentinel letter) must still diff
    val o = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val n = Seq((1L, "N")).toDF("id", "text")
    assert(Diff.datasetDiff(o, n, "id")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "changed", "text")))
  }

  test("identical snapshots produce an empty diff") {
    assert(Diff.datasetDiff(oldDf, oldDf, "id").count() == 0)
  }

  test("schema drift is refused, not silently diffed") {
    val dropped = newDf.drop("n")
    val e = intercept[IllegalArgumentException] {
      Diff.datasetDiff(oldDf, dropped, "id")
    }
    assert(e.getMessage.contains("column sets differ"))
  }

  test("diffSummary counts by status") {
    val out = Diff.diffSummary(oldDf, newDf, "id").orderBy("status")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("added", 1L), ("changed", 3L), ("removed", 1L)))
  }

  test("columnBlame: per-column change counts plus membership " +
      "deltas; zero-count columns omitted") {
    val rows = Diff.columnBlame(oldDf, newDf, "id")
      .orderBy("column")
      .as[(String, Long)].collect().toSeq
    // text changed on ids 2 and 5, n on id 3; 6 added, 4 removed
    assert(rows == Seq(("__added", 1L), ("__removed", 1L),
      ("n", 1L), ("text", 2L)))
    // a no-op diff yields an empty frame (no zero rows)
    assert(Diff.columnBlame(oldDf, oldDf, "id").count() == 0L)
  }

  test("the join exchanges carry id+hashes, never row payloads") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val d = Diff.datasetDiff(oldDf, newDf, "id")
    d.collect()
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike =>
        e +: e.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val ex = exchanges(d.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected a shuffle for the full-outer join")
    val names = ex.flatMap(_.child.output.map(_.name))
    assert(!names.contains("text") && !names.contains("n"),
      s"payload columns leaked into an exchange: $names")
    assert(names.forall(n =>
      n == "id" || n.startsWith("__ho_") || n.startsWith("__hn_") ||
        n.startsWith("__p")), s"unexpected exchange columns: $names")
  }
}
