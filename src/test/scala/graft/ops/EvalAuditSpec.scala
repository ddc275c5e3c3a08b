package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PR curve, Cohen's kappa and the mixed-script audit on hand-built
  * fixtures with known answers. */
class EvalAuditSpec extends SparkSpec {
  import spark.implicits._

  test("prCurve: exact cumulative TP/FP per threshold") {
    val df = Seq(("g", 3L, 1L), ("g", 3L, 0L), ("g", 2L, 1L),
      ("g", 1L, 0L), ("g", 1L, 1L)).toDF("g", "score", "label")
    val got = Stats.prCurve(df, Seq("g"), "score", "label")
      .orderBy(col("score").desc)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("g", 3L, 1L, 1L, 500000L, 333333L),
      ("g", 2L, 2L, 1L, 666666L, 666666L),
      ("g", 1L, 3L, 2L, 600000L, 1000000L)))
  }

  test("prCurve: group with no positives reports null recall") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, 0L)).toDF("g", "score", "label")
    val rows = Stats.prCurve(df, Seq("g"), "score", "label").collect()
    assert(rows.forall(_.isNullAt(5)))
    assert(rows.forall(_.getLong(4) == 0L)) // precision 0, defined
  }

  test("cohenKappa matches the textbook 2x2 example") {
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (50L, 35L, 700000L, 500000L, 400000L))
  }

  test("cohenKappa: below-chance agreement floors negative") {
    // perfect DISagreement on a balanced binary → kappa = -1e6
    val rows = Seq.fill(10)(("y", "n")) ++ Seq.fill(10)(("n", "y"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(2) == 0L)         // po
    assert(r.getLong(3) == 500000L)    // pe
    assert(r.getLong(4) == -1000000L)  // kappa
  }

  test("termBurstiness: moments and the stuffing signature") {
    val docs = Seq(
      (1L, "spam spam spam spam the"),
      (2L, "the cat"), (3L, "the dog"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(docs, "doc_id", "text",
        minDf = 2L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (t, df, s1, s2, mx) => (t, (df, s1, s2, mx)) }.toMap
    // 'the': tf 1 in each of 3 docs
    assert(got("the") == (3L, 3L, 3L, 1L))
    // 'spam': df 1 < minDf -> pruned even at tf 4
    assert(!got.contains("spam") && !got.contains("cat"))
  }

  test("mixedScriptTokens flags confusables, zero on clean text") {
    val docs = Seq(
      (1L, "pаypаl abc αβγ αc"),
      (2L, "plain ascii text only"),
      (3L, "чисто русский текст"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.mixedScriptTokens(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, lc, ma) => (id, (n, lc, ma)) }.toMap
    assert(got(1L) == (4L, 1L, 2L)) // pаypаl lat+cyr; αc grk+lat
    assert(got(2L) == (4L, 0L, 0L))
    assert(got(3L) == (3L, 0L, 0L))
  }
}
