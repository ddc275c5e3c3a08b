package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** [[TextAnalysis.gopherRules]] — the named Gopher rule set
  * (Rae et al. 2021 A1.1): each rule isolated by a crafted doc,
  * metrics hand-computed in floor-micros.
  */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // 13 words / 55 letters per sentence; 5 sentences = 65 words,
  // 275 non-ws chars, 5 lines; stopwords the/that/with present
  private val sentence =
    "the quick brown fox jumps over that lazy dog with great style today"
  private val goodDoc = Seq.fill(5)(sentence).mkString("\n")

  private def run(rows: Seq[(Long, String)]): Map[Long, Row] =
    TextAnalysis.gopherRules(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("clean English doc passes every rule with exact metrics") {
    val r = run(Seq((1L, goodDoc)))(1L)
    assert(r.getLong(1) == 65L)                       // n_words
    assert(r.getLong(2) == 275L * 1000000L / 65L)     // mean_word_len_m
    assert(r.getLong(3) == 0L)                        // symbol_ratio_m
    assert(r.getLong(4) == 0L)                        // bullet_frac_m
    assert(r.getLong(5) == 0L)                        // ellipsis_frac_m
    assert(r.getLong(6) == 1000000L)                  // alpha_word_frac_m
    assert(r.getLong(7) == 3L)                        // the, that, with
    assert(r.getLong(8) == 1L)                        // passes
  }

  test("short doc fails the 50-word floor only via n_words") {
    val r = run(Seq((1L, "the cat sat with that mat")))(1L)
    assert(r.getLong(1) == 6L && r.getLong(8) == 0L)
  }

  test("bullet-started lines counted across -, *, • markers") {
    // 20 bulleted 3-word lines = 60 words, all alpha, stopwords ok
    val doc = Seq.fill(20)("- the dog").mkString("\n") + "\nhave that"
    val r = run(Seq((1L, doc)))(1L)
    assert(r.getLong(1) == 62L)
    assert(r.getLong(4) == 20L * 1000000L / 21L)      // 20 of 21 lines
    assert(r.getLong(8) == 0L)                        // > 90% bulleted
    val star = run(Seq((1L, "  • x\n * y\nz")))(1L)
    assert(star.getLong(4) == 2L * 1000000L / 3L)
  }

  test("ellipsis-ended lines: ... and … both count, once per line") {
    val doc = "the end...\nplain line\nalso ends… \nmid ... dots here"
    val r = run(Seq((1L, doc)))(1L)
    assert(r.getLong(5) == 2L * 1000000L / 4L)
    // symbols: two ... runs + one … (non-overlapping leftmost)
    assert(r.getLong(1) == 10L)
    assert(r.getLong(3) == 3L * 1000000L / 10L)
  }

  test("symbol ratio counts # and ellipsis runs per word") {
    val r = run(Seq((1L, "x # y ## z")))(1L)          // 5 words, 3 '#'
    assert(r.getLong(3) == 3L * 1000000L / 5L && r.getLong(8) == 0L)
  }

  test("non-Latin words fail the 80% alpha-word floor") {
    val doc = (Seq.fill(30)("привет мир").mkString(" ")
      + " the cat with dog")                          // 64 words, 4 alpha
    val r = run(Seq((1L, doc)))(1L)
    assert(r.getLong(1) == 64L)
    assert(r.getLong(6) == 4L * 1000000L / 64L)
    assert(r.getLong(8) == 0L)
  }

  test("single-char words sink mean word length below 3") {
    val doc = Seq.fill(60)("a b").mkString(" ")       // 120 1-char words
    val r = run(Seq((1L, doc)))(1L)
    assert(r.getLong(2) == 1000000L && r.getLong(8) == 0L)
  }

  test("stopword rule needs two distinct hits; null text reads empty") {
    val one = run(Seq((1L, Seq.fill(60)("the cat").mkString(" "))))(1L)
    assert(one.getLong(7) == 1L && one.getLong(8) == 0L)
    val nul = run(Seq((2L, null: String)))(2L)
    assert((1 to 8).forall(i => nul.getLong(i) == 0L))
  }
}
