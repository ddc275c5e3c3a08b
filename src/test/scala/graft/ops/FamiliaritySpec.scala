package graft.ops

import graft.SparkSpec

/** bigramFamiliarity: occurrence-weighted corpus means, exact
  * micros, self-counting, short-doc omission.
  */
class FamiliaritySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    TextAnalysis.bigramFamiliarity(rows.toSeq.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq

  test("shared bigrams raise both docs' familiarity equally") {
    // corpus: "a b"×2, "b c"×1, "b d"×1 → both docs (2+1)/2
    val out = run((1L, "a b c"), (2L, "a b d"))
    assert(out == Seq((1L, 2L, 1500000L), (2L, 2L, 1500000L)))
  }

  test("all-unique bigrams floor at exactly 1.0 (own occurrence)") {
    val out = run((1L, "a b c"), (2L, "x y z"))
    assert(out.forall(_._3 == 1000000L))
  }

  test("within-doc repetition self-counts with multiplicity") {
    // doc bigrams: "p q", "q p", "p q" → counts 2,1,2 → 5/3 micros
    val out = run((1L, "p q p q"))
    assert(out == Seq((1L, 3L, 1666666L)))
  }

  test("docs with fewer than two tokens emit no row") {
    val out = run((1L, "solo"), (2L, ""), (3L, "two tokens"))
    assert(out.map(_._1) == Seq(3L))
  }
}
