package graft.ops

import graft.SparkSpec

/** bpePairCounts: vocabulary weighting, adjacency, single-char and
  * repeated-char behavior, minCount gate.
  */
class BpePairSpec extends SparkSpec {
  import spark.implicits._

  private def run(minCount: Long, texts: String*) =
    TextAnalysis.bpePairCounts(texts.map(Tuple1(_)).toDF("text"),
        "text", minCount)
      .orderBy("pair").as[(String, Long)].collect().toSeq

  test("pairs weight by token occurrence count, not distinct tokens") {
    // "ab" x3, "ac" x1 -> (a b):3, (a c):1
    val out = run(1L, "ab ab ac", "ab")
    assert(out == Seq(("a b", 3L), ("a c", 1L)))
  }

  test("repeated chars inside one token count each adjacency") {
    // "aaa": pairs (a a) twice per occurrence
    val out = run(1L, "aaa aaa")
    assert(out == Seq(("a a", 4L)))
  }

  test("single-char tokens contribute nothing") {
    assert(run(1L, "a b c a").isEmpty)
  }

  test("minCount gates the tail") {
    val out = run(3L, "ab ab ab xy")
    assert(out == Seq(("a b", 3L)))
  }
}
