package graft.ops

import graft.SparkSpec

/** [[TextAnalysis.ngramNovelty]] — first-occurrence attribution,
  * dup collapse, short-doc whole-text shingle, unicode opt-in. */
class NoveltySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], unicode: Boolean = false)
      : Map[Long, (Long, Long, Long)] =
    TextAnalysis.ngramNovelty(rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, unicode)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("novelty attributes each gram to its minimum-id document") {
    val out = run(Seq(
      (0L, "a b c d"),     // grams: "a b c","b c d" — both novel
      (1L, "a b c d"),     // exact dup → zero novel
      (2L, "a b c x y")))  // "a b c" seen; "b c x","c x y" novel
    assert(out(0L) == ((2L, 2L, 1000000L)))
    assert(out(1L) == ((2L, 0L, 0L)))
    assert(out(2L) == ((3L, 2L, 2L * 1000000L / 3L)))
  }

  test("short docs ride the whole-text shingle; repeats score zero") {
    val out = run(Seq((3L, "hi"), (4L, "hi"), (5L, "")))
    assert(out(3L) == ((1L, 1L, 1000000L)))
    assert(out(4L) == ((1L, 0L, 0L)))
    // empty text still yields one (empty) shingle, first seen at 5
    assert(out(5L) == ((1L, 1L, 1000000L)))
  }

  test("unicode opt-in sees non-Latin grams; ASCII mode collapses them") {
    val docs = Seq((0L, "привет мир снова тут"), (1L, "привет мир снова тут"))
    val ascii = run(docs)
    // ASCII tokenizer: zero tokens → both docs share the empty
    // whole-text shingle; doc 1 scores zero novel
    assert(ascii(0L) == ((1L, 1L, 1000000L)) && ascii(1L) == ((1L, 0L, 0L)))
    val uni = run(docs, unicode = true)
    assert(uni(0L) == ((2L, 2L, 1000000L)) && uni(1L) == ((2L, 0L, 0L)))
  }
}
