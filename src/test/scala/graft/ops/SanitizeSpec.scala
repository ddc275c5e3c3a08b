package graft.ops

import graft.SparkSpec

/** sanitize/cleanText: control-char stripping, whitespace collapse,
  * trim accounting, clean-input no-op.
  */
class SanitizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) =
    TextAnalysis.sanitize(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect().head

  test("control chars are stripped and counted; tab/LF/CR survive as ws") {
    val (_, nCtrl, nWs, nClean, _) = run("a\u0007b\u001fc")
    assert(nCtrl == 2L && nWs == 0L && nClean == 3L) // "abc"
  }

  test("whitespace runs collapse to one space; edges trim") {
    val (_, nCtrl, nWs, nClean, _) = run("  a \t b\n\nc  ")
    // 12 chars -> "a b c" (5): 0 ctrl, 7 ws removed
    assert(nCtrl == 0L && nWs == 7L && nClean == 5L)
  }

  test("clean input is a fixpoint with zero counts") {
    val (_, nCtrl, nWs, nClean, md5a) = run("already clean text")
    assert(nCtrl == 0L && nWs == 0L && nClean == 18L)
    val (_, _, _, _, md5b) = run("already clean text")
    assert(md5a == md5b)
  }

  test("tagKeywords: substring hits, exact counts, misses dropped") {
    import spark.implicits._
    val docs = Seq((1L, "Scan the scanner; rescan."), (2L, "no match here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val dict = Seq(("exec", "scan"), ("exec", "merge"), ("x", "SCAN"))
      .toDF("tag", "kw")
    val got = TextAnalysis.tagKeywords(docs, "doc_id", "text",
        dict, "tag", "kw")
      .as[(Long, String, String, Long)].collect().toSet
    // lowercased dictionary dedups ('scan' under both tags kept apart),
    // doc 1 contains 'scan' 3 times (scan, scanner, rescan)
    assert(got == Set((1L, "exec", "scan", 3L), (1L, "x", "scan", 3L)))
  }

  test("rakeKeyphrases: paper scoring on a hand-checked example") {
    import spark.implicits._
    val docs = Seq("Machine learning drives machine vision; learning helps.")
      .toDF("text")
    val got = TextAnalysis.rakeKeyphrases(docs, "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // phrases: "machine learning drives machine vision" (len 5),
    // "learning helps" (len 2)
    // freq: machine 2, learning 2, drives 1, vision 1, helps 1
    // deg:  machine 10, learning 7, drives 5, vision 5, helps 2
    // scores ppm: 5e6, 3.5e6, 5e6, 5e6, 2e6
    assert(got.size == 2)
    assert(got("machine learning drives machine vision") ==
      (("machine learning drives machine vision", 1L, 5L, 23500000L)))
    assert(got("learning helps") == (("learning helps", 1L, 2L, 5500000L)))
    // minCount prunes phrases but not the word statistics
    val pruned = TextAnalysis.rakeKeyphrases(docs, "text", minCount = 2L)
    assert(pruned.count() == 0L)
  }

  test("vocabOverlap: exact Jaccard, zero-overlap pairs kept") {
    import spark.implicits._
    val docs = Seq(("en", "a b c"), ("en", "a a b"), ("fr", "b c d"),
      ("zz", "x")).toDF("lang", "text")
    val got = TextAnalysis.vocabOverlap(docs, "lang", "text")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size == 3)
    // en {a,b,c} vs fr {b,c,d}: common 2, union 4 -> 500000
    assert(got(("en", "fr")) == (("en", "fr", 3L, 3L, 2L, 500000L)))
    assert(got(("en", "zz")) == (("en", "zz", 3L, 1L, 0L, 0L)))
    assert(got(("fr", "zz")) == (("fr", "zz", 3L, 1L, 0L, 0L)))
  }

  test("ctrl chars adjacent to spaces do not double-count") {
    // ctrl removed first -> "x  y" -> collapse -> "x y"
    val (_, nCtrl, nWs, nClean, _) = run("x \u0007 y")
    assert(nCtrl == 1L && nWs == 1L && nClean == 3L)
  }
}
