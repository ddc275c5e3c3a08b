package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram Viterbi segmentation: optimality vs a brute-force
  * reference DP, tie-break rules, unk coverage, unicode, and the
  * document-encode plumbing. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(tok: String, vocab: Seq[(String, Long)],
      unk: Long = 1000L): Seq[String] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    val maxCp = vocab.map(p => p._1.codePointCount(0, p._1.length))
      .foldLeft(1)(math.max)
    UnigramSegmentTokens.segment(tok, m, maxCp, unk).toSeq
  }

  /** Brute-force: enumerate ALL segmentations, pick by the
    * documented key (cost, n_pieces, then longest-last-piece
    * recursively = lexicographically LATEST split points). */
  private def brute(tok: String, vocab: Map[String, Long],
      unk: Long): (Long, Int) = {
    val cps = tok.codePoints().toArray
    def go(i: Int): Seq[(Long, Int)] =
      if (i == cps.length) Seq((0L, 0))
      else (1 to (cps.length - i)).flatMap { len =>
        val sub = new String(cps, i, len)
        val c = vocab.get(sub)
          .orElse(if (len == 1) Some(unk) else None)
        c.toSeq.flatMap(cc => go(i + len).map { case (rc, rn) =>
          (cc + rc, rn + 1) })
      }
    go(0).minBy(identity)
  }

  test("finds the minimum-cost segmentation") {
    val v = Seq(("ab", 10L), ("abc", 25L), ("c", 10L), ("a", 8L),
      ("b", 8L), ("bc", 12L))
    // ab+c = 20 beats abc=25, a+bc=20 ties, a+b+c=26
    val vm = v.toMap
    val got = seg("abc", v)
    assert(got.map(vm(_)).sum == 20L)
    assert(got.size == 2)
  }

  test("matches brute-force optimum on random-ish tokens") {
    val v = Seq(("a", 5L), ("b", 7L), ("ab", 9L), ("ba", 8L),
      ("aba", 15L), ("bb", 10L), ("aa", 11L))
    val vm = v.toMap
    for (tok <- Seq("ababab", "bbaabb", "aabbaa", "abababa", "xaxb",
        "bbbbbb", "a", "x")) {
      val got = seg(tok, v)
      val cost = got.map(s => vm.getOrElse(s, 1000L)).sum
      val (bc, bn) = brute(tok, vm, 1000L)
      assert(cost == bc, s"$tok: got $got cost $cost expected $bc")
      assert(got.size == bn, s"$tok: piece count ${got.size} vs $bn")
      assert(got.mkString == tok, s"$tok: coverage broken: $got")
    }
  }

  test("equal cost prefers fewer pieces, then the longer last piece") {
    // 'ab' vs 'a'+'b' at equal total cost → single piece wins
    val got = seg("ab", Seq(("ab", 16L), ("a", 8L), ("b", 8L)))
    assert(got == Seq("ab"))
    // equal cost AND pieces: 'ax'+'b' vs 'a'+'xb' → longer LAST
    val got2 = seg("axb",
      Seq(("ax", 10L), ("b", 5L), ("a", 5L), ("xb", 10L)))
    assert(got2 == Seq("a", "xb"))
  }

  test("unknown codepoints become unk pieces, coverage is total") {
    val got = seg("aZb", Seq(("a", 1L), ("b", 1L)))
    assert(got == Seq("a", "Z", "b"))
    assert(seg("ZZ", Seq(("a", 1L))) == Seq("Z", "Z"))
  }

  test("unicode pieces segment on codepoints") {
    val v = Seq(("дом", 5L), ("а", 2L), ("д", 3L), ("о", 3L), ("м", 3L))
    assert(seg("дома", v) == Seq("дом", "а"))
  }

  test("unigramEncode: per-document pieces in token order") {
    val v = Seq(("hel", 5L), ("lo", 5L), ("wor", 5L), ("ld", 5L),
      ("h", 9L), ("e", 9L), ("l", 9L), ("o", 9L))
    val df = Seq((1L, "hello world"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramEncode(df, "doc_id", "text", v,
        unkCost = 100L)
      .orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect().toSeq
    assert(got(0) == ((1L, Seq("hel", "lo", "wor", "ld"), 4L)))
    assert(got(1)._3 == 0L && got(2)._3 == 0L)
  }

  test("graft_unigram_segment_tokens SQL function round-trips") {
    graft.functions.GraftExtensions.registerAll(spark)
    val got = spark.sql("SELECT graft_unigram_segment_tokens(" +
      "array('abc'), 'ab:10,c:5,a:8,bc:6', 100) AS p")
      .as[Seq[String]].head()
    assert(got == Seq("a", "bc")) // 14 beats ab+c=15
  }

  test("negative costs are refused at construction, not as an " +
      "opaque DP crash") {
    // a negative unkCost (or piece cost) disables segment()'s
    // cost >= 0 reachability gate — the old failure was a
    // StringIndexOutOfBounds deep in path reconstruction
    val e1 = intercept[IllegalArgumentException] {
      UnigramSegmentTokens(
        org.apache.spark.sql.catalyst.expressions.Literal(null),
        Seq(("a", 1L)), unkCost = -5L)
    }
    assert(e1.getMessage.contains("unkCost"))
    val e2 = intercept[IllegalArgumentException] {
      UnigramSegmentTokens(
        org.apache.spark.sql.catalyst.expressions.Literal(null),
        Seq(("a", -1L)), unkCost = 10L)
    }
    assert(e2.getMessage.contains("negative piece cost"))
  }

  test("vocab round-trips through a DataFrame with the guard") {
    val v = Seq(("ab", 10L), ("c", 5L)).toDF("piece", "cost")
    val loaded = TextAnalysis.unigramVocabFromDF(v, "piece", "cost")
    assert(loaded.toSet == Set(("ab", 10L), ("c", 5L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramVocabFromDF(v, "piece", "cost", maxPieces = 1)
    }
  }
}
