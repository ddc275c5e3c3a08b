package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.dsirScore]] + [[graft.codecs.HashedGramCounts]] —
  * bucket parity with independent md5, the target≡source fixed
  * point, and selection direction. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("hashed gram counts bucket by independent md5 parity") {
    // python hashlib: int(md5(g)[:8],16)%64 → 'a b'=13, 'b c'=61,
    // 'hi'=28 (whole-text gram: doc shorter than n)
    val out = Seq(("a b c", 0), ("hi", 1)).toDF("text", "i")
      .select(col("i"), graft.functions.GraftFunctions.hashedGramCounts(
        NearDedup.tokens(col("text"), unicode = false), 2, 64).as("fc"))
      .orderBy("i").as[(Int, Seq[Long])].collect()
    assert(out(0)._2(13) == 1L && out(0)._2(61) == 1L)
    assert(out(0)._2.sum == 2L)
    assert(out(1)._2(28) == 1L && out(1)._2.sum == 1L)
  }

  test("target identical to source scores every document zero") {
    val docs = Seq((0L, "x y z"), (1L, "p q r"), (2L, "x y q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dsirScore(docs, "doc_id", "text",
        docs, "text", n = 2, buckets = 32)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._3) == Seq(0L, 0L, 0L))
    assert(out.map(_._2) == Seq(2L, 2L, 2L)) // bigram counts
  }

  test("documents resembling the target outscore the rest") {
    // corpus: 4 docs of A-dialect, 4 of B-dialect; target = the
    // A-dialect subset → every A doc must outscore every B doc
    val a = (0L to 3L).map(i => (i, "alpha beta gamma delta"))
    val b = (4L to 7L).map(i => (i, "omega psi chi phi"))
    val docs = (a ++ b).toDF("doc_id", "text")
    val out = TextAnalysis.dsirScore(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 4), "text", n = 2, buckets = 32)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val (sa, sb) = (out.take(4).map(_._3), out.drop(4).map(_._3))
    assert(sa.min > sb.max,
      s"A-dialect scores $sa must exceed B-dialect $sb")
  }

  test("linearClassify: score = bias + feature dot, threshold gates " +
      "keep, null text is empty text") {
    // hand-derivable weights: every bucket weighs 1 → score =
    // bias + gram count; 'a b c' has 2 bigrams
    val docs = Seq((1L, "a b c"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.linearClassify(docs, "doc_id", "text",
        weightsPpm = Seq.fill(16)(1L), biasPpm = 100L,
        thresholdPpm = 102L)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // doc 1: 2 bigrams → 102, keep; doc 2: one whole-text gram →
    // 101, drop; doc 3: empty text still one '' gram → 101, drop
    assert(out == Seq((1L, 2L, 102L, true), (2L, 1L, 101L, false),
      (3L, 1L, 101L, false)), s"$out")
  }

  test("linearClassify: differential weights separate dialects") {
    val docs = Seq((1L, "alpha beta alpha beta"),
      (2L, "omega psi omega psi")).toDF("doc_id", "text")
    // learn-free check: weight = +1 on doc 1's buckets, -1 on doc
    // 2's, via the same hash map the classifier uses
    val b = 32
    def bucketOf(s: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      (v % b).toInt
    }
    val pos = Seq("alpha beta", "beta alpha").map(bucketOf).toSet
    val neg = Seq("omega psi", "psi omega").map(bucketOf).toSet
    val w = Seq.tabulate(b)(i =>
      if (pos(i)) 1L else if (neg(i)) -1L else 0L)
    val out = TextAnalysis.linearClassify(docs, "doc_id", "text", w)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out(0)._3 > 0 && out(0)._4)
    assert(out(1)._3 < 0 && !out(1)._4)
  }
}
