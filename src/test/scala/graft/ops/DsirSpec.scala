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
}
