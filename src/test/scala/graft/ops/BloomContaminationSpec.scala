package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** bloomContamination: exact parity with the join-only path, no
  * false negatives by construction, empty-benchmark behavior, and
  * the BloomMightContain expression contract.
  */
class BloomContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the quick brown fox likes the lazy dog a lot"),
    (4L, "completely unrelated content goes here today")
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "the quick brown fox jumps high")
  ).toDF("doc_id", "text")

  test("result is identical to the exact contamination path") {
    val exact = NearDedup.contamination(corpus, "doc_id", "text",
      bench, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val bloom = NearDedup.bloomContamination(corpus, "doc_id", "text",
      bench, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(bloom == exact)
    // and the fixture actually exercises hits AND misses
    assert(exact.exists(_._3 > 0) && exact.exists(_._3 == 0))
  }

  test("parity holds at a sloppy fpp (false positives get verified away)") {
    val exact = NearDedup.contamination(corpus, "doc_id", "text",
      bench, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val bloom = NearDedup.bloomContamination(corpus, "doc_id", "text",
      bench, "doc_id", "text", fpp = 0.5).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(bloom == exact)
  }

  test("empty benchmark: every doc reports zero contamination") {
    val out = NearDedup.bloomContamination(corpus, "doc_id", "text",
      bench.filter(lit(false)), "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.length == 4)
    assert(out.forall(r => r._3 == 0L && r._4 == 0L))
    assert(out.forall(_._2 > 0L)) // totals still counted
  }

  test("BloomMightContain: no false negatives, nulls stay null") {
    val members = (0 until 1000).map(i => s"member_$i")
    val bf = members.toDF("s").stat.bloomFilter("s", 1000, 0.03)
    val bytes = graft.codecs.BloomBytes.toBytes(bf)
    val probed = (members ++ (0 until 1000).map(i => s"other_$i"))
      .toDF("s")
      .withColumn("hit", GraftFunctions.bloomMightContain(col("s"), bytes))
    // every true member admits
    assert(probed.filter(col("s").startsWith("member_") && !col("hit"))
      .count() == 0)
    // non-members mostly rejected (fpp 3% over 1000 probes — allow 10x)
    assert(probed.filter(col("s").startsWith("other_") && col("hit"))
      .count() < 300)
    val withNull = Seq[(String, Int)](("member_1", 0), (null, 1)).toDF("s", "i")
      .withColumn("hit", GraftFunctions.bloomMightContain(col("s"), bytes))
      .orderBy("i").select("hit").collect()
    assert(withNull(0).getBoolean(0))
    assert(withNull(1).isNullAt(0))
  }

  test("prefilter semantics: admitted superset, exact verify subset") {
    // shingles of doc 4 share nothing with bench; bloom at tight fpp
    // should reject them before the join — verify via the public
    // column: count admitted vs verified
    val ex = NearDedup.contamination(corpus, "doc_id", "text",
      bench, "doc_id", "text")
    val verified = ex.agg(sum("n_contaminated")).as[Long].head()
    val bloom = NearDedup.bloomContamination(corpus, "doc_id", "text",
      bench, "doc_id", "text", fpp = 0.001)
    val bverified = bloom.agg(sum("n_contaminated")).as[Long].head()
    assert(verified == bverified)
  }
}
