package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch invariants (never undercounts, bounded state,
  * mergeable) and the Heaps-law vocabulary-growth curve vs a plain
  * in-memory reference. */
class CountMinGrowthSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: value i appears i times, i in 1..40
  private val skewed = (1 to 40).flatMap(i => Seq.fill(i)(f"t$i%02d"))

  test("count-min never undercounts and is exact without collisions") {
    val df = skewed.toDF("v")
    val sk = Sketch.countMinSketch(df, "v", depth = 3, width = 64)
    val truth = skewed.groupBy(identity).map { case (k, vs) =>
      k -> vs.size.toLong }
    val est = Sketch.countMinEstimate(sk, skewed.distinct.toDF("v"), "v",
        depth = 3, width = 64)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"undercount for $k: ${est(k)} < $n")
    }
  }

  test("count-min sketch state is bounded at depth x width") {
    val sk = Sketch.countMinSketch(skewed.toDF("v"), "v", 3, 8).collect()
    assert(sk.length <= 3 * 8)
    // every input row increments exactly one counter per hash row
    val perRow = sk.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perRow == Map(0 -> skewed.size.toLong,
      1 -> skewed.size.toLong, 2 -> skewed.size.toLong))
  }

  test("count-min sketches merge by union + re-sum") {
    val (a, b) = skewed.splitAt(skewed.size / 2)
    val merged = Sketch.countMinSketch(a.toDF("v"), "v", 3, 16)
      .union(Sketch.countMinSketch(b.toDF("v"), "v", 3, 16))
      .groupBy(col("cm_row"), col("cm_col"))
      .agg(sum(col("cnt")).as("cnt"))
    val direct = Sketch.countMinSketch(skewed.toDF("v"), "v", 3, 16)
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      direct.as[(Int, Long, Long)].collect().toSet)
  }

  test("count-min estimate on a never-seen key is 0 or a collision") {
    val sk = Sketch.countMinSketch(skewed.toDF("v"), "v", 4, 4096)
    val est = Sketch.countMinEstimate(sk, Seq("absent").toDF("v"), "v",
      4, 4096).as[(String, Long)].collect().head._2
    assert(est >= 0L) // wide grid → almost surely 0, never negative
  }

  private val docs = Seq(
    (0L, "alpha beta"), (1L, "alpha gamma"),
    (2L, "beta beta delta"), (3L, "epsilon"))

  test("vocab growth matches the hand-computed curve") {
    val got = TextAnalysis.vocabGrowth(docs.toDF("doc_id", "text"),
        "doc_id", "text", bucketSize = 2L)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bucket 0: docs 0-1 → 4 tokens, new {alpha, beta, gamma}
    // bucket 1: docs 2-3 → 4 tokens, new {delta, epsilon}
    assert(got == Seq(
      (0L, 4L, 3L, 4L, 3L),
      (1L, 4L, 2L, 8L, 5L)))
  }

  test("vocab growth cumulative totals close over the corpus") {
    val corpus = (0L until 30L).map { i =>
      (i, (0 to (i % 5).toInt)
        .map(j => "w" + ('a' + ((i + j) % 7)).toChar).mkString(" "))
    }
    val rows = TextAnalysis.vocabGrowth(corpus.toDF("doc_id", "text"),
        "doc_id", "text", bucketSize = 10L)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val allToks = corpus.flatMap(_._2.split(" "))
    assert(rows.last._4 == allToks.size.toLong)
    assert(rows.last._5 == allToks.distinct.size.toLong)
    assert(rows.map(_._2).sum == rows.last._4)
    assert(rows.map(_._3).sum == rows.last._5)
    // cumulatives are running sums of the per-bucket columns
    assert(rows.scanLeft(0L)(_ + _._2).tail.toSeq == rows.map(_._4).toSeq)
    assert(rows.scanLeft(0L)(_ + _._3).tail.toSeq == rows.map(_._5).toSeq)
  }
}
