package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranking.withDenseRank]] — the one-shuffle dense rank the r19
  * optimization round swapped into SuffixArray's prefix-doubling
  * rounds (replacing distinct → global-index → join-back). The
  * contract it must keep: ranks equal `dense_rank() OVER (ORDER BY
  * keys) - 1` for ANY key multiplicity, across partition boundaries,
  * for long AND string keys, with nulls ranking as one class. */
class DenseRankSpec extends SparkSpec {
  import spark.implicits._

  private def oracle(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String]) =
    df.withColumn("exp",
      dense_rank().over(Window.orderBy(keys.map(col): _*)) - 1)

  test("dense rank equals the window oracle on duplicate-heavy longs") {
    // many duplicates per key, enough rows for several range partitions
    val df = spark.range(5000).toDF("i")
      .select(($"i" % 37).as("k"), ($"i" % 7).as("k2"), $"i")
    val got = Ranking.withDenseRank(df, Seq("k", "k2"), "rnk")
    assert(got.columns.toSeq == Seq("k", "k2", "i", "rnk"))
    val joined = oracle(df, Seq("k", "k2"))
      .join(got, Seq("k", "k2", "i"))
    assert(joined.filter($"exp" =!= $"rnk").count() == 0)
    // dense: 0..(distinct-1), no gaps
    val ranks = got.select("rnk").distinct().as[Long].collect().sorted
    assert(ranks.toSeq == (0L until ranks.length))
    assert(ranks.length == 37 * 7)
  }

  test("string keys and null keys rank as classes, window-exact") {
    val df = Seq("b", "a", null, "a", "c", null, "b", "a")
      .toDF("s").withColumn("id", monotonically_increasing_id())
    val got = Ranking.withDenseRank(df, Seq("s"), "rnk")
    val exp = oracle(df, Seq("s"))
    // join on id only: a null key column would never equi-join
    val j = exp.select("id", "exp").join(got.select("id", "rnk"),
      Seq("id"), "fullouter")
    assert(j.filter($"exp".isNull || $"rnk".isNull ||
      $"exp" =!= $"rnk").count() == 0)
  }

  test("empty frame and single run") {
    val empty = Ranking.withDenseRank(
      spark.range(0).toDF("id"), Seq("id"), "rnk")
    assert(empty.count() == 0)
    val one = Ranking.withDenseRank(
      spark.range(4).select(lit(9L).as("k")), Seq("k"), "rnk")
      .select("rnk").as[Long].collect().toSeq
    assert(one == Seq(0L, 0L, 0L, 0L))
  }

  test("SuffixArray.suffixRanks still matches the string-sort oracle") {
    // ranks from prefix doubling == dense_rank over suffix strings
    val docs = Seq((1L, "abracadabra"), (2L, "banana"),
      (3L, "abracadab"), (4L, "a")).toDF("doc_id", "text")
    val got = SuffixArray.suffixRanks(docs, "doc_id", "text",
      maxLen = 64)
    val sufs = docs.select($"doc_id",
        explode(sequence(lit(1), length($"text"))).as("pos"),
        expr("substring(text, pos)").as("suf"))
      .withColumn("exp", dense_rank().over(Window.orderBy($"suf")))
    val j = sufs.join(got, Seq("doc_id", "pos"))
    assert(j.filter($"exp" =!= $"rnk").count() == 0)
  }
}
