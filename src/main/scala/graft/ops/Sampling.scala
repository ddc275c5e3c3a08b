package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.predicates.PseudorandomSplit

/** Sampling / ordering operators with a portable determinism
  * contract: everything is keyed on md5-derived fractions, so the
  * same row lands in the same sample (and the same position in a
  * permutation) on any engine, any cluster size, forever — the
  * property petastorm's seeded readers approximate with seeded RNGs
  * (reader.py:99,474-479; weighted_sampling_reader.py:26-99).
  */
object Sampling {

  /** Deterministic keep-fraction sample: row kept iff
    * `frac(md5(seed:salt:key)) < fraction`. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
      seed: Long = 0, salt: String = ""): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction")
    PseudorandomSplit.hashFraction(
      concat(lit(s"$seed:$salt:"), key.cast("string"))) < lit(fraction)
  }

  /** Weighted union of readers (SH3): each input is sampled at its
    * probability (independent hash families per branch), then
    * union'd. The reference mixes by drawing per-row at read time —
    * same expected composition, but this form is deterministic and
    * embarrassingly parallel (no shared iterator state). */
  def weightedUnion(dfs: Seq[(DataFrame, Double)], keyCol: String,
      seed: Long = 0): DataFrame = {
    require(dfs.nonEmpty)
    dfs.zipWithIndex.map { case ((df, p), i) =>
      df.filter(sampleByKey(df, col(keyCol), p, seed, salt = i.toString))
    }.reduce(_.unionByName(_))
  }

  /** Position of each row under the deterministic seeded permutation
    * (md5 order) — the portable form of `shuffle(seed)`. A global
    * permutation is inherently a global sort; at scale, prefer
    * [[graft.sources.GraftRead.shuffle]] (xxhash64 sort, same
    * contract, cheaper key) unless cross-engine reproducibility of
    * the exact order matters. */
  def permutationRank(key: Column, seed: Long): (Column, Column) = {
    val sortKey = md5(concat(lit(s"$seed:"), key.cast("string")))
    (sortKey, row_number().over(Window.orderBy(sortKey, key)))
  }

  /** (row, position) under the seeded permutation, keyed on `keyCol`. */
  def withShufflePosition(df: DataFrame, keyCol: String, seed: Long,
      posCol: String = "pos"): DataFrame = {
    val (_, rank) = permutationRank(col(keyCol), seed)
    df.withColumn(posCol, rank)
  }

  /** A4 parity (test_util/shuffling_analysis.py:52-109): Pearson
    * correlation between the key order and its shuffled position —
    * ~0 for a good shuffle, 1.0 for unshuffled. */
  def shuffleQuality(df: DataFrame, keyCol: String, seed: Long): DataFrame =
    withShufflePosition(df, keyCol, seed)
      .agg(corr(col(keyCol).cast("double"), col("pos").cast("double"))
        .as("order_corr"))
}
