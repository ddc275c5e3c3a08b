package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Seeded-permutation sort key for `key` (md5 order) — the portable
    * form of `shuffle(seed)`: same row, same position, any engine. */
  def permutationKey(key: Column, seed: Long): Column =
    md5(concat(lit(s"$seed:"), key.cast("string")))

  /** (row, position) under the seeded permutation, keyed on `keyCol`.
    * A global permutation is inherently a global sort; this one is
    * computed scale-out via [[Ranking.withGlobalIndex]] (range
    * shuffle + per-partition offsets), NOT a single-partition global
    * window. `posCol` is a 1-based LONG — an int would overflow past
    * ~2.1B rows, i.e. exactly the scale this shape exists for. At
    * scale, prefer [[graft.sources.GraftRead.shuffle]] (xxhash64
    * sort, same contract, cheaper key) unless cross-engine
    * reproducibility of the exact position matters. */
  def withShufflePosition(df: DataFrame, keyCol: String, seed: Long,
      posCol: String = "pos"): DataFrame = {
    val staged = df.withColumn("__sk", permutationKey(col(keyCol), seed))
    Ranking.withGlobalIndex(staged, Seq(col("__sk"), col(keyCol)), "__idx")
      .withColumn(posCol, col("__idx") + 1)
      .drop("__sk", "__idx")
  }

  /** Deterministic stratified sample: at most `k` rows per stratum,
    * chosen by md5-permutation rank within the stratum — the same
    * rows survive on any engine, partitioning, or cluster size (the
    * portable form of per-class balanced sampling for training
    * mixes). Attaches `rankCol` (1-based int).
    *
    * Scale shape: Spark plans the rank filter as WindowGroupLimit —
    * every task keeps only its local top-k per stratum BEFORE the
    * shuffle, so a 100 TB corpus shuffles at most k·strata·tasks
    * rows, never the corpus. A skewed stratum therefore costs its
    * mappers, not one reducer. */
  def stratified(df: DataFrame, strataCol: String, keyCol: String, k: Int,
      seed: Long = 0, rankCol: String = "samp_rank"): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(permutationKey(col(keyCol), seed), col(keyCol))
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** A4 parity (test_util/shuffling_analysis.py:52-109): Pearson
    * correlation between the key order and its shuffled position —
    * ~0 for a good shuffle, 1.0 for unshuffled. */
  def shuffleQuality(df: DataFrame, keyCol: String, seed: Long): DataFrame =
    withShufflePosition(df, keyCol, seed)
      .agg(corr(col(keyCol).cast("double"), col("pos").cast("double"))
        .as("order_corr"))

  /** The EXACT integer moments behind [[shuffleQuality]]'s Pearson
    * correlation — (n, Σx, Σy, Σxy, Σx², Σy²) over (key, position).
    * Integer sums are addition-order-invariant, so the analysis is
    * reproducible bit-for-bit on any engine/partitioning (the float
    * `corr` is not — its summation order varies); the caller derives
    * r = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²) / √(nΣy²−(Σy)²) driver-side.
    * Sums accumulate in DECIMAL(38,0): Σy² ≈ n³/3 blows past a long
    * at only ~3M rows, far below the scale this operator targets —
    * 38 digits holds to ~10¹² rows. Requires an integral key. */
  def shuffleQualityMoments(df: DataFrame, keyCol: String,
      seed: Long): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(keyCol).cast("long").cast(dec)
    val y = col("pos").cast(dec)
    withShufflePosition(df, keyCol, seed).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"))
  }
}
