package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity join by deletion neighborhoods — the
  * SymSpell blocking scheme (Garbe 2012; symmetric-delete spelling
  * correction): every word generates itself plus its single-character
  * deletions, and any two words within Levenshtein distance 1
  * PROVABLY share at least one variant (a substitution pair shares
  * the deletion at the edited position; an insert/delete pair shares
  * the shorter word itself). The join on the variant key is therefore
  * a COMPLETE candidate generator — unlike prefix/length blocking,
  * which silently misses edits at the blocked position — and the
  * final `levenshtein <= 1` filter kills the false positives
  * (distance-2 pairs like "ab"/"ba" can share variants).
  *
  * The typo-mining / entity-resolution primitive over a corpus
  * vocabulary: OCR noise, tokenizer-vocab near-misses, tracking-id
  * mutations.
  *
  * Scale shape: the variant table is Σ(len+1) rows over the DISTINCT
  * vocabulary (vocabulary-sized × mean length, not corpus-sized);
  * the self-join keys on the variant string, and bucket width is
  * capped: variant keys shared by more than `maxBucket` words are
  * dropped entirely (short variants like "ab" are hub keys whose
  * pairs are near-noise — same cap doctrine as the LSH and basket
  * joins; dropped keys are countable from the variant table). The
  * pair distinct and the verify filter run on the candidate set,
  * which the cap bounds at `maxBucket²/2` per key. */
object FuzzyJoin {

  /** Distinct word pairs (word_a < word_b) within Levenshtein
    * distance 1 over `vocab`'s `wordCol`, with the distance attached
    * (always 1 — equal words can't pair). Words shorter than
    * `minLen` are excluded (their neighborhoods are all-noise hubs),
    * as are words longer than `maxLen` (variant blowup guard). */
  def typoPairs(vocab: DataFrame, wordCol: String, minLen: Int = 3,
      maxLen: Int = 64, maxBucket: Int = 1000): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1 (got $minLen)")
    require(maxLen >= minLen, s"maxLen must be >= minLen (got $maxLen)")
    require(maxBucket >= 2, s"maxBucket must be >= 2 (got $maxBucket)")
    val w = vocab.select(col(wordCol).cast("string").as("w"))
      .filter(col("w").isNotNull &&
        length(col("w")) >= minLen && length(col("w")) <= maxLen)
      .distinct()
    val vars = w.select(col("w"), explode_outer(array_distinct(concat(
        array(col("w")),
        expr("transform(sequence(1, length(w)), i -> " +
          "concat(substring(w, 1, i - 1), " +
          "substring(w, i + 1, length(w))))")))).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ok = vars.groupBy(col("v")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("v"))
    val blocked = vars.join(ok, "v")
    blocked.as("x").join(blocked.as("y"),
        col("x.v") === col("y.v") && col("x.w") < col("y.w"))
      .select(col("x.w").as("word_a"), col("y.w").as("word_b"))
      .distinct()
      // threshold form (Spark 3.5+): banded DP, exact within the
      // bound, -1 beyond it — O(len) per pair instead of O(len²) on
      // the verify, the candidate set's dominant per-row cost.
      // Distinct words have dist >= 1, so === 1 is the same filter.
      .withColumn("dist", levenshtein(col("word_a"), col("word_b"), 1))
      .filter(col("dist") === 1)
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1997): rank
    * the distinct keys in lexicographic order and take every pair
    * within `window` ranks as a candidate, then verify
    * `levenshtein ≤ maxDist`. Recall is HEURISTIC (an edit at the
    * first character sorts far away — the exact failure
    * [[typoPairs]]' deletion neighborhoods provably avoid), but the
    * candidate count is O(n·window) REGARDLESS of key length, where
    * SymSpell's variant table grows with length — so SN is the
    * blocking for LONG keys (addresses, titles, URLs) and the
    * standard recall/cost trade to run BESIDE typoPairs, not
    * instead of it.
    *
    * Scale shape: the global rank rides
    * [[Ranking.withGlobalIndex]]'s prefix scan (no single-task
    * window); the rank-adjacency join is an EQUI-join on
    * rank+offset (offsets exploded 1..window — no range or theta
    * join); verification is codegen'd levenshtein on n·window
    * pairs. Output: (word_a, word_b, dist), word_a < word_b. */
  def sortedNeighborPairs(vocab: DataFrame, wordCol: String,
      window: Int = 3, maxDist: Int = 1): DataFrame = {
    require(window >= 1 && window <= 100,
      s"window must be in [1, 100] (got $window)")
    require(maxDist >= 1, s"maxDist must be >= 1 (got $maxDist)")
    val w = vocab.select(col(wordCol).cast("string").as("w"))
      .filter(col("w").isNotNull).distinct()
    val ranked = Ranking.withGlobalIndex(w, Seq(col("w")), "__rk")
    val offsets = array((1 to window).map(lit): _*)
    ranked.select(col("w").as("word_a"),
        explode(offsets).as("__o"), col("__rk"))
      .withColumn("__rk2", col("__rk") + col("__o"))
      .join(ranked.select(col("w").as("word_b"),
        col("__rk").as("__rk2")), "__rk2")
      // threshold form: banded DP, exact within maxDist (see
      // [[typoPairs]]); candidates are distinct words, so dist >= 1
      .withColumn("dist",
        levenshtein(col("word_a"), col("word_b"), maxDist))
      .filter(col("dist") >= 1 && col("dist") <= maxDist)
      .select(col("word_a"), col("word_b"), col("dist"))
  }
}
