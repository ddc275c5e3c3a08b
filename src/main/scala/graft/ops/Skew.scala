package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle joins — the manual complement
  * to AQE's runtime skew-join splitting (which only fires when a
  * partition exceeds `spark.sql.adaptive.skewJoin.*` thresholds and
  * cannot help when ONE key dominates a partition by itself).
  *
  * Shape: salt the skewed (large) side with a deterministic bucket in
  * [0, factor), replicate the small side `factor`×, and join on
  * (key, salt) — the hot key's rows spread over `factor` tasks
  * instead of one. Join semantics are identical to the unsalted
  * equi-join; the salt is internal and dropped from the output.
  *
  * The salt must be a pure function of row CONTENT, never of row
  * order: the salted join shuffles on (key, salt), and if an
  * upstream map task is retried mid-shuffle an order-dependent salt
  * (partition counters, monotonically_increasing_id) could re-assign
  * rows to different reducers than the ones that already fetched the
  * first attempt's blocks — duplicated or lost join rows. So the
  * salt is `pmod(xxhash64(saltCols), factor)`: pass one cheap
  * row-distinguishing column (an id, a line number) as `saltCols` to
  * avoid hashing wide rows; the default hashes every column, which
  * is always safe (a 100-column table pays wide-row hashing — name a
  * disambiguator to skip it).
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `keys`, salted `factor` ways.
    * `small` is replicated `factor`× (use only when small ≪ large —
    * the same precondition as a broadcast join, relaxed by factor).
    * `saltCols`: columns whose hash spreads a hot key's rows — one
    * cheap row-distinguishing column is enough; empty (default)
    * hashes the whole row (safe for any table). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(factor >= 1, s"salt factor $factor")
    require(keys.nonEmpty, "need join keys")
    val hashed = if (saltCols.nonEmpty) saltCols else large.columns.toSeq
    val saltL = pmod(xxhash64(hashed.map(large(_)): _*), lit(factor.toLong))
    val l = large.withColumn("__salt", saltL)
    val s = small.crossJoin(
      org.apache.spark.sql.functions.broadcast(
        small.sparkSession.range(factor).toDF("__salt")))
    l.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Per-key row counts of the would-be shuffle — the diagnostic used
    * to decide whether salting is needed (top-k heaviest keys). */
  def keyHistogram(df: DataFrame, keys: Seq[String], topK: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).count()
      .orderBy(col("count").desc)
      .limit(topK)

  /** The salt factor [[autoSaltedJoin]] will use: the
    * [[joinSkewAdvisor]] recommendation for the HEAVIEST key —
    * ceil(max pair cost / targetPairs) capped at `maxSalt`, 1 when
    * no key exceeds the target. Integer arithmetic, two
    * map-side-combined histograms (O(distinct keys), never the
    * corpus), one driver-read aggregate row. */
  def recommendSaltFactor(large: DataFrame, small: DataFrame,
      keys: Seq[String], targetPairs: Long = 1000000L,
      maxSalt: Int = 256): Int = {
    require(keys.nonEmpty, "need join keys")
    require(targetPairs >= 1 && maxSalt >= 1, "positive bounds")
    val kc = keys.map(col)
    val cl = large.na.drop(keys).groupBy(kc: _*)
      .agg(count(lit(1)).as("__nl"))
    val cr = small.na.drop(keys).groupBy(kc: _*)
      .agg(count(lit(1)).as("__nr"))
    val worst = cl.join(cr, keys)
      .agg(coalesce(max(col("__nl") * col("__nr")), lit(0L)))
      .head().getLong(0)
    math.max(1L,
      math.min(maxSalt.toLong, (worst + targetPairs - 1) / targetPairs))
      .toInt
  }

  /** One-call skew-safe inner join: run the advisor histograms,
    * feed the recommended factor into [[saltedJoin]] — the wiring
    * [[joinSkewAdvisor]] users previously did by hand. Semantics
    * identical to `large.join(small, keys)`; when no key exceeds
    * `targetPairs` it degenerates to exactly that plain join (no
    * salt column, no small-side replication). The advisor pass
    * costs two histogram aggregations up front — worth it precisely
    * when the join is big enough for a hot key to matter; for a
    * join you already know is uniform, call `join` directly. */
  def autoSaltedJoin(large: DataFrame, small: DataFrame,
      keys: Seq[String], targetPairs: Long = 1000000L,
      maxSalt: Int = 256, saltCols: Seq[String] = Nil): DataFrame = {
    val f = recommendSaltFactor(large, small, keys, targetPairs,
      maxSalt)
    if (f <= 1) large.join(small, keys)
    else saltedJoin(large, small, keys, f, saltCols)
  }

  /** Join-skew advisor — the planning pass to run BEFORE a big
    * shuffle join: per join key, both sides' row counts, the pair
    * cost n_left·n_right (the work a single reducer would do for
    * that key), and the recommended salt factor
    * ceil(pairs / targetPairs) capped at `maxSalt` — the number
    * [[saltedJoin]] takes as `factor`. Integer arithmetic
    * throughout (ceil = (p + t − 1) DIV t, no float).
    *
    * Scale shape: two map-side-combined `groupBy` counts
    * (key-domain-sized histograms, never the corpus) joined on the
    * key, then a bounded top-k by pair cost — the advisor's own cost
    * is O(distinct keys) regardless of corpus size. */
  def joinSkewAdvisor(left: DataFrame, lKey: String,
      right: DataFrame, rKey: String, targetPairs: Long = 1000000L,
      maxSalt: Int = 256, topK: Int = 20): DataFrame = {
    require(targetPairs >= 1, s"targetPairs $targetPairs")
    require(maxSalt >= 1 && topK >= 1, "positive maxSalt/topK")
    val cl = left.filter(col(lKey).isNotNull)
      .groupBy(col(lKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val cr = right.filter(col(rKey).isNotNull)
      .groupBy(col(rKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    cl.join(cr, Seq("key"))
      .withColumn("pairs", col("n_left") * col("n_right"))
      .withColumn("salt", least(
        expr(s"(pairs + ${targetPairs - 1}L) DIV ${targetPairs}L"),
        lit(maxSalt.toLong)))
      .orderBy(col("pairs").desc, col("key"))
      .limit(topK)
  }
}
