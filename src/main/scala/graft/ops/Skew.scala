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
  * The salt is `pmod(monotonically_increasing_id(), factor)` — a
  * per-partition row counter, so a hot key's rows round-robin over
  * all `factor` buckets with zero per-row hashing work (the r3 form
  * hashed EVERY column of the large side per row, which on a
  * 100-column table pays wide-row hashing for nothing: the salt only
  * needs to spread rows, any row-distinguishing value does).
  * Deterministic under task replay — the counter is a function of
  * the replayed partition's content, the same property the whole-row
  * hash had.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `keys`, salted `factor` ways.
    * `small` is replicated `factor`× (use only when small ≪ large —
    * the same precondition as a broadcast join, relaxed by factor).
    * Filter `large` BEFORE calling: the (nondeterministic) salt
    * column is a pushdown barrier for predicates added afterwards. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor $factor")
    require(keys.nonEmpty, "need join keys")
    val saltL = pmod(monotonically_increasing_id(), lit(factor.toLong))
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
}
