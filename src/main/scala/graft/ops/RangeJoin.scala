package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval-containment) join: match point rows
  * whose `valueCol` falls inside interval rows' `[loCol, hiCol]`.
  *
  * Spark plans a raw `lo <= v AND v <= hi` join as a broadcast
  * nested loop — quadratic work and a broadcast of one whole side,
  * the definitional non-starter at 100 TB. This operator buckets the
  * value domain into `binSize`-wide bins: each interval replicates to
  * the bins it covers (`ceil(len/binSize)+1` rows), each point hashes
  * to exactly one bin, and the join becomes a plain hash equi-join on
  * the bin id followed by the exact containment filter. A qualifying
  * (point, interval) pair meets in EXACTLY one bin — the point's — so
  * no dedup pass is needed. `binSize` trades interval replication
  * (long intervals, small bins) against bucket width (short bins keep
  * buckets selective); set it near the typical interval length.
  * Intervals with `hi < lo` are dropped (they can contain nothing —
  * and an unguarded `sequence(lo, hi)` would run BACKWARD and
  * fabricate bins).
  *
  * Output: all point columns + all interval columns (inner join).
  */
object RangeJoin {

  def byBins(points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive (got $binSize)")
    val p = points.withColumn("__bin", binOf(col(valueCol), binSize))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(loCol), binSize), binOf(col(hiCol), binSize))))
    p.join(iv, Seq("__bin"))
      .filter(col(loCol) <= col(valueCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Distributed interval-OVERLAP join: match interval rows from two
    * sets where `[aLo, aHi]` and `[bLo, bHi]` (inclusive integer
    * endpoints) intersect. Same bin-replication idea as [[byBins]],
    * with the twist that two intervals can now share MANY bins — so
    * each qualifying pair is emitted only in its CANONICAL bin, the
    * one containing the overlap's start `max(aLo, bLo)`. That filter
    * makes the output exactly-once without a distinct (a corpus-sized
    * dedup shuffle saved), and both sides replicate at
    * `ceil(len/binSize)+1` — the equi-join on the bin id is the only
    * exchange. The naive `aLo <= bHi AND bLo <= aHi` spelling plans
    * as a broadcast nested loop, the 100 TB non-starter.
    *
    * Output: all left columns + all right columns (inner join).
    * Column names must not collide across the two sides; empty
    * intervals (`hi < lo`) are dropped. */
  def overlapByBins(left: DataFrame, aLo: String, aHi: String,
      right: DataFrame, bLo: String, bHi: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive (got $binSize)")
    val a = left.filter(col(aLo) <= col(aHi))
      .withColumn("__bin", explode(sequence(
        binOf(col(aLo), binSize), binOf(col(aHi), binSize))))
    val b = right.filter(col(bLo) <= col(bHi))
      .withColumn("__bin", explode(sequence(
        binOf(col(bLo), binSize), binOf(col(bHi), binSize))))
    a.join(b, Seq("__bin"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === binOf(greatest(col(aLo), col(bLo)), binSize))
      .drop("__bin")
  }

  /** Floor-division bin id (works for negative values too, matching
    * floor semantics rather than truncate-toward-zero). */
  private def binOf(v: Column, binSize: Long): Column =
    floor(v.cast("long").cast("double") / binSize).cast("long")
}
