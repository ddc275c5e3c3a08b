package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot dataset delta — the versioning query behind
  * "what changed between yesterday's store and today's": every id
  * that was added, removed, or had a column change, with the changed
  * columns named. The complement of [[Dedup]] (same data twice vs
  * same id twice).
  *
  * Scale shape: each side collapses to (id, per-column md5) AT SCAN
  * SPEED before the only exchange, so the full-outer join shuffles
  * ~(32 hex chars × columns) per row instead of row payloads —
  * on a text-heavy corpus that is orders of magnitude less than
  * joining the rows themselves. Unchanged ids (the overwhelming
  * majority of a production delta) are filtered AFTER the join but
  * BEFORE anything driver-side; output is delta-sized.
  *
  * Column hashes are null-safe ("V"+value / "N" disambiguation — a
  * null never collides with any literal), columns are compared by
  * NAME (sorted), and both inputs must carry the same non-id column
  * set: a schema drift is a refused error, not a silent
  * all-rows-changed diff ([[graft.sources.GraftRead]]'s evolved-read
  * handles deliberate schema evolution; this op diffs data).
  *
  * Output: (idCol, status ∈ added|removed|changed,
  * changed_cols = comma-joined sorted column names, '' unless
  * changed). Scalar columns diff by their string form; complex
  * columns should be projected through `to_json` by the caller. */
object Diff {

  def datasetDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String): DataFrame = {
    val oldCols = oldDf.columns.filterNot(_ == idCol).sorted.toSeq
    val newCols = newDf.columns.filterNot(_ == idCol).sorted.toSeq
    require(oldCols == newCols,
      s"datasetDiff: column sets differ — old has ${oldCols.mkString(",")}" +
        s", new has ${newCols.mkString(",")}; align schemas first " +
        "(diff compares data, not schema evolution)")
    require(oldCols.nonEmpty, "datasetDiff: no non-id columns to compare")

    def hashed(df: DataFrame, prefix: String) = df.select(
      col(idCol) +: oldCols.map { c =>
        md5(coalesce(concat(lit("V"), col(c).cast("string")), lit("N")))
          .as(s"$prefix$c")
      }: _*)

    val o = hashed(oldDf, "__ho_").withColumn("__po", lit(1))
    val n = hashed(newDf, "__hn_").withColumn("__pn", lit(1))
    val joined = o.join(n, Seq(idCol), "full_outer")
    val anyChanged = oldCols
      .map(c => col(s"__ho_$c") =!= col(s"__hn_$c"))
      .reduce(_ || _)
    val changedCols = concat_ws(",", oldCols.map { c =>
      when(col(s"__ho_$c") =!= col(s"__hn_$c"), lit(c))
    }: _*)
    joined
      .withColumn("status",
        when(col("__po").isNull, lit("added"))
          .when(col("__pn").isNull, lit("removed"))
          .when(anyChanged, lit("changed")))
      .filter(col("status").isNotNull)
      .withColumn("changed_cols",
        when(col("status") === "changed", changedCols).otherwise(lit("")))
      .select(col(idCol), col("status"), col("changed_cols"))
  }

  /** Aggregate view of [[datasetDiff]]: (status, n) — the one-line
    * health number a snapshot pipeline alerts on. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCol: String): DataFrame =
    datasetDiff(oldDf, newDf, idCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Column-level blame: for ids present in BOTH snapshots, how many
    * rows changed in each column — the first question after a diff
    * alert fires ("which field drifted?"), answered without a second
    * corpus pass: one explode over [[datasetDiff]]'s delta-sized
    * changed_cols output. Emits one row per column that changed at
    * least once, (column, n_changed), plus `__added`/`__removed`
    * pseudo-columns carrying the membership deltas so one frame
    * tells the whole story. */
  def columnBlame(oldDf: DataFrame, newDf: DataFrame,
      idCol: String): DataFrame = {
    val d = datasetDiff(oldDf, newDf, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: a failed collect must not leak the cached diff
    val (materialized, schema) = try {
      val changed = d.filter(col("status") === "changed")
        .select(explode(split(col("changed_cols"), ",")).as("column"))
        .groupBy(col("column")).agg(count(lit(1)).as("n_changed"))
      val membership = d.filter(col("status") =!= "changed")
        .groupBy(col("status")).agg(count(lit(1)).as("n_changed"))
        .select(concat(lit("__"), col("status")).as("column"),
          col("n_changed"))
      val out = changed.unionByName(membership)
      (out.collect(), out.schema) // delta-columns-sized, tiny
    } finally d.unpersist()
    val spark = oldDf.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(materialized.toSeq, 1), schema)
  }
}
