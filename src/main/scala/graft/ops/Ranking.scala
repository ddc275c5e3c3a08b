package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global rank assignment — the scale-safe replacement
  * for `row_number().over(Window.orderBy(...))` with no partition,
  * which moves the entire dataset to ONE task (Spark's own
  * `WindowExec: No Partition Defined` warning; the definitional
  * single-node bottleneck at 100 TB).
  *
  * Shape: range-repartition on the sort key → sort within partitions
  * → `zipWithIndex`. Partitions are range-ordered and internally
  * sorted, so partition-order position == global-order position.
  * `zipWithIndex`'s count pass and the main job share the same RDD
  * lineage, so the DAGScheduler computes the range shuffle once and
  * reuses its map outputs — the data is shuffled exactly once, every
  * stage fully parallel.
  *
  * Contract: `sortCols` must be a TOTAL order (include a unique
  * tie-break column); equal keys could otherwise land on either side
  * of a range boundary and rank assignment would not be reproducible.
  */
object Ranking {

  /** Append a 0-based `outCol: long` global position under the total
    * order `sortCols`. */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
      outCol: String): DataFrame = {
    require(sortCols.nonEmpty, "withGlobalIndex needs at least one sort column")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
