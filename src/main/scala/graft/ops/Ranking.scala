package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global rank assignment — the scale-safe replacement
  * for `row_number().over(Window.orderBy(...))` with no partition,
  * which moves the entire dataset to ONE task (Spark's own
  * `WindowExec: No Partition Defined` warning; the definitional
  * single-node bottleneck at 100 TB).
  *
  * Shape: range-repartition on the sort key → sort within partitions
  * → per-partition counts (tiny job) → broadcast the cumulative
  * offsets → append `offset + local position` per partition.
  * Partitions are range-ordered and internally sorted, so partition
  * offset + local position == global position.
  *
  * Both jobs run over ONE compiled `RDD[InternalRow]`
  * ([[ColumnBridge.internalRdd]]), so the DAGScheduler computes the
  * range shuffle once and the count job's map outputs are reused by
  * the main job — the data is shuffled exactly once (asserted by a
  * shuffle-metrics test), every stage fully parallel. The index is
  * appended at the InternalRow level with a reused `JoinedRow`
  * wrapper: no external-Row deserialization, no per-row boxing of
  * the payload columns — the r3 form (`df.rdd.zipWithIndex`)
  * round-tripped every row through `GenericRow`, which cost the
  * shuffle-position queries ~3× (re-wrapping via
  * `internalCreateDataFrame`'s scan is a single UnsafeProjection).
  *
  * Contract: `sortCols` must be a TOTAL order (include a unique
  * tie-break column); equal keys could otherwise land on either side
  * of a range boundary and rank assignment would not be reproducible.
  */
object Ranking {

  /** Append a 0-based `outCol: long` global position under the total
    * order `sortCols`. */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
      outCol: String): DataFrame =
    withPrefixScan(df, sortCols, outCol)(_ => _ => 1L)

  /** Append the EXCLUSIVE global running total of `valueCol` (long or
    * int; null counts as 0) under the total order `sortCols`: each
    * row's `outCol` is the sum of `valueCol` over all strictly
    * preceding rows — the distributed prefix sum. The scale shape is
    * identical to [[withGlobalIndex]] (a 0-based index IS the prefix
    * sum of ones); the classic spelling,
    * `sum(v).over(Window.orderBy(...))`, is the same single-partition
    * scale-killer the rank replaces. */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, outCol: String): DataFrame =
    withPrefixScan(df, sortCols, outCol) { schema =>
      val ord = schema.fieldIndex(valueCol)
      schema.fields(ord).dataType match {
        case LongType =>
          r => if (r.isNullAt(ord)) 0L else r.getLong(ord)
        case org.apache.spark.sql.types.IntegerType =>
          r => if (r.isNullAt(ord)) 0L else r.getInt(ord).toLong
        case other => throw new IllegalArgumentException(
          s"withRunningTotal needs an int/long value column; " +
            s"$valueCol is $other")
      }
    }

  /** The shared scaffold: range shuffle + sort, per-partition partial
    * totals of `value` (job 1, ≤ one long per partition), broadcast
    * exclusive offsets, then append `offset + local exclusive prefix`
    * per row (job 2, same shuffle reused). */
  private def withPrefixScan(df: DataFrame, sortCols: Seq[Column],
      outCol: String)(value: StructType =>
      org.apache.spark.sql.catalyst.InternalRow => Long): DataFrame = {
    require(sortCols.nonEmpty, "prefix scan needs at least one sort column")
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ColumnBridge.internalRdd(sorted)
    val rowValue = value(sorted.schema)
    // job 1: per-partition partial totals — returns ≤ one long per
    // partition (bounded by cluster width, not data size)
    val partials = rdd
      .mapPartitionsWithIndex((pid, it) =>
        Iterator((pid, it.foldLeft(0L)((a, r) => a + rowValue(r)))),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(0L)(_ + _) // offsets(pid) = total before pid
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    // job 2: append the running value; shuffle map outputs are reused
    val scanned = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        extra.update(0, acc)
        acc += rowValue(r)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    // declare the ordering the construction guarantees — rows are
    // range-partitioned + sorted by sortCols (and, within that, by
    // the monotone scan column). A consumer sorting on a prefix of
    // these keys (e.g. batch regrouping ordered by its own sort key)
    // then skips its exchange+sort entirely instead of redoing the
    // one we paid.
    val order = ColumnBridge.resolvedSortOrder(sorted)
    ColumnBridge.internalCreateDataFrame(sorted, scanned, schema, order,
      orderTailCols = Seq(outCol), partitionPrefix = sortCols.length)
  }

  /** Append a 0-based DENSE rank over `keyCols` (equal tuples share
    * a rank, ranks have no gaps) as `outCol: long` — the scale-safe
    * `dense_rank() OVER (ORDER BY keys)` with no partition.
    *
    * Where [[withGlobalIndex]] needs a TOTAL order, this is the
    * companion for NON-unique keys: one range shuffle of the full
    * table, then the same two-job scaffold — job 1 counts each
    * partition's distinct-key runs (≤ one long per partition), job 2
    * appends `offset + local run index`. Equal keys land in one
    * partition (SQL range partitioning assigns a row by binary
    * search of its key against the sampled bounds — a deterministic
    * function of the key — so a key run never straddles a boundary),
    * which makes per-partition run counts globally composable.
    *
    * This replaces the r18-era dense-rank-by-join shape
    * (`distinct → withGlobalIndex → join back`), which shuffled the
    * full table TWICE more (the distinct and the join-back) per
    * call — the prefix-doubling rounds' dominant cost (guide §2.4:
    * remove shuffles outright). Results are identical: dense ranks
    * are defined by the key order alone. Null keys compare equal to
    * each other (dense_rank semantics).
    *
    * SKEW caveat: the FULL table range-partitions by the keys, and
    * equal keys must share a partition (the correctness invariant),
    * so the mass of any one key value is a single-partition lower
    * bound — a near-constant key degrades a pass to one task. Fine
    * for keys that refine toward distinct (the suffix-array rounds);
    * for low-cardinality keys prefer the distinct-then-rank-then-
    * join-back shape, which hash-distributes the duplicates.
    *
    * Key types: ATOMIC, non-binary columns only (enforced loudly).
    * The run detector compares key values with `equals` on a copied
    * previous key — `Array[Byte]` (reference equality) or nested
    * struct/array/map values (reused UnsafeRow buffers) would
    * silently inflate ranks instead. */
  def withDenseRank(df: DataFrame, keyCols: Seq[String],
      outCol: String): DataFrame = {
    require(keyCols.nonEmpty, "dense rank needs at least one key column")
    import org.apache.spark.sql.functions.col
    keyCols.foreach { c =>
      val dt = df.schema(c).dataType
      val unsupported = dt match {
        case org.apache.spark.sql.types.BinaryType => true
        case _: org.apache.spark.sql.types.StructType => true
        case _: org.apache.spark.sql.types.ArrayType => true
        case _: org.apache.spark.sql.types.MapType => true
        case _ => false
      }
      require(!unsupported,
        s"withDenseRank key $c is $dt — only atomic, non-binary key " +
          "columns are supported (binary/struct/array/map values " +
          "would compare by reference and inflate ranks)")
    }
    val sorted = df.repartitionByRange(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    val rdd = ColumnBridge.internalRdd(sorted)
    val schema = sorted.schema
    val ords = keyCols.map(schema.fieldIndex).toArray
    val types = ords.map(schema.fields(_).dataType)
    val n = ords.length
    // null-safe equality of the current row's key against a COPIED
    // previous key (iterator rows are reused buffers)
    def keyOf(r: org.apache.spark.sql.catalyst.InternalRow): Array[Any] = {
      val k = new Array[Any](n)
      var i = 0
      while (i < n) {
        k(i) = if (r.isNullAt(ords(i))) null else (r.get(ords(i), types(i)) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
          case v => v
        })
        i += 1
      }
      k
    }
    def sameKey(k: Array[Any],
        r: org.apache.spark.sql.catalyst.InternalRow): Boolean = {
      var i = 0
      while (i < n) {
        val rn = r.isNullAt(ords(i))
        val kv = k(i)
        if (rn != (kv == null)) return false
        if (!rn && kv != r.get(ords(i), types(i))) return false
        i += 1
      }
      true
    }
    // job 1: distinct-key run count per partition
    val runs = rdd.mapPartitionsWithIndex({ (pid, it) =>
      var count = 0L
      var prev: Array[Any] = null
      it.foreach { r =>
        if (prev == null || !sameKey(prev, r)) { count += 1; prev = keyOf(r) }
      }
      Iterator((pid, count))
    }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
    val offsets = runs.scanLeft(0L)(_ + _)
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    // job 2: offset + local run index, map outputs reused
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bc.value(pid) - 1L
      var prev: Array[Any] = null
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        if (prev == null || !sameKey(prev, r)) { rank += 1; prev = keyOf(r) }
        extra.update(0, rank)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val outSchema = StructType(schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val order = ColumnBridge.resolvedSortOrder(sorted)
    ColumnBridge.internalCreateDataFrame(sorted, ranked, outSchema, order,
      orderTailCols = Seq(outCol), partitionPrefix = keyCols.length)
  }

  /** Top-k rows per group with everything else rolled into one
    * "(other)" row — the reporting idiom every dashboard wants
    * (per-language top sources, per-day top referrers) done
    * deterministically: rank by (metric desc, key asc — a total
    * order), keep k, aggregate the tail's metric and member count.
    * Input is the PRE-AGGREGATED (group, key, metric) table by
    * contract (group×key cardinality, not the corpus), so the
    * per-group window ranks a categorical table, never raw data.
    * Output: (groupCols*, keyCol as string, metric sum, n_members)
    * — n_members > 1 only on the "(other)" rows. */
  def topKOthers(df: DataFrame, groupCols: Seq[String], keyCol: String,
      nCol: String, k: Int, otherLabel: String = "(other)"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 1, s"k must be >= 1 (got $k)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(nCol).desc, col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__k", when(col("__rk") <= k,
        col(keyCol).cast("string")).otherwise(lit(otherLabel)))
      .groupBy(groupCols.map(col) :+ col("__k").as(keyCol): _*)
      .agg(sum(col(nCol)).as(nCol), count(lit(1)).as("n_members"))
  }
}
