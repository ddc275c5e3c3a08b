package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.{RangePartitioning, UnknownPartitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** Spark 4 hides Column↔Expression conversion behind
  * `private[sql]` (the Connect refactor). This shim, living inside
  * the sql package namespace, re-exposes exactly the calls graft
  * needs: attaching custom Catalyst expressions to DataFrames, and
  * the InternalRow-level DataFrame constructor (for operators that
  * append columns per-partition without paying the external-Row
  * encoder round trip — see [[graft.ops.Ranking]]). */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Execute a RESOLVED logical plan as a DataFrame — the command-
    * side bridge for plans carried through an eager DML command
    * (e.g. MERGE's source): the frame's attribute ids are the
    * plan's own, so expressions resolved against it apply
    * directly. */
  def ofPlan(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  /** The compiled physical plan as an `RDD[InternalRow]`. Two jobs
    * run over the SAME returned RDD share its shuffle map outputs
    * (one lineage → the DAGScheduler reuses the exchange), which two
    * separate DataFrame actions do not. */
  def internalRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** The resolved sort order of a plan whose top is a (local or
    * global) Sort — e.g. `repartitionByRange(...).sortWithinPartitions
    * (...)`. Empty when the top node is not a Sort (caller then skips
    * the ordering claim — safe fallback). */
  def resolvedSortOrder(df: DataFrame): Seq[SortOrder] =
    df.queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order
      case _ => Nil
    }

  /** [[internalCreateDataFrame]] against an EXPLICIT target session
    * (the df-based overload binds to `df.sparkSession`) — used to
    * move a pinned RDD into a conf-scoped `newSession()` so a loop's
    * plans pick up the scoped shuffle width without mutating the
    * caller's session (RDDs are SparkContext-level, so they cross
    * sessions freely). */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Wrap an `RDD[InternalRow]` as a DataFrame with no conversion
    * (the resulting scan applies its own UnsafeProjection, so rows —
    * and wrappers like JoinedRow — may be reused by the producer).
    *
    * `sortOrder` declares the ordering the producer guarantees: rows
    * range-partitioned and sorted by these (resolved) orders, with
    * `orderTailCols` naming additional schema columns that extend the
    * chain ascending (e.g. a dense index column). When resolvable by
    * name against `schema`, the plan is built with the matching
    * `RangePartitioning`/`outputOrdering`, so a downstream
    * sort/merge-join/window on a prefix of the same keys is ELIDED
    * instead of re-shuffling — a `LogicalRDD` with unknown
    * partitioning forces consumers to redo work the producer already
    * did. The partitioning claim covers only the first
    * `partitionPrefix` orders (exactly the keys the range exchange
    * used); the ordering may carry the longer true tail — a
    * projection dropping a tail column truncates the ordering but
    * must not degrade the partitioning to unknown. */
  /** Persist-copy-rewrap lineage truncation — the iterative-loop pin
    * shared by Dedup.clusters, Graph.pageRankInt and
    * SuffixArray.suffixRanks: materialize as a persisted InternalRow
    * RDD (rows COPIED first — toRdd reuses UnsafeRow buffers per
    * partition) and rewrap, so a loop's plan tree stays round-sized
    * instead of growing exponentially with self-referencing rounds
    * (persist() alone keeps the logical plan). Returns the wrapped
    * frame and the RDD handle so callers can unpersist retired
    * rounds. ONE implementation — a storage-level or row-copy change
    * reaches every loop. */
  def pinned(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val rdd = internalRdd(df).map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (internalCreateDataFrame(df, rdd, df.schema), rdd)
  }

  def internalCreateDataFrame(df: DataFrame, rdd: RDD[InternalRow],
      schema: StructType, sortOrder: Seq[SortOrder] = Nil,
      orderTailCols: Seq[String] = Nil,
      partitionPrefix: Int = Int.MaxValue): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = DataTypeUtils.toAttributes(schema)
    val byName = attrs.groupBy(_.name)
    def rebind(e: Expression): Option[Expression] = {
      var ok = e.deterministic
      val out = e.transform {
        case a: AttributeReference => byName.get(a.name) match {
          case Some(Seq(na)) if na.dataType == a.dataType => na
          case _ => ok = false; a
        }
      }
      if (ok) Some(out) else None
    }
    val rebound = sortOrder.map(so =>
      rebind(so).map(_.asInstanceOf[SortOrder])) ++
      orderTailCols.map(n => byName.get(n).collect {
        case Seq(na) => SortOrder(na, Ascending)
      })
    val order = if (rebound.nonEmpty && rebound.forall(_.isDefined))
      rebound.flatten else Nil
    if (order.isEmpty) spark.internalCreateDataFrame(rdd, schema)
    else {
      val part =
        if (rdd.getNumPartitions > 0)
          RangePartitioning(order.take(partitionPrefix max 1),
            rdd.getNumPartitions)
        else UnknownPartitioning(rdd.getNumPartitions)
      org.apache.spark.sql.classic.Dataset.ofRows(spark,
        LogicalRDD(attrs, rdd, part, order, isStreaming = false)(spark))
    }
  }
}
