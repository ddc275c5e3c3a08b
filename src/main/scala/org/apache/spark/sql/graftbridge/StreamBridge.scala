package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportStatistics, Statistics}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Spark 4 keeps the file-source reader machinery `private[sql]`.
  * This shim (in the sql namespace, like [[ColumnBridge]]) exposes
  * the two pieces graft's NATIVE streaming source needs:
  *
  *  - [[readFunc]]: Spark's OWN parquet per-file reader
  *    (`ParquetFileFormat.buildReaderWithPartitionValues`) as a
  *    serializable `PartitionedFile => Iterator[InternalRow]` —
  *    executors decode with the same vectorized machinery the batch
  *    scan uses (batches are flattened to rows at the iterator
  *    boundary, the shape a `PartitionReader[InternalRow]` needs);
  *  - [[wrapBuilder]]: decorate a [[FileScanBuilder]] so the BUILT
  *    scan serves batch reads untouched (toBatch/statistics/
  *    pushdown all delegate to the real parquet scan) while
  *    `toMicroBatchStream` answers with a graft-provided stream —
  *    one table object, both read modes. */
object StreamBridge {

  /** Serializable per-file parquet reader for `requiredSchema`
    * (columns pruned at the decoder). No filters are pushed — the
    * streaming plan keeps every filter above the scan, so results
    * never depend on pushdown exactness. */
  def readFunc(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType, hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val inner = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), requiredSchema, Nil,
      // rows, not ColumnarBatch: the PartitionReader contract is
      // row-typed (the flatten below stays as a belt-and-braces)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"), hadoopConf)
    pf => inner(pf).asInstanceOf[Iterator[Any]].flatMap {
      // the vectorized path smuggles ColumnarBatch through the
      // InternalRow iterator (the batch scan exec unwraps it);
      // flatten to genuine rows here
      case b: ColumnarBatch =>
        import scala.jdk.CollectionConverters._
        b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }
  }

  /** A [[PartitionedFile]] covering one whole data file. */
  def wholeFile(path: String, length: Long,
      modificationTime: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      0L, length, Array.empty, modificationTime, length)

  /** Re-tag a batch-planned frame as STREAMING — the V1
    * `Source.getBatch` contract (micro-batch frames must carry
    * `isStreaming = true` or the planner refuses them). Rows are
    * copied defensively: `toRdd` may hand back operator-reused
    * UnsafeRow buffers, and the wrapping scan does not re-project. */
  def asStreaming(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema,
      isStreaming = true)
  }

  /** Decorate the parquet [[ScanBuilder]]: batch semantics delegate
    * verbatim (column pruning, catalyst filter pushdown, statistics
    * for join planning, columnar mode), `toMicroBatchStream` is
    * graft's. `mkStream` receives the PRUNED read schema. */
  def wrapBuilder(inner: ScanBuilder,
      mkStream: StructType => MicroBatchStream): ScanBuilder = {
    val in = inner.asInstanceOf[FileScanBuilder]
    new ScanBuilder with SupportsPushDownRequiredColumns
        with SupportsPushDownCatalystFilters {
      override def pruneColumns(s: StructType): Unit =
        in.pruneColumns(s)
      override def pushFilters(f: Seq[Expression]): Seq[Expression] =
        in.pushFilters(f)
      override def pushedFilters(): Array[Predicate] =
        in.pushedFilters
      override def build(): Scan = {
        val ps = in.build()
        new Scan with SupportsReportStatistics {
          override def readSchema(): StructType = ps.readSchema()
          override def toBatch: Batch = ps.toBatch
          override def description(): String = ps.description()
          override def estimateStatistics(): Statistics =
            ps.asInstanceOf[SupportsReportStatistics]
              .estimateStatistics()
          override def columnarSupportMode(): Scan.ColumnarSupportMode =
            ps.columnarSupportMode()
          override def toMicroBatchStream(
              checkpointLocation: String): MicroBatchStream =
            mkStream(ps.readSchema())
        }
      }
    }
  }
}
