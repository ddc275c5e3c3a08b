package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.types.StructType

/** Offset = a committed snapshot VERSION — the manifest log IS the
  * stream's write-ahead log, so offsets are exact, replayable and
  * human-readable in the checkpoint (`{"version":7}`). */
private[sources] case class GraftVersionOffset(v: Int) extends Offset {
  override def json(): String = s"""{"version":$v}"""
}

private[sources] object GraftVersionOffset {
  private val Re = """\{"version":(\d+)\}""".r
  def parse(json: String): GraftVersionOffset = json match {
    case Re(n) => GraftVersionOffset(n.toInt)
    case other => throw new IllegalArgumentException(
      s"not a graft stream offset: $other")
  }
}

/** NATIVE streaming source over a snapshot store — what makes
  * `spark.readStream.table("graft.store")` work: each micro-batch
  * covers the versions committed since the last one, its rows are
  * the files those versions APPENDED, and executors decode them with
  * Spark's own parquet reader ([[StreamBridge.readFunc]]).
  *
  * Offsets are manifest versions (exact, replayable; a restart
  * resumes from the checkpointed version — no listing heuristics,
  * no modification-time races like a directory file stream).
  * `initialOffset` = version 0, so the first batch carries the
  * store's full current contents (the Delta convention).
  *
  * APPEND-ONLY lineage contract, checked per batch: every version in
  * the batch's range must be a create/append/txn-append commit. A
  * mutation (upsert, delete, compact, cluster, overwrite, rename)
  * inside the range REFUSES loudly — silently re-emitting rewritten
  * files would duplicate rows downstream, and silently skipping them
  * would drop data; the CDC reader ([[Snapshots.changes]]) is the
  * tool for mutating stores. Merge-on-read entries and renamed
  * stores refuse for the same reason (composite entries need the
  * DV anti-join; this source reads raw appended files).
  *
  * Scale shape: planning reads manifests only (O(versions in range)
  * driver-side JSON + one file-status round per new file); each new
  * file is one [[InputPartition]], so read parallelism equals append
  * parallelism; nothing is ever relisted. */
private[sources] class GraftMicroBatchStream(spark: SparkSession,
    url: String, label: String, dataSchema: StructType,
    requiredSchema: StructType) extends MicroBatchStream {

  private val AllowedOp = "^(create|append|txn-append)".r

  override def initialOffset(): Offset = GraftVersionOffset(0)

  override def latestOffset(): Offset =
    GraftVersionOffset(Snapshots.latest(spark, url))

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset.parse(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val e = end.asInstanceOf[GraftVersionOffset].v
    if (e <= s) return Array.empty
    val vs = Snapshots.versions(spark, url).filter(v => v > s && v <= e)
    vs.foreach { v =>
      val sn = Snapshots.snap(spark, url, v)
      require(AllowedOp.findFirstIn(sn.op).isDefined,
        s"streaming read of $label: v$v is '${sn.op}' — the stream " +
          "contract is an append-only lineage past the start " +
          "offset; use Snapshots.changes (CDC) for mutating stores")
      require(sn.colmap.isEmpty,
        s"streaming read of $label: v$v carries a column map — " +
          "renamed stores do not stream")
    }
    val base: Set[String] =
      if (s == 0) Set.empty
      else Snapshots.snap(spark, url, s).files.toSet
    val endSnap = Snapshots.snap(spark, url, e)
    val added = endSnap.files.filterNot(base)
    require(added.forall(!_.contains(Snapshots.DvSep)),
      s"streaming read of $label: merge-on-read entries in the " +
        "appended range — MoR stores do not stream")
    val root = new Path(url)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    added.sorted.map { f =>
      val st = fs.getFileStatus(new Path(root, f))
      GraftFilePartition(st.getPath.toString, st.getLen,
        st.getModificationTime): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(StreamBridge.readFunc(spark,
      dataSchema, requiredSchema,
      spark.sessionState.newHadoopConf()))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class GraftFilePartition(path: String,
    length: Long, modificationTime: Long) extends InputPartition

/** Executor-side reader: Spark's own parquet decode per file
  * (vectorized; flattened to rows at the boundary). The read
  * function is the serializable closure the batch file scan ships —
  * same codecs, same schema-evolution null fill. */
private[sources] class GraftStreamReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    val it = readFunc(StreamBridge.wholeFile(p.path, p.length,
      p.modificationTime))
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
