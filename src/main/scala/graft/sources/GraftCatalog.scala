package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Pure-SQL access to [[Snapshots]] stores: a DataSourceV2
  * TableCatalog that maps every snapshot store under a warehouse
  * root to a SQL table, with Spark's own time-travel syntax wired to
  * the manifest layer —
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /data/warehouse
  *
  *   SELECT * FROM graft.events
  *   SELECT * FROM graft.events VERSION AS OF 3
  *   SELECT * FROM graft.events TIMESTAMP AS OF '2026-08-01'
  * }}}
  * Each query resolves ONE manifest and scans exactly that version's
  * immutable files under its pinned schema (snapshot isolation;
  * files older than an evolved column read it as null) — the scan
  * itself is Spark's parquet V2 path, so predicate pushdown, column
  * pruning and whole-stage codegen all apply unchanged.
  *
  * READ-ONLY by design: SQL writes would bypass the manifest layer
  * (atomic commits, CDC, constraints, stats), so every mutation
  * refuses loudly and points at the [[Snapshots]] API. Stores that
  * carry merge-on-read vectors or renamed columns need scan-time
  * translation the raw parquet path cannot express — refused loudly
  * ([[Snapshots.read]] serves them; [[Snapshots.purgeDv]] folds
  * vectors away), never silently wrong (the resurrect/stale-name
  * hazard class). */
class GraftCatalog extends TableCatalog {

  private var catName: String = _
  private var rootUrl: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(rootUrl)
    .getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    rootUrl = options.get("root")
    require(rootUrl != null && rootUrl.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.root=<warehouse dir>")
  }

  override def name(): String = catName

  private def urlOf(ident: Identifier): String = {
    require(ident.namespace.isEmpty,
      s"graft catalog tables are single-level: ${ident.namespace
        .mkString(".")}.${ident.name} — use $catName.<store>")
    new Path(rootUrl, ident.name).toString
  }

  override def listTables(ns: Array[String]): Array[Identifier] = {
    require(ns.isEmpty, "graft catalog has a single flat namespace")
    val root = new Path(rootUrl)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, "_snap")))
      .map(st => Identifier.of(Array.empty, st.getPath.getName))
      .sortBy(_.name).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty &&
      Snapshots.versions(spark, urlOf(ident)).nonEmpty

  private def tableAt(ident: Identifier, version: Int): Table = {
    val url = urlOf(ident)
    val vs = Snapshots.versions(spark, url)
    if (vs.isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(Seq(catName, ident.name))
    val v = if (version > 0) version else vs.last
    val s = Snapshots.snap(spark, url, v)
    require(s.files.forall(!_.contains(Snapshots.DvSep)),
      s"$catName.${ident.name}@v$v carries merge-on-read deletion " +
        "vectors — SQL scans raw files and would resurrect deleted " +
        "rows; read via Snapshots.read or run Snapshots.purgeDv")
    require(s.colmap.isEmpty,
      s"$catName.${ident.name}@v$v carries renamed columns — SQL " +
        "scans physical files; read via Snapshots.read")
    val root = new Path(url)
    val schema = s.schema.getOrElse {
      require(s.files.nonEmpty,
        s"$catName.${ident.name}@v$v has no schema source")
      spark.read.parquet(
        s.files.map(f => new Path(root, f).toString): _*).schema
    }
    val paths = s.files.map(f => new Path(root, f).toString)
    new GraftSqlTable(s"$catName.${ident.name}@v$v",
      ParquetTable(s"$catName.${ident.name}", spark,
        CaseInsensitiveStringMap.empty(), paths, Some(schema),
        classOf[ParquetFileFormat]),
      schema,
      Map("graft.version" -> v.toString, "graft.op" -> s.op,
        "graft.files" -> s.files.size.toString,
        "graft.url" -> url))
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, -1)

  /** `VERSION AS OF n` — the manifest layer's time travel. A
    * non-positive version refuses loudly rather than silently
    * resolving to the head (`tableAt`'s negative arg is the internal
    * latest sentinel, never a user value). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF '$version' — graft versions are integers")
    }
    require(v >= 1,
      s"VERSION AS OF $v — graft versions start at 1")
    tableAt(ident, v)
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch;
    * the manifest layer resolves in milliseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    tableAt(ident,
      Snapshots.versionAt(spark, urlOf(ident), timestamp / 1000L))

  private def readOnly(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog is read-only ($what) — mutate through the " +
        "Snapshots API (create/append/upsert/deleteWhere/...), which " +
        "owns atomic commits, CDC, constraints and stats")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME TABLE")
}

/** Read-only V2 table over one resolved snapshot version: delegates
  * the scan to Spark's parquet V2 path (pushdown/pruning/codegen for
  * free) while exposing NO write capability — `INSERT INTO` fails at
  * analysis instead of bypassing the manifest. */
private[sources] class GraftSqlTable(label: String,
    underlying: ParquetTable,
    pinned: StructType,
    props: Map[String, String]) extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = label
  override def schema(): StructType = pinned
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    underlying.newScanBuilder(options)
  /** Surfaced by `DESCRIBE TABLE EXTENDED` / `SHOW TBLPROPERTIES`:
    * the resolved version, its op, its file count, the store url. */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    props.foreach { case (k, v) => m.put(k, v) }
    m
  }
}
