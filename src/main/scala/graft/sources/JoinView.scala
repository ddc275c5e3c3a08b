package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view — the join-bearing member of
  * the materialized-view family ([[MaterializedView]] covers keyed
  * aggregates; this covers `fact ⋈ dim`): a snapshot store holding
  * the inner equi-join of two base snapshot stores, kept current
  * from their CDC feeds WITHOUT re-joining the corpus.
  *
  * Maintenance is the classic recompute-affected-keys IVM, exact for
  * any mix of inserts / updates / deletes on either side:
  *
  *   affected = keys(ΔF) ∪ { fact keys whose join key ∈ keys(ΔD) }
  *   current  = fact@to ⋉ affected ⋈ dim@to
  *   upsert(current); delete(affected ∖ keys(current))
  *
  * so a fact row whose dim partner changed is re-joined against the
  * NEW dim row, a deleted dim row retracts all its fact partners
  * (inner-join semantics), and a fact update that moves a row onto a
  * missing dim key correctly drops it from the view.
  *
  * Contracts: `factKey` unique per fact version and `joinKey` unique
  * per dim version (both are the [[Snapshots.upsert]] store
  * contract; a duplicate dim key fails loudly in the view upsert's
  * own duplicate check). The join column must carry the SAME NAME on
  * both sides — rename before [[init]].
  *
  * Scale shape per refresh: the CDC feeds are manifest-diff-priced
  * (O(changed files), [[Snapshots.changes]]); the fact-side delta
  * drives a key-semi-join; the dim-side delta costs one fact scan
  * filtered by a broadcast of the changed dim keys — cluster the
  * fact store by `joinKey` ([[Snapshots.cluster]]) and file-stats
  * skipping prunes that scan to the touched key bands. The view
  * upsert rewrites only files that can hold an affected key
  * (copy-on-write — supply a `factKey` bloom sidecar to [[refresh]];
  * without one [[Snapshots.upsert]] conservatively rewrites all
  * view files). Nothing is ever O(history).
  *
  * Crash contract: refresh commits the view version FIRST, then
  * advances `_joinview.json`; a crash between the two replays the
  * same deltas onto identical content (same affected set, same
  * current rows) — an extra version, never a wrong row. */
object JoinView {

  private val MetaName = "_joinview.json"

  final case class JvMeta(factKey: String, joinKey: String,
      factV: Int, dimV: Int)

  private def metaPath(url: String) = new Path(new Path(url), MetaName)

  /** Meta advances by ATOMIC SWAP, never truncate-in-place: the JSON
    * is staged under a temp name, then moved onto the slot (POSIX
    * rename replaces atomically on `file://`; on Hadoop filesystems
    * the delete+rename window can only lose the file entirely —
    * [[meta]] then fails loudly — never expose a torn write). A
    * crash before the swap leaves the OLD meta: the next refresh
    * replays the same deltas onto identical content. */
  private def writeMeta(spark: SparkSession, url: String,
      m: JvMeta, overwrite: Boolean): Unit = {
    require(!m.factKey.contains("\"") && !m.joinKey.contains("\""))
    val p = metaPath(url)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    require(overwrite || !fs.exists(p),
      s"join view already exists at $url")
    val json = s"""{"factKey":"${m.factKey}",""" +
      s""""joinKey":"${m.joinKey}",""" +
      s""""factV":${m.factV},"dimV":${m.dimV}}"""
    val tmp = new Path(p.getParent, s"_tmp-jv-" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    if (fs.getUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      if (fs.exists(p)) fs.delete(p, false)
      require(fs.rename(tmp, p), s"meta swap failed at $p")
    }
  }

  def meta(spark: SparkSession, url: String): JvMeta = {
    val p = metaPath(url)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"no join view at $url")
    val json = SidecarJson.slurp(fs, p)
    JvMeta(SidecarJson.str(json, "factKey"),
      SidecarJson.str(json, "joinKey"),
      SidecarJson.num(json, "factV").toInt,
      SidecarJson.num(json, "dimV").toInt)
  }

  /** Materialize `fact@latest ⋈ dim@latest` (inner, on `joinKey`)
    * into a fresh snapshot store at `viewUrl` keyed by `factKey`. */
  def init(spark: SparkSession, viewUrl: String, factUrl: String,
      dimUrl: String, factKey: String, joinKey: String,
      nFiles: Int = 8): Unit = {
    val fv = Snapshots.latest(spark, factUrl)
    val dv = Snapshots.latest(spark, dimUrl)
    val fact = Snapshots.readAsOf(spark, factUrl, fv)
    val dim = Snapshots.readAsOf(spark, dimUrl, dv)
    require(fact.columns.contains(factKey) &&
      fact.columns.contains(joinKey),
      s"fact store needs $factKey and $joinKey")
    require(dim.columns.contains(joinKey),
      s"dim store needs $joinKey")
    val overlap =
      fact.columns.toSet.intersect(dim.columns.toSet) - joinKey
    require(overlap.isEmpty,
      s"fact/dim column collision beyond the join key: $overlap")
    Snapshots.create(spark, viewUrl,
      fact.join(dim, Seq(joinKey), "inner"), nFiles = nFiles)
    writeMeta(spark, viewUrl, JvMeta(factKey, joinKey, fv, dv),
      overwrite = false)
  }

  /** Current view contents (the latest committed version). */
  def read(spark: SparkSession, viewUrl: String): DataFrame =
    Snapshots.read(spark, viewUrl)

  /** Blue/green rebuild — the recovery path [[refresh]] refuses
    * (bases recreated/rolled back below the recorded versions, or a
    * dim delta past `maxKeys`): materialize a FRESH view at `newUrl`
    * from the bases' CURRENT latest under the old view's keys. The
    * swap to the new url is the caller's atomic pointer flip, so no
    * rebuild/crash window exists (the [[MaterializedView.rebuild]]
    * doctrine). The old view stays readable throughout. */
  def rebuild(spark: SparkSession, viewUrl: String, newUrl: String,
      factUrl: String, dimUrl: String, nFiles: Int = 8): Unit = {
    val m = meta(spark, viewUrl)
    init(spark, newUrl, factUrl, dimUrl, m.factKey, m.joinKey, nFiles)
  }

  /** Advance the view to the base stores' latest versions from their
    * CDC feeds. Returns the view's (possibly unchanged) version.
    *
    * `bloomIndexUrl`: a [[RowGroupIndex.buildBloom]] sidecar on the
    * view store keyed by `factKey`. Without it the view upsert
    * rewrites every view file (the [[Snapshots.upsert]] default);
    * with it, only files that can hold an affected key are rewritten
    * — the copy-on-write behavior a large view needs — and the
    * sidecar is refreshed here after each commit (an O(new files)
    * scan, [[RowGroupIndex.updateBloom]]). */
  def refresh(spark: SparkSession, viewUrl: String, factUrl: String,
      dimUrl: String, maxKeys: Int = 1000000,
      bloomIndexUrl: Option[String] = None): Int = {
    val m = meta(spark, viewUrl)
    val fv = Snapshots.latest(spark, factUrl)
    val dv = Snapshots.latest(spark, dimUrl)
    require(fv >= m.factV && dv >= m.dimV,
      s"base stores went backwards (restore?) — rebuild the view")
    if (fv == m.factV && dv == m.dimV)
      return Snapshots.latest(spark, viewUrl)
    val factNow = Snapshots.readAsOf(spark, factUrl, fv)
    val dimNow = Snapshots.readAsOf(spark, dimUrl, dv)
    val viewSchema = Snapshots.read(spark, viewUrl).schema
    val dFKeys =
      if (fv > m.factV)
        Snapshots.changes(spark, factUrl, m.factKey, m.factV, fv,
          includeOld = false).select(col(m.factKey))
      else factNow.select(col(m.factKey)).limit(0)
    // dim deltas are dimension-sized: collect the changed keys
    // (bounded-action, same maxKeys doctrine as the view upsert) so
    // the fact probe can be file-stats-pruned driver-side
    val dDKeyVals: Seq[Any] =
      if (dv > m.dimV) {
        val rows = Snapshots.changes(spark, dimUrl, m.joinKey,
          m.dimV, dv, includeOld = false)
          .select(col(m.joinKey)).distinct()
          .limit(maxKeys + 1).collect()
        require(rows.length <= maxKeys,
          s"dim delta exceeds maxKeys=$maxKeys changed keys — " +
            "rebuild the view instead of refreshing")
        rows.map(_.get(0)).toSeq
      } else Seq.empty
    val dDKeys = spark.createDataFrame(
      spark.sparkContext.parallelize(
        dDKeyVals.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        dimNow.schema(m.joinKey))))
    // dim-driven invalidation: probe the fact store with the changed
    // dim keys. With a stats sidecar and an integral join key the
    // probe opens ONLY files whose [min,max] band holds a changed
    // key ([[Snapshots.prunedFilesForKeys]] — cluster the fact store
    // by joinKey to make the bands narrow); the broadcast semi-join
    // stays as the exact residual. Falls back to the full fact scan
    // when stats are absent or the key is non-integral.
    val longKeys = dDKeyVals.collect {
      case l: Long => l
      case i: Int => i.toLong
    }
    val factProbe =
      if (dDKeyVals.isEmpty) factNow.limit(0)
      else if (longKeys.length == dDKeyVals.length) {
        val files = Snapshots.prunedFilesForKeys(spark, factUrl, fv,
          m.joinKey, longKeys)
        if (files.isEmpty) factNow.limit(0)
        else spark.read.schema(factNow.schema).parquet(files: _*)
      } else factNow
    val affectedFromDim = factProbe
      .join(broadcast(dDKeys), Seq(m.joinKey), "left_semi")
      .select(col(m.factKey))
    val affected = dFKeys.unionByName(affectedFromDim).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val current = factNow
      .join(affected, Seq(m.factKey), "left_semi")
      .join(dimNow, Seq(m.joinKey), "inner")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curAligned = current
      .select(viewSchema.fieldNames.toSeq.map(col): _*)
      .withColumn("__del", lit(false))
    val delRows = affected
      .join(current.select(col(m.factKey)), Seq(m.factKey),
        "left_anti")
      .select(viewSchema.fields.toSeq.map { f =>
        if (f.name == m.factKey) col(m.factKey)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
      .withColumn("__del", lit(true))
    val v = Snapshots.upsert(spark, viewUrl,
      curAligned.unionByName(delRows), m.factKey,
      deleteCol = Some("__del"), bloomIndexUrl = bloomIndexUrl,
      maxKeys = maxKeys)
    bloomIndexUrl.foreach(idx =>
      RowGroupIndex.updateBloom(spark, viewUrl, Seq(m.factKey), idx))
    affected.unpersist(); current.unpersist()
    writeMeta(spark, viewUrl, m.copy(factV = fv, dimV = dv),
      overwrite = true)
    v
  }
}
