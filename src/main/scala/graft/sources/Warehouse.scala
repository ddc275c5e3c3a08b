package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-level maintenance — the nightly-ops entry point over
  * every [[Snapshots]] store under one root (the same root a
  * [[GraftCatalog]] serves): per store, in dependency order,
  *
  *  1. [[Snapshots.recoverTxns]] — roll open intent journals
  *     forward (required before vacuum; closes any crash window);
  *  2. [[Snapshots.compactSmall]] — fold small-file debris from
  *     streaming epochs / tiny upserts into read-sized files (fewer
  *     than two small files is a no-op committing nothing);
  *  3. [[Snapshots.vacuum]] — retire history before `keepLast`
  *     versions (tag-pinned versions always survive), sweep
  *     failed-commit debris, and run the sidecar hygiene that rides
  *     it ([[Snapshots.pruneStats]], [[VectorIndex.prunePostings]]).
  *
  * Each step is the SAME public API an operator would call by hand —
  * this orchestrates, it does not add semantics — and every store's
  * outcome lands in one report row, so the whole warehouse's nightly
  * run is a frame you can store, diff and alert on. A store whose
  * maintenance throws is reported (`error` column), not fatal to the
  * sweep: one wedged store must not block the other thousand.
  *
  * Maintenance is single-writer per store (the documented
  * [[Snapshots]] contract) — run this from the one maintenance
  * pipeline, not concurrently with another maintainer. */
object Warehouse {

  /** All snapshot stores directly under `rootUrl`, sorted. */
  def stores(spark: SparkSession, rootUrl: String): Seq[String] = {
    val root = new Path(rootUrl)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, "_snap")))
      .map(_.getPath.getName).sorted
  }

  /** One maintenance sweep; returns the per-store report frame
    * (store, txns_recovered, compacted 0/1, files_vacuumed,
    * manifests_vacuumed, versions_kept, error — -1 columns on an
    * errored store).
    *
    * `parallelism` bounds DRIVER-SIDE concurrency ACROSS stores:
    * each store's heavy work (compaction rewrite, vacuum listing)
    * is already a distributed job, but a thousand-store root swept
    * one store at a time serializes a thousand rounds of manifest
    * I/O and job-submission latency — with a small pool the nightly
    * window stays flat as the warehouse grows. The single-writer-
    * per-store contract is preserved: the pool parallelizes across
    * DISTINCT stores (each store is still maintained by exactly one
    * thread), and Spark job submission is thread-safe by design.
    * The report row order stays deterministic (sorted store names)
    * regardless of completion order. */
  def maintain(spark: SparkSession, rootUrl: String,
      keepLast: Int = 3, graceMs: Long = 3600L * 1000,
      smallBytes: Long = 8L * 1024 * 1024,
      parallelism: Int = 4): DataFrame = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    require(parallelism >= 1,
      s"parallelism must be >= 1, got $parallelism")
    import spark.implicits._
    val names = stores(spark, rootUrl)
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(parallelism, math.max(1,
        names.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = names.map { name =>
      scala.concurrent.Future(maintainOne(spark, rootUrl, name,
        keepLast, graceMs, smallBytes))
    }
    val rows =
      try futures.map(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf))
      finally pool.shutdown()
    rows.toDF("store", "txns_recovered", "compacted",
      "files_vacuumed", "manifests_vacuumed", "versions_kept",
      "error")
  }

  private def maintainOne(spark: SparkSession, rootUrl: String,
      name: String, keepLast: Int, graceMs: Long, smallBytes: Long)
      : (String, Long, Long, Long, Long, Long, String) = {
    val url = new Path(rootUrl, name).toString
    try {
      val recovered = Snapshots.recoverTxns(spark, url)
      val preCompact = Snapshots.latest(spark, url)
      val compacted =
        if (Snapshots.compactSmall(spark, url, smallBytes)
          > preCompact) 1L else 0L
      val vs = Snapshots.versions(spark, url)
      val keepFrom = vs.takeRight(keepLast).head
      val (filesGone, manifestsGone) =
        Snapshots.vacuum(spark, url, keepFrom, graceMs)
      val kept = Snapshots.versions(spark, url).size
      (name, recovered.toLong, compacted, filesGone.toLong,
        manifestsGone.toLong, kept.toLong, null: String)
    } catch {
      case e: Exception =>
        (name, -1L, -1L, -1L, -1L, -1L,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}
