package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delta-generation layout for the parquet SIDECARS (file-stats
  * bands, key blooms, IVF postings): a refresh APPENDS its fresh
  * rows as a new generation part instead of rewriting the whole
  * sidecar, so the per-refresh write cost is O(new files) — the r19
  * shape re-read and re-wrote the entire sidecar per call, which is
  * quadratic over a long streaming run's epochs (invisible at bench
  * scale, real at 100 TB with 100k-file stores refreshing per
  * epoch). Sound because sidecar rows are WRITE-ONCE per key (a
  * covered file/entry is never rescanned — the marker-row contract
  * of every refresher) and every reader merges by plain union
  * (`spark.read.parquet(dir)` sees all parts); rows for VANISHED
  * files are already harmless to every reader (pruning always
  * intersects the live manifest / listing), they only cost sidecar
  * bytes — which the fold bounds.
  *
  * [[compactIfNeeded]] folds the generations back into one part via
  * the same stage-and-swap the old full rewrite used, once the part
  * count passes [[MaxParts]] — amortized O(sidecar / MaxParts) per
  * refresh, and the caller's `transform` hook prunes vanished-file
  * rows during the fold so the sidecar never grows beyond
  * O(live + recent churn). */
private[sources] object SidecarDelta {

  /** Generations folded once a sidecar directory exceeds this many
    * data parts — bounds reader fan-in (and stale-row carry) while
    * keeping the steady-state refresh O(new files). */
  val MaxParts = 16

  /** Visible data parts in `dir` (committed parquet parts only —
    * `_temporary`/`_SUCCESS`/checksum files excluded). */
  def dataParts(fs: FileSystem, dir: Path): Int =
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Fold all generations into ONE part via stage-and-swap when the
    * directory has grown past [[MaxParts]]. `transform` lets the
    * caller drop rows during the fold (vanished-file pruning).
    * Returns whether a fold ran. The tmp is fully written BEFORE the
    * live directory is swapped, so a crash leaves either the old
    * generations or the folded sidecar — never a torn read. */
  def compactIfNeeded(spark: SparkSession, fs: FileSystem, dir: Path,
      transform: DataFrame => DataFrame = identity): Boolean = {
    if (dataParts(fs, dir) <= MaxParts) return false
    val folded = transform(spark.read.parquet(dir.toString))
    val tmp = new Path(dir.getParent, dir.getName + "__tmp")
    fs.delete(tmp, true)
    folded.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    require(fs.rename(tmp, dir), s"rename failed compacting $dir")
    true
  }
}
