package graft

import org.apache.spark.sql.SparkSession

/** One place to build a session the way every graft entrypoint and
  * test needs it: local[N] (default 32 — the driver's harness shape),
  * shuffle.partitions = N (not 200: at sf≤0.1 a 200-way shuffle is
  * all overhead; on a real cluster this would be set to ~2-3× total
  * cores), AQE on for runtime re-planning/skew handling, and the
  * session confs from [[Tables.SessionConfs]] applied at build time
  * (never mutated mid-session).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** A session scoped to `spark.sql.shuffle.partitions = n`: same
    * SparkContext and shared state, isolated SQL conf — nothing
    * planned concurrently on the parent session sees the reduced
    * width. The parent's RUNTIME SQL confs are CLONED first:
    * `newSession()` initializes from the SparkConf only, so a conf
    * fixed at runtime on the parent (e.g. [[Tables]]' defensive
    * `nanosAsLong` for externally-built sessions) would otherwise
    * silently vanish in the scope. Static/immutable entries are
    * skipped (they can't be set per-session and are inherited via
    * the SparkConf anyway). */
  def scoped(s: SparkSession, shufflePartitions: Int): SparkSession = {
    val scoped = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      // skip exactly the statics (SparkConf-inherited, per-session
      // set refuses); a blanket catch would silently drop a
      // MODIFIABLE conf whose set failed — the very bug this clones
      // against
      if (s.conf.isModifiable(k)) scoped.conf.set(k, v)
    }
    scoped.conf.set("spark.sql.shuffle.partitions",
      shufflePartitions.toString)
    scoped
  }

  def build(appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.sql.extensions",
        "graft.functions.GraftExtensions")
    Tables.SessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
