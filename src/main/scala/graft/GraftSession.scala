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

  def build(appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    Tables.SessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
