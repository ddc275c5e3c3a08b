package graft

/** Dev tool: dump each matching query's `.explain("formatted")` to
  * `<outDir>/<query>_<tag>.txt` — the plan evidence committed under
  * `plans/` for optimization rounds. Never part of the driver
  * contract. Usage:
  *   runMain graft.ExplainQ <sfDir> <outDir> <tag> <qprefix> ...
  * Note: for the imperative lifecycle queries the dumped plan is the
  * FINAL returned frame's (the store mutations inside the body have
  * already run by the time the frame exists). */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainQ <sfDir> <outDir> <tag> <qprefix> ...")
    val (sfDir, outDir, tag) = (args(0), args(1), args(2))
    val prefixes = args.drop(3).toSeq
    val spark = GraftSession.build("graft-explain")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        System.err.println(s"[explain] wrote $name ($tag)")
      }
    spark.stop()
  }
}
