package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query ...]")
    val (sfDir, outDir) = (args(0), args(1))
    // dev knob: extra args restrict to the named queries (prefix
    // match); the driver's 2-arg invocation runs everything
    val only = args.drop(2).toSeq
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // canonical per-query content signature, written alongside the
    // parquet dumps: order-independent (sum of per-row xxhash64 over
    // the name-sorted stringified row) + row count. A driver-side
    // hash-red row splits into "Spark outputs differ between driver
    // and builder" vs "DuckDB evaluated the oracle differently" by
    // comparing this file across the two environments — the r14
    // q316/q319 non-repro cost a round of guessing without it.
    val sigs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def signature(df: org.apache.spark.sql.DataFrame): String = {
      import org.apache.spark.sql.functions._
      val cols = df.columns.sorted.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000")))
      val r = df.select(xxhash64(concat_ws("\u0001", cols: _*))
          .cast("decimal(38,0)").as("h"))
        .agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
        .collect()(0)
      val s =
        if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString
      s"$s:${r.getLong(1)}"
    }
    SparkEntry.queries
      .filter { case (name, _) =>
        only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        sigs(name) = signature(spark.read.parquet(s"$outDir/$name"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/row_hashes.json"),
      sigs.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
