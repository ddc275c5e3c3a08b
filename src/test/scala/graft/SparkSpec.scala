package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * sbt forks one test JVM, so suites share it and tests stay fast). */
object SparkSpec {
  lazy val spark: SparkSession = {
    // tests run small data; 4 threads keeps startup+shuffles snappy
    val b = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.sql.extensions",
        "graft.functions.GraftExtensions")
    Tables.SessionConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  // stable identifier so suites can `import spark.implicits._`
  final lazy val spark: SparkSession = SparkSpec.spark
  /** scratch dir under target/ (never outside the repo). */
  def scratch(name: String): String = {
    val p = java.nio.file.Paths.get("target", "test-scratch", name)
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }
}
