package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish tables (TESTDATA.md).
  *
  * One parquet file per table; at 100 TB each table would be a
  * directory of many files — `spark.read.parquet` handles both, and
  * every downstream operator here is written against the DataFrame,
  * never the file layout.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is INT64 TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects; read it as a raw nanosecond Long instead.
      // Downstream ops treat `ts` as ns-since-epoch (exact — no
      // truncation), deriving µs/ms views where needed.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
