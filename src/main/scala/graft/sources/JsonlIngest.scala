package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines ingest with schema enforcement and corrupt-record
  * quarantine — the crawl-dump landing pattern: raw JSONL arrives
  * with truncated lines, encoding damage and schema drift, and the
  * ingest must (a) never abort the job on a bad line, (b) never
  * silently DROP a bad line, and (c) keep the bad lines inspectable.
  * Spark's native JSON reader does all three in PERMISSIVE mode with
  * `columnNameOfCorruptRecord`; this wrapper pins the contract
  * (explicit schema — inference is a full extra pass AND a schema
  * drift hazard at 100 TB; corrupt column appended; quarantine
  * split) and ships the report query.
  *
  * Scale shape: one pass over the text files (the JSON parse is the
  * scan), quarantine split is a filter on the same scan, report is a
  * map-side-combined agg. No inference pass, no driver collect.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL under an ENFORCED schema; malformed lines survive as
    * rows with every data field null and the raw line in
    * `_corrupt_record`.
    *
    * `pin = true` persists the parsed frame (MEMORY_AND_DISK):
    * Spark refuses queries over a RAW json scan whose pruned schema
    * is ONLY the corrupt column ([[quarantine]], [[report]]) — the
    * engine would have to re-parse just to re-fail — and its
    * documented remedy is exactly this cache. Queries that also
    * touch a data column (the usual ingest rollup) don't need it.
    * Caller owns `unpersist()`. */
  def readQuarantined(spark: SparkSession, path: String,
      schema: StructType, pin: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    val withCorrupt =
      StructType(schema.fields :+ StructField(CorruptCol, StringType,
        nullable = true))
    val df = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
    if (pin)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
  }

  /** The admitted rows (corrupt column dropped). */
  def admitted(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine: raw offending lines, for inspection/replay. */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))

  /** Ingest report: admitted/corrupt counts in one agg over the one
    * scan. */
  def report(df: DataFrame): DataFrame =
    df.agg(
      coalesce(sum(when(col(CorruptCol).isNull, 1L).otherwise(0L)),
        lit(0L)).as("n_admitted"),
      coalesce(sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)),
        lit(0L)).as("n_corrupt"))
}
