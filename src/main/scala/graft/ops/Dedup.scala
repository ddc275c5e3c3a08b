package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Exact dedup here; near-dup (MinHash-LSH banding, SimHash, n-gram
  * Jaccard) lives in [[graft.ops.NearDedup]], with candidate
  * generation via band-bucket joins so nothing ever compares all
  * pairs.
  */
object Dedup {

  /** Exact dedup on a key expression: keep exactly one row (the one
    * with the smallest `orderCol`) per distinct key.
    *
    * Implementation is a single hash-shuffle on the key
    * (`row_number` over a window). At 100 TB this is the canonical
    * map-side-combine-free pattern; keys are md5 fingerprints so the
    * shuffle payload is small and uniformly distributed (no skew
    * salting needed).
    */
  def exact(df: DataFrame, key: Column, orderCol: Column): DataFrame = {
    // collision-checked temp column name
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(key).orderBy(orderCol)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Exact text dedup keyed on the normalized-text fingerprint. */
  def exactByText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    exact(df, TextAnalysis.fingerprint(col(textCol)), col(idCol))

  /** Group-shaped variant: distinct fingerprints with the surviving
    * (minimum) id and the duplicate count — the "dedup report". */
  def exactReport(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
