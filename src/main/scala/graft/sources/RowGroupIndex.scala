package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary data-skipping index + selector algebra — the one
  * petastorm optimization Catalyst does not provide
  * (etl/rowgroup_indexing.py:37-158, rowgroup_indexers.py,
  * selectors.py:32-100).
  *
  * Spark-first shape: the index maps `field value → files containing
  * it` at *file* granularity (the reference indexes row groups — a
  * materialize with row-group-sized files makes these coincide, see
  * [[GraftRead]] doc). Build is one distributed aggregation over
  * `(value, input_file_name)`; the result is a small parquet sidecar.
  * Applying a selector shrinks the scan's file list *before* Spark
  * plans it — data skipping beyond what min/max footer stats can do
  * (e.g. membership of specific values in unordered columns).
  */
object RowGroupIndex {

  /** What to index. `arrayField`: index every element of an array
    * column (SingleFieldIndexer's array mode, rowgroup_indexers.py:
    * 58-66). `notNull`: index only presence of non-null values
    * (FieldNotNullIndexer, :78-124). */
  final case class Indexer(field: String, arrayField: Boolean = false,
      notNull: Boolean = false)

  /** Build the sidecar at `indexUrl`: rows (field, value, files).
    * For `notNull` indexers, value is the constant "__notnull__". */
  def build(spark: SparkSession, datasetUrl: String,
      indexers: Seq[Indexer], indexUrl: String): Unit = {
    val df = spark.read.parquet(
      Materialize.listParquetFiles(spark, datasetUrl): _*)
      .withColumn("__file", input_file_name())
    val parts = indexers.map { ix =>
      val projected =
        if (ix.arrayField)
          // generators can't nest in expressions: explode first
          df.select(lit(ix.field).as("field"),
              explode(col(ix.field)).as("__v"), col("__file"))
            .select(col("field"), col("__v").cast("string").as("value"),
              col("__file"))
        else {
          val value =
            if (ix.notNull) when(col(ix.field).isNotNull, lit("__notnull__"))
            else col(ix.field).cast("string")
          df.select(lit(ix.field).as("field"), value.as("value"), col("__file"))
        }
      projected.filter(col("value").isNotNull)
        .groupBy("field", "value")
        .agg(collect_set(col("__file")).as("files"))
    }
    parts.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(indexUrl)
  }

  /** Selector algebra over the index (selectors.py:32-100): resolves
    * to the set of files that may contain matching rows. */
  sealed trait Selector {
    def files(index: DataFrame): Set[String]
  }
  /** Any of `values` present in `field` (SingleIndexSelector). */
  final case class ValueIn(field: String, values: Seq[Any]) extends Selector {
    def files(index: DataFrame): Set[String] =
      index.filter(col("field") === field &&
          col("value").isin(values.map(_.toString): _*))
        .select(explode(col("files"))).distinct()
        .collect().map(_.getString(0)).toSet
  }
  /** Field has at least one non-null (FieldNotNullIndexer read). */
  final case class NotNull(field: String) extends Selector {
    def files(index: DataFrame): Set[String] =
      ValueIn(field, Seq("__notnull__")).files(index)
  }
  /** AND across selectors (IntersectIndexSelector). */
  final case class Intersect(sels: Seq[Selector]) extends Selector {
    def files(index: DataFrame): Set[String] =
      sels.map(_.files(index)).reduce(_ intersect _)
  }
  /** OR across selectors (UnionIndexSelector). */
  final case class Union(sels: Seq[Selector]) extends Selector {
    def files(index: DataFrame): Set[String] =
      sels.map(_.files(index)).reduce(_ union _)
  }

  /** The subset of the dataset's files the selector admits — the
    * data-skipping decision, exposed so callers/tests can assert the
    * scan actually shrank. */
  def selectedFiles(spark: SparkSession, datasetUrl: String,
      indexUrl: String, selector: Selector): Seq[String] = {
    val index = spark.read.parquet(indexUrl)
    // normalize: input_file_name() URIs vs Hadoop Path strings differ
    // in scheme rendering (file:/// vs file:/)
    def norm(s: String): String = new org.apache.hadoop.fs.Path(s).toUri.getPath
    val keep = selector.files(index).map(norm)
    Materialize.listParquetFiles(spark, datasetUrl)
      .filter(f => keep.contains(norm(f)))
  }

  /** Read the dataset scanning ONLY files the selector admits.
    * Returns an empty DataFrame (with the right schema) when the
    * selector admits nothing. The selected files are a superset
    * guarantee: rows matching the selector's semantics are all in
    * them — callers still apply their row-level filter. */
  def readSelected(spark: SparkSession, datasetUrl: String,
      indexUrl: String, selector: Selector): DataFrame = {
    val selected = selectedFiles(spark, datasetUrl, indexUrl, selector)
    if (selected.isEmpty) {
      val all = Materialize.listParquetFiles(spark, datasetUrl)
      spark.read.option("basePath", datasetUrl).parquet(all: _*).limit(0)
    } else spark.read.option("basePath", datasetUrl).parquet(selected: _*)
  }
}
