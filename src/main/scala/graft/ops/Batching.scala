package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.rdd.RDD

/** Iteration-shape utilities: fixed-size batch regrouping (T5,
  * pyarrow_helpers/batching_table_queue.py:20-79), the RDD bridge
  * (S8, spark_utils.py:23-52), and a deterministic synthetic-data
  * generator (S10, generator.py:21-47).
  */
object Batching {

  /** Assign a 0-based `batch_id` grouping consecutive rows (in
    * `orderCols` order) into exact-size batches — the declarative
    * equivalent of re-chunking a row stream. The global position is
    * computed scale-out via [[Ranking.withGlobalIndex]] (range
    * shuffle + per-partition offsets), not a single-partition global
    * window. `orderCols` must be a total order (unique key). */
  def withBatchId(df: DataFrame, batchSize: Int,
      orderCols: Seq[String]): DataFrame = {
    require(batchSize > 0)
    Ranking.withGlobalIndex(df, orderCols.map(col), "__idx")
      .withColumn("batch_id", (col("__idx") / batchSize).cast("long"))
      .drop("__idx")
  }

  /** S8: decoded rows as an RDD (`dataset_as_rdd`). */
  def asRdd(df: DataFrame): RDD[Row] = df.rdd
}

/** Deterministic synthetic datapoints following a [[graft.schema.GraftSchema]]
  * (S10). Values are md5-mixed from (seed, field name, row id) so any
  * engine — including the DuckDB oracle — reproduces them exactly. */
object Generator {
  import graft.schema.{FieldSpec, GraftSchema}
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.{Column, SparkSession}

  private def mix(id: Column, field: String, seed: Long): Column =
    pmod(conv(substring(md5(concat(lit(s"$seed:$field:"), id.cast("string"))),
      1, 8), 16, 10).cast("long"), lit(1000000L))

  private def value(f: FieldSpec, id: Column, seed: Long): Column = {
    val m = mix(id, f.name, seed)
    if (f.isTensor) {
      require(f.shape.forall(_ > 0), s"generator needs fixed shape for ${f.name}")
      val n = f.shape.product
      transform(sequence(lit(0), lit(n - 1)), i =>
        pmod(m + i, lit(997L)).cast(f.dataType))
    } else f.dataType match {
      case StringType => concat(lit(s"${f.name}_"), m.cast("string"))
      case BooleanType => (m % 2) === 0
      case t: NumericType => m.cast(t)
      case t => throw new IllegalArgumentException(s"generator: unsupported $t")
    }
  }

  def generate(spark: SparkSession, schema: GraftSchema, rows: Long,
      seed: Long = 42): org.apache.spark.sql.DataFrame = {
    val base = spark.range(rows).toDF("__id")
    base.select(schema.fields.map(f =>
      value(f, org.apache.spark.sql.functions.col("__id"), seed).as(f.name)): _*)
  }
}
