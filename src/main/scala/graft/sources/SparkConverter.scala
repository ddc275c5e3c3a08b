package graft.sources

import scala.collection.mutable.ListBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark↔ML converter (X1-X3, spark/spark_dataset_converter.py):
  * normalize a DataFrame (MLlib vectors → arrays, float64 → float32),
  * materialize it to a parquet cache with a chosen row-group size,
  * and hand back a reusable handle. Materializations are cached by
  * **logical-plan equality** (`sameResult`, :494-530 — the same trick
  * verbatim in Scala): converting the same query twice reuses the
  * files instead of recomputing.
  */
object SparkConverter {

  final case class Handle(url: String, df: DataFrame, fileUrls: Seq[String],
      count: Long) {
    def delete(spark: SparkSession): Unit = {
      val p = new Path(url)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(p, true)
      SparkConverter.evict(url)
    }
  }

  private val cache = ListBuffer[(DataFrame, Handle)]()
  // handles evicted from `cache` whose files are still on disk — kept
  // so deleteAll can still find them (evicting the entry alone would
  // LEAK one full dataset copy per eviction in a long session)
  private val evictedHandles = ListBuffer[Handle]()

  /** Entries beyond this are evicted oldest-first (lookup metadata
    * only — the parquet files stay, tracked in an eviction list that
    * [[deleteAll]] drains for the reference's atexit-style cleanup,
    * spark_dataset_converter.py:82-121). */
  @volatile var MaxCacheEntries = 64

  private[sources] def evictedCount: Int =
    cache.synchronized(evictedHandles.size)

  private[sources] def evict(url: String): Unit = cache.synchronized {
    cache.filterInPlace { case (_, h) => h.url != url }
    evictedHandles.filterInPlace(_.url != url)
  }
  def cacheSize: Int = cache.synchronized(cache.size)
  def clearCache(): Unit = cache.synchronized {
    cache.clear(); evictedHandles.clear()
  }

  /** Delete every materialization's files — cached AND evicted — and
    * empty the cache. */
  def deleteAll(spark: SparkSession): Unit = {
    val handles = cache.synchronized(
      (cache.map(_._2) ++ evictedHandles).toList)
    handles.foreach(_.delete(spark))
  }

  /** X3: MLlib VectorUDT columns → array<double>. */
  def vectorsToArrays(df: DataFrame): DataFrame = {
    val vecCols = df.schema.fields.collect {
      case f if f.dataType.typeName == "vector" => f.name
    }
    vecCols.foldLeft(df)((d, c) =>
      d.withColumn(c, org.apache.spark.ml.functions.vector_to_array(col(c))))
  }

  /** X2: float64 → float32 precision conversion, including array
    * element types (:542-562). */
  def convertPrecision(df: DataFrame, toFloat32: Boolean = true): DataFrame = {
    if (!toFloat32) return df
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case DoubleType => d.withColumn(f.name, col(f.name).cast(FloatType))
        case ArrayType(DoubleType, n) =>
          d.withColumn(f.name, col(f.name).cast(ArrayType(FloatType, n)))
        case _ => d
      }
    }
  }

  /** Materialize (or reuse) the normalized DataFrame under
    * `cacheDir`. Plan-equality lookup: two calls whose *analyzed
    * plans* are equivalent share one materialization. The whole
    * find-or-materialize runs under one lock — the r2 check-then-act
    * gap let two concurrent equivalent calls both miss and
    * double-materialize (ADVICE). Materializing under the lock is the
    * deliberate trade: correctness of "exactly one materialization
    * per plan" over concurrency of distinct plans (the reference
    * serializes through the GIL the same way). */
  def convert(df: DataFrame, cacheDir: String, rowGroupSizeMb: Int = 32,
      toFloat32: Boolean = true): Handle = {
    val spark = df.sparkSession
    val normalized = convertPrecision(vectorsToArrays(df), toFloat32)
    val plan = normalized.queryExecution.analyzed
    cache.synchronized {
      cache.find { case (cachedDf, _) =>
        cachedDf.queryExecution.analyzed.sameResult(plan)
      }.map(_._2).getOrElse {
        val url = s"$cacheDir/conv_${java.util.UUID.randomUUID().toString.take(8)}"
        normalized.write
          .option("parquet.block.size", rowGroupSizeMb.toLong * 1024 * 1024)
          .mode("overwrite").parquet(url)
        val back = spark.read.parquet(url)
        val h = Handle(url, back, Materialize.listParquetFiles(spark, url),
          back.count())
        cache += normalized -> h
        if (cache.size > MaxCacheEntries) evictedHandles += cache.remove(0)._2
        h
      }
    }
  }

  /** X4 parity (spark_dataset_converter.py:610-639): poll until every
    * path exists — eventually-consistent object stores can lag a
    * completed write. Returns false on timeout (reference raises;
    * callers can). */
  def waitAvailable(spark: SparkSession, paths: Seq[String],
      timeoutMs: Long = 30000, pollMs: Long = 200): Boolean = {
    if (paths.isEmpty) return true
    val conf = spark.sessionState.newHadoopConf()
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var pending = paths.map(new Path(_))
    while (pending.nonEmpty && System.nanoTime() < deadline) {
      pending = pending.filterNot(p => p.getFileSystem(conf).exists(p))
      if (pending.nonEmpty) Thread.sleep(pollMs)
    }
    pending.isEmpty
  }

  /** X5 parity (:642-661): median parquet file size advisory. */
  def medianFileSizeBytes(spark: SparkSession, url: String): Long = {
    val p = new Path(url)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val sizes = Materialize.listParquetFiles(spark, url)
      .map(f => fs.getFileStatus(new Path(f)).getLen).sorted
    if (sizes.isEmpty) 0L else sizes(sizes.length / 2)
  }
}
