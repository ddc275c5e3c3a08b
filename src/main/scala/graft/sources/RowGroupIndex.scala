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

  /** Bloom file index — the data-skipping index for HIGH-CARDINALITY
    * fields, where [[build]]'s exact value→files map would be
    * vocabulary-sized: ONE Bloom filter per (field, file), so the
    * sidecar is file-count-sized no matter how many distinct values
    * the field carries (a doc-id index over 100 TB is ~bytes·files,
    * not ~rows). Skipping is a SUPERSET guarantee at the filter's
    * fpp — a probed file may be a false positive but never a false
    * negative — so callers keep their row-level filter and results
    * stay exact; fpp only costs extra files scanned.
    *
    * Build shape: per-partition partial blooms per file (a task
    * folds only the rows it already reads), merged per (field, file)
    * — no per-file single-task funnel, shuffle carries bloom bytes
    * per partition. `expectedPerFile` sizes the filter (Spark's
    * BloomFilter merge requires identical geometry, so it is pinned
    * in the sidecar's build, not guessed per file). */
  def buildBloom(spark: SparkSession, datasetUrl: String,
      fields: Seq[String], indexUrl: String,
      expectedPerFile: Long = 100000L, fpp: Double = 0.01): Unit = {
    require(fields.nonEmpty, "buildBloom needs fields")
    val files = Materialize.listParquetFiles(spark, datasetUrl)
    bloomRowsFor(spark, files, fields, expectedPerFile, fpp)
      .write.mode("overwrite").parquet(indexUrl)
  }

  /** Incremental bloom refresh for append-only/merged stores — the
    * [[Materialize.updateMetadata]] move applied to the bloom
    * sidecar: only files ABSENT from the existing index are scanned
    * and bloomed, and their rows APPEND as a new generation part
    * ([[SidecarDelta]]) — O(new files) scanned AND written per call;
    * rows for files that vanished (compaction,
    * [[Materialize.mergeUpsert]] rewrites) are harmless to every
    * probe (pruning intersects the live listing) and are dropped
    * when the generation fold runs. Batch k of a landing stream
    * costs O(new files), not O(store) — the full [[buildBloom]]
    * rescan made an append-only store's cumulative index cost
    * quadratic. Geometry
    * (`expectedPerFile`, fpp) must match the original build (Spark
    * bloom merge and probe semantics are geometry-bound); `fields`
    * must equal the built fields — both enforced against the
    * sidecar's existing field set where detectable.
    *
    * A missing index falls back to a full [[buildBloom]]. */
  def updateBloom(spark: SparkSession, datasetUrl: String,
      fields: Seq[String], indexUrl: String,
      expectedPerFile: Long = 100000L, fpp: Double = 0.01): Unit = {
    val idxPath = new org.apache.hadoop.fs.Path(indexUrl)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(idxPath)) {
      buildBloom(spark, datasetUrl, fields, indexUrl, expectedPerFile,
        fpp)
      return
    }
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val existing = spark.read.parquet(indexUrl)
    val known = existing.select("field", "file").collect()
      .map(r => (r.getString(0), norm(r.getString(1)))).toSet
    val knownFields = known.map(_._1)
    require(fields.toSet == knownFields || knownFields.isEmpty,
      s"field set ${fields.sorted} != indexed ${knownFields.toSeq.sorted}" +
        " — rebuild with buildBloom")
    val current = Materialize.listParquetFiles(spark, datasetUrl)
    val currentNorm = current.map(norm).toSet
    val fresh = current.filter(f =>
      fields.exists(fl => !known.contains((fl, norm(f)))))
    // DELTA-GENERATION write ([[SidecarDelta]]): append only the
    // fresh files' rows as a new part — O(new files) per refresh,
    // never a whole-sidecar rewrite. Bloom rows are write-once per
    // (field, file) (covered files are never rescanned), readers
    // union all generations, and duplicate/vanished rows are
    // harmless to every probe (admitted sets union; pruning always
    // intersects the live listing) — the fold below bounds what
    // they can accumulate and drops both.
    if (fresh.nonEmpty)
      bloomRowsFor(spark, fresh, fields, expectedPerFile, fpp)
        .coalesce(1).write.mode("append").parquet(indexUrl)
    SidecarDelta.compactIfNeeded(spark, fs, idxPath, df =>
      df.filter(udfFileKept(currentNorm)(col("file")))
        .dropDuplicates("field", "file"))
  }

  private def udfFileKept(currentNorm: Set[String]) = {
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    org.apache.spark.sql.functions.udf(
      (f: String) => currentNorm.contains(norm(f)))
  }

  /** The shared per-file bloom build over an explicit file list
    * ([[buildBloom]]'s body, reusable for incremental refresh).
    *
    * COVERAGE CONTRACT: emits exactly ONE row per (field, file) pair
    * scanned — a pair whose column is entirely null gets an EMPTY
    * geometry-consistent bloom (admits nothing, which is correct: an
    * all-null file cannot contain any probe value). Without the
    * marker, [[updateBloom]] would re-classify such a file as fresh
    * on every refresh — rescanned each time, with duplicate rows for
    * its other fields accumulating unboundedly. File names are
    * stored path-normalized (`Path.toUri.getPath`) so the marker
    * seeding and `input_file_name()`'s URI form key identically. */
  private def bloomRowsFor(spark: SparkSession, files: Seq[String],
      fields: Seq[String], expectedPerFile: Long,
      fpp: Double): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val df = spark.read.parquet(files: _*)
      .withColumn("__file", input_file_name())
    val parts = fields.map { f =>
      df.select(col("__file"), col(f).cast("string").as("__v"))
        .filter(col("__v").isNotNull)
        .withColumn("field", lit(f))
    }
    val all = parts.reduce(_.unionByName(_))
    import spark.implicits._
    val partials = all.mapPartitions { it =>
      val blooms = scala.collection.mutable.HashMap
        .empty[(String, String), BloomFilter]
      it.foreach { r =>
        val key = (r.getString(2),
          new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath)
        val bf = blooms.getOrElseUpdate(key,
          BloomFilter.create(expectedPerFile, fpp))
        bf.putString(r.getString(1))
      }
      blooms.iterator.map { case ((fld, file), bf) =>
        (fld, file, graft.codecs.BloomBytes.toBytes(bf))
      }
    }
    // one zero-length-bytes marker per (field, file) pair seeds the
    // reduce — the sentinel is the identity of the merge, and any
    // pair that saw no values surfaces as exactly one empty bloom
    // row (materialized per-task from geometry, not shipped per-row)
    val markers = spark.createDataset(
      for { fl <- fields; f <- files }
        yield (fl, norm(f), Array.empty[Byte]))
    partials.union(markers)
      .groupByKey { case (fld, file, _) => (fld, file) }
      .reduceGroups { (a, b) =>
        if (a._3.isEmpty) b
        else if (b._3.isEmpty) a
        else {
          val x = BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(a._3))
          val y = BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(b._3))
          x.mergeInPlace(y)
          (a._1, a._2, graft.codecs.BloomBytes.toBytes(x))
        }
      }
      .map(_._2)
      .map { case (fld, file, bytes) =>
        if (bytes.nonEmpty) (fld, file, bytes)
        else (fld, file, graft.codecs.BloomBytes.toBytes(
          BloomFilter.create(expectedPerFile, fpp)))
      }
      .toDF("field", "file", "bloom")
  }

  /** Files a bloom index admits for `field IN values` — every file
    * whose filter might contain ANY of the values (union semantics,
    * mirroring [[ValueIn]]). Probing runs where the sidecar rows
    * live; only admitted file names reach the driver. */
  def bloomSelectedFiles(spark: SparkSession, datasetUrl: String,
      indexUrl: String, field: String, values: Seq[Any]): Seq[String] =
    bloomProbe(spark, datasetUrl, indexUrl, field, values)._1

  /** One sidecar scan answering BOTH upsert questions: (dataset
    * files a bloom might-contain ANY probe value, flat names of
    * every file the sidecar covers). The coverage half feeds the
    * staleness guard ([[Snapshots.upsert]] /
    * [[Materialize.mergeUpsert]]) without re-reading the sidecar —
    * on a 100k-file store the index scan + driver collect happens
    * once per merge, not twice. Probing runs where the sidecar rows
    * live; only (name, admitted) pairs reach the driver. */
  def bloomProbe(spark: SparkSession, datasetUrl: String,
      indexUrl: String, field: String, values: Seq[Any])
      : (Seq[String], Set[String]) = {
    import org.apache.spark.util.sketch.BloomFilter
    val probes = values.map(_.toString).toArray
    val idx = spark.read.parquet(indexUrl)
      .filter(col("field") === field)
    import spark.implicits._
    val rows = idx.mapPartitions { it =>
      it.map { r =>
        val bf = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        (r.getAs[String]("file"), probes.exists(bf.mightContainString))
      }
    }.collect()
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val keep = rows.collect { case (f, true) => norm(f) }.toSet
    val covered = rows
      .map(r => new org.apache.hadoop.fs.Path(r._1).getName).toSet
    (Materialize.listParquetFiles(spark, datasetUrl)
      .filter(f => keep.contains(norm(f))), covered)
  }

  /** File names (flat, no directory) the bloom sidecar covers for
    * `field` — every file with an index row, including the empty-
    * bloom markers. O(files) driver-side; the staleness guard
    * [[Snapshots.upsert]] needs: a live file ABSENT here was never
    * indexed and cannot be bloom-pruned. */
  def bloomCoveredFiles(spark: SparkSession, indexUrl: String,
      field: String): Set[String] =
    spark.read.parquet(indexUrl)
      .filter(col("field") === field)
      .select(col("file")).distinct().collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
      .toSet

  /** Read scanning only bloom-admitted files (superset at fpp —
    * callers still apply the row filter; see [[buildBloom]]). */
  def readBloomSelected(spark: SparkSession, datasetUrl: String,
      indexUrl: String, field: String, values: Seq[Any]): DataFrame = {
    val selected =
      bloomSelectedFiles(spark, datasetUrl, indexUrl, field, values)
    if (selected.isEmpty) {
      val all = Materialize.listParquetFiles(spark, datasetUrl)
      spark.read.option("basePath", datasetUrl).parquet(all: _*).limit(0)
    } else spark.read.option("basePath", datasetUrl).parquet(selected: _*)
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
