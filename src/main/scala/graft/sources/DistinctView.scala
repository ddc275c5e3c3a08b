package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental APPROX-DISTINCT view: the [[MaterializedView]]
  * log-structured pattern carrying HLL register partials instead of
  * COUNT/SUM — "distinct users per key, maintained incrementally"
  * where an exact distinct would shuffle every observation forever.
  *
  * Per batch, [[graft.ops.Sketch.hllSketch]] reduces the delta to
  * sparse (key, register, max-rho) rows — O(keys × 2^p) no matter how
  * many rows the batch carried — and lands them under
  * `__b`(hash bucket)/`__batch` via dynamic partition overwrite, so a
  * replayed batch rewrites its own partition byte-identically (the
  * at-least-once → exactly-once discipline of
  * [[MaterializedView.applyDeltaKeyed]]). The read folds registers
  * with MAX — the HLL merge law (q178) — making increments
  * ASSOCIATIVE, COMMUTATIVE and IDEMPOTENT: out-of-order batches and
  * duplicate deliveries cannot corrupt the state. MAX cannot
  * retract, so this view is append-only by construction (deletion
  * support is what [[MaterializedView]]'s retractable COUNT/SUM is
  * for).
  *
  * The read publishes the integer-exact sufficient statistics
  * (m, buckets_set, sum_rho, z_int) per key — the
  * [[graft.ops.Sketch.hllSummary]] contract; the float estimate is
  * the caller's last step ([[graft.ops.Sketch.hllEstimate]]). */
object DistinctView {

  private val MetaName = "_dv.json"

  final case class DvMeta(keys: Seq[String], value: String, p: Int,
      buckets: Int)

  private def metaPath(url: String) = new Path(new Path(url), MetaName)

  def init(spark: SparkSession, url: String, keys: Seq[String],
      valueCol: String, p: Int = 8, buckets: Int = 64): Unit = {
    require(keys.nonEmpty && buckets > 0)
    require(p >= 4 && p <= 16, s"p must be in [4, 16] (got $p)")
    require((keys :+ valueCol).forall(c => !c.contains("\"")))
    val mp = metaPath(url)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(mp), s"distinct view already exists at $url")
    fs.mkdirs(mp.getParent)
    val json = s"""{"keys":[${keys.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""value":"$valueCol","p":$p,"buckets":$buckets}"""
    val out = fs.create(mp, false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def meta(spark: SparkSession, url: String): DvMeta = {
    val mp = metaPath(url)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(mp), s"no distinct view at $url")
    val json = SidecarJson.slurp(fs, mp)
    DvMeta(SidecarJson.arr(json, "keys"),
      SidecarJson.str(json, "value"),
      SidecarJson.num(json, "p").toInt,
      SidecarJson.num(json, "buckets").toInt)
  }

  private def bucketCol(m: DvMeta): Column =
    pmod(xxhash64(m.keys.map(col): _*), lit(m.buckets)).cast("int")

  /** Land one delta batch's register partials (replay-idempotent
    * under a stable `batchKey`; see [[MaterializedView
    * .applyDeltaKeyed]] for the lineage-key discipline). */
  def applyDeltaKeyed(spark: SparkSession, url: String,
      delta: DataFrame, batchKey: String): Unit = {
    val m = meta(spark, url)
    require(batchKey.matches("[A-Za-z0-9_.-]+"),
      s"batchKey '$batchKey' must be path-safe ([A-Za-z0-9_.-]+)")
    graft.ops.Sketch.hllSketch(delta, m.keys, m.value, m.p)
      .withColumn("__b", bucketCol(m))
      .withColumn("__batch", lit(batchKey))
      .write.partitionBy("__b", "__batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(url)
  }

  /** Current per-key summary: registers folded with MAX (the merge
    * law), then the integer sufficient statistics — identical to
    * [[graft.ops.Sketch.hllSummary]] over all observed rows. */
  def read(spark: SparkSession, url: String): DataFrame = {
    val m = meta(spark, url)
    val q = 61 - m.p
    val regs = spark.read.parquet(url)
      .groupBy((m.keys :+ "hll_bucket").map(col): _*)
      .agg(max(col("hll_rho")).as("hll_rho"))
    regs.groupBy(m.keys.map(col): _*)
      .agg(count(lit(1)).as("buckets_set"),
        sum(col("hll_rho").cast("long")).as("sum_rho"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $q - hll_rho))")
          .as("z_set"))
      .withColumn("m", lit(1L << m.p))
      .withColumn("z_int",
        col("z_set") + (col("m") - col("buckets_set")) * lit(1L << q))
      .select(m.keys.map(col) ++ Seq(col("m"), col("buckets_set"),
        col("sum_rho"), col("z_int")): _*)
  }
}
