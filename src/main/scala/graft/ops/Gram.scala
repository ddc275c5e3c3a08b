package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Integer-exact Gram matrix (Xᵀ·X) over int8-quantized embeddings —
  * the reduction behind covariance estimation, whitening, and PCA
  * preprocessing of an embedding corpus.
  *
  * The float version of this reduction is NOT reproducible: summing
  * ~10⁹ float products is addition-order-dependent, so two runs with
  * different partitionings disagree in the low bits. Quantizing each
  * vector with the max-abs int8 kernel ([[graft.codecs.QuantizeInt8]],
  * the q63 oracle formula) first makes every product an integer and
  * the whole reduction exact under ANY addition order — the same
  * doctrine as the integer-cents money aggregates.
  *
  * Scale shape: one narrow scan quantizes rows in codegen, then each
  * partition folds its rows into a single d(d+1)/2 long accumulator
  * (upper triangle, row-major) inside `mapPartitions`; the shuffle
  * carries `partitions × d(d+1)/2` longs — INDEPENDENT of row count —
  * and one tiny hash agg combines them. 100 TB of embeddings moves
  * ~2080 longs per partition for d=64. Overflow headroom: each
  * product is ≤ 127² < 2¹⁴, so the long accumulator holds ~2⁴⁹ rows
  * per partition and the global sum ~2⁴⁹ rows total — beyond any
  * corpus this engine will see.
  */
object Gram {

  /** Upper-triangle Gram matrix of the quantized `embCol`. Output:
    * (i, j, g) with 1-based i ≤ j, g = Σ_rows q_i·q_j (exact). Rows
    * whose vector is null or not `dim` long are rejected (a silent
    * skip would corrupt the statistic). */
  def gramInt8(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"dim out of range: $dim")
    val nTri = dim * (dim + 1) / 2
    val q = df.select(
      GraftFunctions.quantizeInt8(col(embCol)).getField("q").as("__q"))
    val partial = q.mapPartitions { rows =>
      val acc = new Array[Long](nTri)
      var any = false
      rows.foreach { r =>
        require(!r.isNullAt(0), "gramInt8: null embedding")
        val v = r.getSeq[Byte](0)
        require(v.length == dim,
          s"gramInt8: expected dim $dim, got ${v.length}")
        any = true
        var i = 0
        var idx = 0
        while (i < dim) {
          val vi = v(i).toLong
          var j = i
          while (j < dim) {
            acc(idx) += vi * v(j)
            idx += 1
            j += 1
          }
          i += 1
        }
      }
      if (!any) Iterator.empty
      else Iterator.range(0, dim).flatMap { i =>
        val base = i * dim - i * (i - 1) / 2
        Iterator.range(i, dim).map(j => (i + 1, j + 1, acc(base + (j - i))))
      }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong))
      .toDF("i", "j", "g")
    partial.groupBy(col("i"), col("j")).agg(sum(col("g")).as("g"))
  }

  /** Per-dimension embedding moments by group — the drift /
    * distribution-shift profile for an embedding column: for every
    * (group, dimension), n, Σe and Σe² where e = ⌊v·1e6⌋ (floor has
    * no tie rule, so the float→integer step is bit-identical on any
    * engine; the multiply is forced to DOUBLE first — a FLOAT×INT
    * would be engine-dependent 32-bit arithmetic). Comparing two
    * groups' per-dim means/variances (caller-side floats from the
    * integer moments) is the standard embedding-drift alarm between
    * snapshots/sources; moments add across shards.
    *
    * Scale shape: posexplode is the d× columnar pivot (narrow d by
    * contract — the embedding dimension, not the corpus), then one
    * map-side-combined agg whose exchange carries ≤ d·groups rows
    * per task. */
  def dimMoments(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    df.filter(col(vecCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .select(col("g"), col("dim").cast("long").as("dim"),
        expr("CAST(floor(CAST(__v AS DOUBLE) * 1000000) AS BIGINT)")
          .as("__e"))
      .groupBy(col("g"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("__e")).as("sum_e6"),
        expr("CAST(sum(CAST(__e AS DECIMAL(38,0)) * __e) AS BIGINT)")
          .as("sum_sq"))
  }

  /** Embedding-column health audit, rolled up by DIMENSION CLASS —
    * the pre-flight gate before ANN / dedup / k-means runs trust a
    * vector column: per observed dimensionality (null vectors report
    * as dims = -1, empty as 0) the vector count, exact-zero vectors,
    * vectors carrying any NaN/Inf element, and the min/max squared
    * norm in floor-micros integer units. A mixed-dims table breaks
    * every dot-product kernel downstream; zero vectors poison cosine
    * (division by zero); NaNs propagate silently — this one table
    * says which, where, and how many BEFORE the expensive job.
    *
    * Scale shape: the dimMoments move — posexplode, one id-keyed
    * map-side-combined agg back to per-vector stats (exchange ≤ one
    * row per vector), then a dims-class rollup (a handful of rows).
    * NaN/Inf elements contribute 0 to the norm on BOTH engines (a
    * guard, not a semantic: their presence is reported in n_nan). */
  def embeddingAudit(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val deg = base.filter(col("v").isNull || size(col("v")) === 0)
      .select(
        when(col("v").isNull, lit(-1L)).otherwise(lit(0L)).as("dims"),
        lit(0L).as("__zero"), lit(0L).as("__nan"),
        lit(0L).as("__norm"))
    val perVec = base.filter(col("v").isNotNull && size(col("v")) > 0)
      .select(col("id"), size(col("v")).cast("long").as("dims"),
        posexplode(col("v")).as(Seq("__i", "__x")))
      .select(col("id"), col("dims"),
        expr("CAST(__x AS DOUBLE)").as("__d"))
      .withColumn("__bad",
        expr("isnan(__d) OR __d = CAST('Infinity' AS DOUBLE)" +
          " OR __d = CAST('-Infinity' AS DOUBLE)"))
      .withColumn("__e",
        when(col("__bad"), lit(0L))
          .otherwise(expr("CAST(floor(__d * 1000000) AS BIGINT)")))
      .groupBy(col("id"), col("dims"))
      .agg(
        max(col("__bad").cast("long")).as("__nan"),
        min(when(col("__bad"), 0L)
          .otherwise((col("__d") === 0.0d).cast("long"))).as("__zero"),
        expr("CAST(sum(CAST(__e AS DECIMAL(38,0)) * __e) AS BIGINT)")
          .as("__norm"))
      .select(col("dims"), col("__zero"), col("__nan"), col("__norm"))
    perVec.unionByName(deg)
      .groupBy(col("dims"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("__zero")).as("n_zero"),
        sum(col("__nan")).as("n_nan"),
        min(when(col("dims") > 0L, col("__norm"))).as("min_norm_sq"),
        max(when(col("dims") > 0L, col("__norm"))).as("max_norm_sq"))
  }
}
