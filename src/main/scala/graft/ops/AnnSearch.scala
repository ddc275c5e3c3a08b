package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), LLM-pipeline style.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small) query set
  *    against the corpus — broadcast the queries, never shuffle the
  *    corpus; the baseline and the verifier for the approximate path.
  *  - [[bucketize]] + [[lshTopK]]: random-hyperplane LSH — each
  *    vector gets a `planes`-bit bucket from the sign pattern of
  *    md5-seeded hyperplane dots; candidates are same-bucket rows, so
  *    the join is a hash shuffle on the bucket key. At 100 TB this is
  *    the scale path: cost ~ corpus/2^planes per query instead of
  *    corpus.
  *
  * Determinism contract: all arithmetic is double, folded in element
  * order (left fold with 0.0 seed); hyperplane weights are
  * md5-derived (`uint32(md5("p:d")) / 2^32 − 0.5`), so any engine
  * reproduces buckets and scores bit-for-bit. Ranking ties break on
  * the candidate id after micro-unit rounding.
  */
object AnnSearch {

  /** Sequential-left-fold dot product of two equal-length arrays,
    * in doubles (exact IEEE reproducibility — see class doc).
    * Codegen'd [[graft.codecs.DotProduct]]; the interpreted HOF
    * spelling (aggregate∘zip_with) computed the same value ~10×
    * slower. Operand element types must match (float/float or
    * double/double). */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.column(graft.codecs.DotProduct(
      graft.functions.GraftFunctions.expr(a),
      graft.functions.GraftFunctions.expr(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Generic total-order compare for id values (rank tie-break). */
  private def compareId(x: Any, y: Any): Int = (x, y) match {
    case (a: Long, b: Long)     => java.lang.Long.compare(a, b)
    case (a: Int, b: Int)       => Integer.compare(a, b)
    case (a: String, b: String) => a.compareTo(b)
    case (a: java.lang.Number, b: java.lang.Number) =>
      java.lang.Double.compare(a.doubleValue(), b.doubleValue())
    case _ => throw new IllegalArgumentException(
      s"unorderable id type ${x.getClass.getName}")
  }

  /** Two-phase top-k over scored (qid, cid, cos_m) rows — the 100 TB
    * shape. Phase 1 (`mapPartitions`): bounded per-(partition, qid)
    * heaps reduce each partition to ≤ k candidates per query WITHOUT
    * any shuffle; phase 2 ranks the surviving ≤ partitions·k rows per
    * query in a window whose partitions are tiny by construction.
    * The r2 form windowed the ENTIRE scored corpus per qid — one task
    * sorting corpus-sized partitions. Order: cos_m desc, cid asc. */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    // a null embedding on either side makes cosine (hence cos_m) null;
    // drop those candidates before the heap fold — phase 1 reads
    // cos_m with getLong and would NPE on null (they could never
    // outrank a real score anyway)
    val slim = scored.select(col("qid"), col("cid"), col("cos_m"))
      .filter(col("cos_m").isNotNull)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(slim.schema)
    // PQ dequeues its max; order so the WORST candidate is the max
    val worstFirst: Ordering[(Long, Any)] = new Ordering[(Long, Any)] {
      def compare(a: (Long, Any), b: (Long, Any)): Int = {
        val c = java.lang.Long.compare(b._1, a._1) // lower cos = worse = larger
        if (c != 0) c else compareId(a._2, b._2)   // larger cid = worse
      }
    }
    val reduced = slim.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap[Any,
        scala.collection.mutable.PriorityQueue[(Long, Any, org.apache.spark.sql.Row)]]()
      val rowOrd = worstFirst.on[(Long, Any, org.apache.spark.sql.Row)](t => (t._1, t._2))
      it.foreach { r =>
        val (qid, cid, cos) = (r.get(0), r.get(1), r.getLong(2))
        val h = heaps.getOrElseUpdate(qid,
          scala.collection.mutable.PriorityQueue.empty(rowOrd))
        if (h.size < k) h.enqueue((cos, cid, r))
        else {
          val (wCos, wCid, _) = h.head
          val better = cos > wCos || (cos == wCos && compareId(cid, wCid) < 0)
          if (better) { h.dequeue(); h.enqueue((cos, cid, r)) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_m").desc, col("cid"))
    reduced.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos_m"))
  }

  /** Exact cosine top-k per query. `queries` should be small — it is
    * broadcast; the corpus is scanned once and reduced to ≤ k rows
    * per (partition, query) BEFORE the only shuffle (see
    * [[rankTopK]]). Output: (qid, rank, cid, cos_m),
    * cos_m = floor(cos·1e6). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("qid"), col(embCol).as("__qe"))
    val c = corpus.select(col(cId).as("cid"), col(embCol).as("__ce"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos_m",
        floor(cosine(col("__qe"), col("__ce")) * 1000000L).cast("long"))
    rankTopK(scored, k)
  }

  /** Hard-negative mining for contrastive/metric training: for each
    * query, the k most cosine-similar corpus vectors with a
    * DIFFERENT label — the negatives that sit closest to the
    * decision boundary and teach the most. Same scale shape as
    * [[bruteForceTopK]] (broadcast queries × corpus scan through
    * the two-phase bounded-heap rank, never a corpus×corpus
    * exchange); null-labelled corpus rows never qualify (a null
    * label is unknown, not "different"), null-labelled queries
    * take negatives from every labelled row. Output
    * `(qid, rank, cid, cos_m, neg_label)`. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("qid"), col(embCol).as("__qe"),
      col(labelCol).as("__ql"))
    val c = corpus.select(col(cId).as("cid"), col(embCol).as("__ce"),
      col(labelCol).as("__cl"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("__cl").isNotNull &&
        (col("__ql").isNull || col("__cl") =!= col("__ql")))
      .withColumn("cos_m",
        floor(cosine(col("__qe"), col("__ce")) * 1000000L).cast("long"))
    // rankTopK slims to (qid, cid, cos_m); re-attach the negative's
    // label by joining the q·k-row result back — HINTED broadcast
    // (the post-window side has no reliable size estimate, and an
    // unhinted plan sort-merge-shuffles the whole corpus on cid;
    // int8TopK/pqTopK hint the identical shape)
    broadcast(rankTopK(scored, k))
      .join(c.select(col("cid"), col("__cl").as("neg_label")), "cid")
      .select(col("qid"), col("rank"), col("cid"), col("cos_m"),
        col("neg_label"))
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic hyperplane weight w(p,d) — identical to the SQL
    * form ('0x'||substr(md5(p||':'||d),1,8))::BIGINT/2^32 - 0.5. */
  def planeWeight(p: Int, d: Int): Double =
    java.lang.Long.parseLong(md5hex(s"$p:$d").substring(0, 8), 16)
      .toDouble / 4294967296.0 - 0.5

  /** `planes`-bit LSH bucket id for an embedding column. Bit p is the
    * sign of the dot with hyperplane p. */
  def bucketOf(emb: Column, planes: Int, dim: Int): Column = {
    // 62 is the top usable bit: plane 63 would flip the sign and
    // plane >= 64 wraps (1L << 64 == 1L), silently collapsing
    // distinct sign patterns into shared bucket ids
    require(planes >= 1 && planes <= 62,
      s"planes must be in [1, 62] (got $planes)")
    val e = emb.cast("array<double>") // match the double plane weights
    (0 until planes).map { p =>
      val w = lit((0 until dim).map(d => planeWeight(p, d)).toArray)
      when(dot(e, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Plane count for a target expected bucket width: the smallest
    * `planes` with `corpusSize / 2^planes <= targetBucket`. THE
    * scale knob — a fixed default (e.g. 8 → 256 buckets) is a
    * geometry that degenerates silently as the corpus grows: every
    * bucket blows past any width cap and capped operators would
    * return nothing. Raising planes lowers recall (see [[recallAtK]]
    * to quantify on a sample). */
  def planesFor(corpusSize: Long, targetBucket: Long = 4096): Int = {
    require(targetBucket > 0)
    // pure integer: smallest p with corpus / 2^p <= target. The
    // float spelling (ceil(log2(corpus/target))) returned p+1 at
    // exact power-of-two ratios (log(2^29)/log(2) = 29.0000000004),
    // silently halving expected bucket width and LSH recall.
    val n = math.max(1L, corpusSize)
    def widthAt(p: Int): Long = (n + (1L << p) - 1) >> p // ceil div
    var p = 1
    while (p < 62 && widthAt(p) > targetBucket) p += 1
    p
  }

  /** Resolve the `planes` argument: positive = explicit; the 0
    * sentinel derives from the corpus size (one count job — the
    * price of never running a degenerate geometry unknowingly). */
  private def resolvePlanes(df: DataFrame, planes: Int): Int =
    if (planes > 0) planes else planesFor(df.count())

  /** (id, bucket) assignment for a corpus. `planes = 0` (default)
    * derives the plane count from the corpus size via [[planesFor]];
    * pass it explicitly only with a reason (e.g. a pinned cross-run
    * bucket layout). */
  def bucketize(df: DataFrame, idCol: String, embCol: String,
      planes: Int = 0, dim: Int = 64): DataFrame = {
    val p = resolvePlanes(df, planes)
    df.select(col(idCol), col(embCol).as("__e"))
      .select(col(idCol), bucketOf(col("__e"), p, dim).as("bucket"))
  }

  /** Approximate top-k: only candidates sharing the query's LSH
    * bucket are scored. Same output shape as [[bruteForceTopK]];
    * recall < 1 by design (the probe set is 1/2^planes of the
    * corpus on average). `planes = 0` derives from the corpus size
    * ([[planesFor]]). Measured with [[recallAtK]] (k=5, 20 queries):
    * on the UNIFORM 64-dim test fixture — the adversarial case,
    * where "nearest" neighbors are barely nearer than anything
    * else — recall@5 ≈ 0.33 at planes=4, 0.24 at planes=8, 0.20 at
    * planes=12; on a clustered fixture (tight 4-cluster synthetic)
    * recall ≈ 1.0 at planes=6, because genuinely-near vectors agree
    * on almost every hyperplane sign. Raise planes for scale,
    * measure the recall you pay on YOUR sample first. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, planes: Int = 0,
      dim: Int = 64): DataFrame = {
    val p = resolvePlanes(corpus, planes)
    val q = queries.select(col(qId).as("qid"), col(embCol).as("__qe"))
      .withColumn("bucket", bucketOf(col("__qe"), p, dim))
    val c = corpus.select(col(cId).as("cid"), col(embCol).as("__ce"))
      .withColumn("bucket", bucketOf(col("__ce"), p, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos_m",
        floor(cosine(col("__qe"), col("__ce")) * 1000000L).cast("long"))
    rankTopK(scored, k)
  }

  /** Deterministic IVF centroid set: the `k` corpus rows with the
    * smallest md5(id) — a uniform sample any engine reproduces
    * bit-for-bit (a k-means refinement would cluster tighter but
    * costs iterations and is not engine-reproducible; sampled
    * centroids are the standard cheap seeding and keep the oracle
    * exact). Output: (centroid_id, __cemb), `k` rows. */
  def ivfCentroids(corpus: DataFrame, cId: String, embCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    // null ids hash to null and sort FIRST ascending — an unfiltered
    // sample would preferentially pick exactly the rows the
    // assignment kernels cannot use (driver NPE); the module's
    // contract is "null rows are skipped, not crashed on"
    corpus.select(col(cId).as("centroid_id"), col(embCol).as("__cemb"))
      .filter(col("centroid_id").isNotNull && col("__cemb").isNotNull)
      .orderBy(md5(col("centroid_id").cast("string")), col("centroid_id"))
      .limit(k)
  }

  /** Centroid count for a target bucket width (the IVF analogue of
    * [[planesFor]]): `ceil(corpusSize / targetBucket)` lists. */
  def centroidsFor(corpusSize: Long, targetBucket: Long = 4096): Int = {
    require(targetBucket > 0)
    math.max(1, math.ceil(
      math.max(1L, corpusSize).toDouble / targetBucket).toInt)
  }

  /** Hard IVF assignment: each corpus row to its max-cosine centroid
    * (ties → smaller centroid id). The centroid set is SMALL by
    * contract, so it is collected once (bounded, like the LSH plane
    * weights) and baked into a codegen'd argmax expression
    * ([[graft.codecs.ArgMaxCosM]]) — assignment is a pure projection:
    * zero shuffles, zero joins, scan-speed at any corpus size. (The
    * relational spelling — broadcast cross-score + re-aggregate —
    * moves every embedding through an exchange for nothing.)
    * Centroids are sorted by id so the expression's lowest-index
    * tie-break equals the smallest-id tie-break. Output:
    * (cid, __ce, bucket). */
  def ivfAssign(corpus: DataFrame, cId: String, embCol: String,
      centroids: DataFrame): DataFrame =
    assignWithRows(corpus, cId, embCol, collectCentroids(centroids)._1)

  /** Centroid rows (id-sorted) + their schema, collected ONCE —
    * bounded by the centroids-small contract, and shared between the
    * assignment expression and the probe-side local frame so the
    * centroid selection's corpus scan runs exactly once. */
  private def collectCentroids(centroids: DataFrame)
      : (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    val sel = centroids
      .select(col("centroid_id"), col("__cemb").cast("array<double>"))
    val rows = sel.collect()
    require(rows.nonEmpty, "empty centroid set")
    (rows.sortWith((x, y) => compareId(x.get(0), y.get(0)) < 0), sel.schema)
  }

  private def assignWithRows(corpus: DataFrame, cId: String, embCol: String,
      sortedRows: Array[org.apache.spark.sql.Row]): DataFrame = {
    val mat = sortedRows.map(_.getSeq[Double](1).toArray)
    val ids = sortedRows.map(_.get(0))
    val idArray = array(ids.map(lit(_)).toSeq: _*)
    val idx = graft.functions.GraftFunctions.column(graft.codecs.ArgMaxCosM(
      graft.functions.GraftFunctions.expr(
        col("__ce").cast("array<double>")), mat))
    corpus.select(col(cId).as("cid"), col(embCol).as("__ce"))
      .withColumn("bucket", element_at(idArray, idx + 1))
  }

  /** IVF approximate top-k — the probing scale path next to
    * [[lshTopK]]: corpus rows are bucketed by nearest centroid, each
    * query probes its `nprobe` nearest centroid buckets, and only
    * those buckets are scored. Cost ≈ nprobe/centroids of the corpus
    * per query; recall rises with `nprobe` (measured on the uniform
    * 64-dim fixture, k=5, 16 centroids: 0.40 / 0.48 / 0.64 / 0.80 /
    * 1.00 at nprobe = 1 / 2 / 4 / 8 / 16, the last ≡ exhaustive —
    * above the 0.33 of same-bucket-count LSH, which cannot probe).
    * `centroids = 0`
    * derives the list count from the corpus size ([[centroidsFor]]).
    * Same output shape and determinism contract as
    * [[bruteForceTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, centroids: Int = 0,
      nprobe: Int = 4): DataFrame = {
    require(nprobe > 0)
    val nc = if (centroids > 0) centroids else centroidsFor(corpus.count())
    val (centRows, centSchema) =
      collectCentroids(ivfCentroids(corpus, cId, embCol, nc))
    val assigned = assignWithRows(corpus, cId, embCol, centRows)
    // per-query probe list: nprobe nearest centroids, scored against
    // a LOCAL frame of the already-collected rows — re-using the
    // centroid DataFrame here would re-run its full-corpus
    // TakeOrdered for the broadcast (queries are small by contract —
    // the window partitions are nc rows)
    val centLocal = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(centRows: _*), centSchema)
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("__pc").desc, col("centroid_id"))
    val probes = queries.select(col(qId).as("qid"), col(embCol).as("__qe"))
      .crossJoin(broadcast(centLocal))
      .withColumn("__pc",
        floor(cosine(col("__cemb"), col("__qe").cast("array<double>"))
          * 1000000L).cast("long"))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("qid"), col("__qe"), col("centroid_id").as("bucket"))
    val scoredC = assigned.join(broadcast(probes), Seq("bucket"))
      .withColumn("cos_m",
        floor(cosine(col("__qe"), col("__ce")) * 1000000L).cast("long"))
    rankTopK(scoredC, k)
  }

  /** Quantized two-phase exact-rescore top-k — the MEMORY scale path
    * next to the bucketing ones: the coarse scan reads int8 vectors
    * (4× less than float32 — at 100 TB the brute-force scan is
    * bandwidth-bound, so the quantized pass is ~4× cheaper I/O), ranks
    * by integer-dot cosine (pure int dot + one double divide,
    * engine-reproducible), keeps `k·rerank` candidates per query via
    * the same bounded-heap [[rankTopK]], then rescores ONLY those
    * candidates with the exact float arithmetic of [[bruteForceTopK]].
    * At scale the rescore pass fetches candidate rows through the id
    * index ([[graft.sources.RowGroupIndex]]) instead of re-scanning.
    *
    * Recall: governed by `rerank` — the true top-k survives whenever
    * it sits in the quantized top-`k·rerank`; int8 max-abs keeps
    * relative cosine error ~0.5/127 per element, so small reranks
    * already reach recall 1.0 on the 64-dim fixture (spec-asserted;
    * measure on YOUR distribution before lowering it). Zero vectors
    * score 0 (NaN→0 long cast), like [[ivfTopK]]'s convention. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, rerank: Int = 8): DataFrame = {
    require(rerank >= 1, s"rerank factor must be >= 1, got $rerank")
    import graft.functions.GraftFunctions.{dotI8, quantizeInt8}
    val c = corpus.select(col(cId).as("cid"), col(embCol).as("__ce"))
    val q = queries.select(col(qId).as("qid"), col(embCol).as("__qe"))
    val cq = c.select(col("cid"), quantizeInt8(col("__ce")).getField("q").as("__cqv"))
      .withColumn("__cn", sqrt(dotI8(col("__cqv"), col("__cqv")).cast("double")))
    val qq = q.select(col("qid"), quantizeInt8(col("__qe")).getField("q").as("__qqv"))
      .withColumn("__qn", sqrt(dotI8(col("__qqv"), col("__qqv")).cast("double")))
    val approx = cq.crossJoin(broadcast(qq))
      .withColumn("cos_m",
        floor(dotI8(col("__cqv"), col("__qqv")).cast("double") /
          (col("__cn") * col("__qn")) * 1000000L).cast("long"))
      .select(col("qid"), col("cid"), col("cos_m"))
    val cands = rankTopK(approx, k * rerank).select(col("qid"), col("cid"))
    val rescored = c.join(broadcast(cands), Seq("cid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("cos_m",
        floor(cosine(col("__qe"), col("__ce")) * 1000000L).cast("long"))
    rankTopK(rescored, k)
  }

  /** recall@k of [[int8TopK]] against [[bruteForceTopK]] — quantifies
    * the rerank knob like [[recallAtK]] does for planes. */
  /** Shared recall@k: |truth ∩ got| / |truth|, truth PINNED so the
    * brute-force scan runs once (it previously re-ran for the count
    * and the semi-join), and the empty-truth convention (1.0) lives
    * in ONE place for all four approximate paths. */
  private def recallOf(truth0: DataFrame, got: DataFrame): Double = {
    val truth = truth0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val denom = truth.count()
      if (denom == 0) 1.0
      else truth.join(got, Seq("qid", "cid"), "left_semi")
        .count().toDouble / denom
    } finally truth.unpersist()
  }

  def int8RecallAtK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, rerank: Int = 8): Double = {
    recallOf(
      bruteForceTopK(queries, corpus, qId, cId, embCol, k)
        .select(col("qid"), col("cid")),
      int8TopK(queries, corpus, qId, cId, embCol, k, rerank)
        .select(col("qid"), col("cid")))
  }

  /** recall@k of [[ivfTopK]] against [[bruteForceTopK]] — see
    * [[recallAtK]]. */
  def ivfRecallAtK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, centroids: Int = 0,
      nprobe: Int = 4): Double = {
    recallOf(
      bruteForceTopK(queries, corpus, qId, cId, embCol, k)
        .select(col("qid"), col("cid")),
      ivfTopK(queries, corpus, qId, cId, embCol, k, centroids, nprobe)
        .select(col("qid"), col("cid")))
  }

  /** recall@k of [[lshTopK]] against [[bruteForceTopK]] on the same
    * inputs — the honesty check for the approximation (parity with
    * the reference's shuffle-quality analysis utility): the fraction
    * of true top-k (query, candidate) pairs the bucketed search
    * found. Run on a sample before committing a `planes` choice at
    * scale. */
  def recallAtK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, planes: Int = 0,
      dim: Int = 64): Double = {
    recallOf(
      bruteForceTopK(queries, corpus, qId, cId, embCol, k)
        .select(col("qid"), col("cid")),
      lshTopK(queries, corpus, qId, cId, embCol, k, planes, dim)
        .select(col("qid"), col("cid")))
  }

  // ---- Product quantization (the memory-COMPRESSION scale path) ----

  /** Deterministic PQ codebooks `[m][ksub][dsub]`: the `ksub` corpus
    * rows with the smallest `(md5(id), id)` — the [[ivfCentroids]]
    * sampling, reproducible on any engine — sliced into `m`
    * contiguous sub-vectors (subspace `s` = dims `[s·dsub,
    * (s+1)·dsub)`). Sampled codebooks are the standard cheap
    * seeding; a k-means refinement per subspace would quantize
    * tighter but costs iterations and engine reproducibility (the
    * [[ivfCentroids]] trade, same reasoning). A corpus smaller than
    * `ksub` yields that many entries. Collected ONCE — bounded by
    * `ksub · dim` doubles (the centroids-small contract). */
  def pqCodebooks(corpus: DataFrame, cId: String, embCol: String,
      m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    require(m >= 1, s"pq: m must be >= 1 (got $m)")
    require(ksub >= 1 && ksub <= 256,
      s"pq: ksub must be in [1, 256] — one byte per code is the " +
        s"point of PQ (got $ksub)")
    val rows = corpus
      .select(col(cId).as("__id"), col(embCol).cast("array<double>").as("__e"))
      // null ids sort first / null embeddings NPE the slicing below —
      // sample only usable rows (the ivfCentroids doctrine)
      .filter(col("__id").isNotNull && col("__e").isNotNull)
      .orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(ksub).collect()
    require(rows.nonEmpty, "pq: empty corpus")
    val dim = rows.head.getSeq[Double](1).length
    require(dim % m == 0,
      s"pq: dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      rows.map(_.getSeq[Double](1).slice(s * dsub, (s + 1) * dsub).toArray)
    }
  }

  /** PQ-encode a corpus: `(cid, codes array<int>)` via the codegen'd
    * [[graft.codecs.PqEncode]] — a pure projection at scan speed. At
    * 100 TB this is the column you MATERIALIZE: `m` bytes per vector
    * versus `4·dim`, so the coarse scan of [[pqTopK]] reads
    * `m/(4·dim)` of the corpus bytes (64-dim float32 at m=8 →
    * 1/32 of the I/O). */
  def pqEncode(corpus: DataFrame, cId: String, embCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    corpus.select(col(cId).as("cid"),
      graft.functions.GraftFunctions.column(graft.codecs.PqEncode(
        graft.functions.GraftFunctions.expr(
          col(embCol).cast("array<double>")), codebooks)).as("codes"))

  /** PQ/ADC approximate top-k with exact rescore — the compression
    * scale path next to [[int8TopK]] (4× I/O cut, exact dims) and
    * [[ivfTopK]] (candidate pruning): the coarse scan ranks by
    * asymmetric distance — the query builds its `m·ksub` table of
    * squared sub-distances ONCE ([[graft.codecs.PqDistTable]]) and
    * each candidate costs `m` table lookups
    * ([[graft.codecs.PqAdcLookup]]) against its `m`-byte code — then
    * the top `k·rerank` candidates per query rescore with exact
    * float cosine, exactly [[int8TopK]]'s two-phase shape (bounded
    * heaps via [[rankTopK]], broadcast candidate set, id-indexed
    * fetch at scale). Coarse ranking is by NEGATED floor-micros ADC
    * distance (ascending distance = descending score) with the
    * rankTopK id tie-break.
    *
    * Recall: governed by `rerank` and codebook quality — measure
    * with [[pqRecallAtK]] on your distribution before trusting a
    * configuration (the [[int8TopK]] honesty contract); with enough
    * rerank the exact rescore makes the output ≡ brute force.
    * Output: `(qid, rank, cid, cos_m)` like every topK here. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, m: Int = 8,
      ksub: Int = 256, rerank: Int = 8): DataFrame = {
    require(rerank >= 1, s"rerank factor must be >= 1, got $rerank")
    val cb = pqCodebooks(corpus, cId, embCol, m, ksub)
    val ksubEff = cb.head.length
    val c = corpus.select(col(cId).as("cid"), col(embCol).as("__ce"))
    val q = queries.select(col(qId).as("qid"), col(embCol).as("__qe"))
    val enc = pqEncode(corpus, cId, embCol, cb)
    val qt = q.select(col("qid"),
      graft.functions.GraftFunctions.column(graft.codecs.PqDistTable(
        graft.functions.GraftFunctions.expr(
          col("__qe").cast("array<double>")), cb)).as("__tbl"))
    val approx = enc.crossJoin(broadcast(qt))
      .withColumn("cos_m",
        -floor(graft.functions.GraftFunctions.column(
          graft.codecs.PqAdcLookup(
            graft.functions.GraftFunctions.expr(col("codes")),
            graft.functions.GraftFunctions.expr(col("__tbl")),
            ksubEff)) * 1000000L).cast("long"))
      .select(col("qid"), col("cid"), col("cos_m"))
    val cands = rankTopK(approx, k * rerank).select(col("qid"), col("cid"))
    val rescored = c.join(broadcast(cands), Seq("cid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("cos_m",
        floor(cosine(col("__qe"), col("__ce")) * 1000000L).cast("long"))
    rankTopK(rescored, k)
  }

  /** recall@k of [[pqTopK]] against [[bruteForceTopK]] — quantifies
    * the (m, ksub, rerank) configuration like [[int8RecallAtK]]
    * does for rerank. */
  def pqRecallAtK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, embCol: String, k: Int, m: Int = 8,
      ksub: Int = 256, rerank: Int = 8): Double = {
    recallOf(
      bruteForceTopK(queries, corpus, qId, cId, embCol, k)
        .select(col("qid"), col("cid")),
      pqTopK(queries, corpus, qId, cId, embCol, k, m, ksub, rerank)
        .select(col("qid"), col("cid")))
  }

  /** ±1 sign for JL output dim `j`, input dim `d`: parity of the
    * first hex digit of `md5("<seed>:<j>:<d>")` — even → +1. The
    * derivation is string-md5 so a SQL oracle rebuilds the exact
    * matrix (`strpos('02468ace', substr(md5(...), 1, 1))`). */
  private[ops] def jlSign(seed: String, j: Int, d: Int): Byte = {
    val h = MessageDigest.getInstance("MD5")
      .digest(s"$seed:$j:$d".getBytes("UTF-8"))
    // first hex digit = high nibble of byte 0
    if ((h(0) >> 4 & 1) == 0) 1 else -1
  }

  /** Achlioptas (2003) database-friendly Johnson–Lindenstrauss
    * projection in EXACT integer micros space: embeddings map to
    * `floor(x·1e6)` longs, then `y_j = Σ_d s_{jd}·x_d` with the ±1
    * matrix derived from md5 parity ([[jlSign]]) — deterministic,
    * seed-replayable, and hash-identical on any engine (long sums
    * commute). Distances contract per JL with distortion ε ≈
    * √(8·ln n / outDim); use it to shrink vectors BEFORE the
    * expensive ANN / near-dup exchanges, then exact-rescore the
    * survivors in full dimension (the [[int8TopK]] two-phase
    * doctrine at the dimensionality axis instead of precision).
    *
    * Scale: the sign matrix is outDim×dim bytes on the driver
    * (bounded by construction), the projection one codegen'd pass
    * per row ([[graft.codecs.SignedProject]]) — zero shuffles.
    * Returns `(idCol, proj: array<long>)`. */
  def jlProject(df: DataFrame, idCol: String, embCol: String,
      outDim: Int, dim: Int, seed: String = "jl"): DataFrame = {
    require(outDim > 0, s"output dim must be positive (got $outDim)")
    require(dim > 0, s"input dim must be positive (got $dim)")
    val signs: Array[Array[Byte]] =
      Array.tabulate(outDim, dim)((j, d) => jlSign(seed, j, d))
    df.select(col(idCol),
      graft.functions.GraftFunctions.column(graft.codecs.SignedProject(
        graft.functions.GraftFunctions.expr(
          graft.functions.GraftFunctions.floorMicros(col(embCol))),
        signs)).as("proj"))
  }

  /** k-center greedy (farthest-point) diverse selection — the
    * classic 2-approximation coreset picker for "give me k maximally
    * diverse examples" (eval-set seeding, dedup-cluster exemplars,
    * active-learning batches): start from the smallest id, then
    * repeatedly add the vector whose maximum cosine to the selected
    * set is SMALLEST (= farthest point under cosine distance).
    *
    * Determinism: similarity is the floor-micro cosine (`cos_m`,
    * the q23 convention) and every argmin tie breaks on id, so the
    * selection sequence is engine-reproducible. Each round is one
    * corpus scan against the BROADCAST k-row selected set (the
    * selected embeddings are model-sized driver state by
    * construction — k vectors), a `min` agg per id, and a
    * TakeOrdered(1) — never a corpus×corpus exchange; k rounds
    * total. Output: (rank 1..k, idCol, max_cos_m — similarity to
    * the previously selected set at pick time, null for the seed).
    */
  def kCenterGreedy(df: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = df.sparkSession
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // cast up front so array<double> corpora work like the sibling
    // APIs (kernels require matching element types)
    val base = df.filter(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(embCol).cast("array<float>").as("__e"))
    val seedRow = base.orderBy(col("__id")).limit(1).collect()
    require(seedRow.nonEmpty, "kCenterGreedy on an empty corpus")
    // driver-side selected state: k (id, embedding) pairs — bounded
    // by k·dim, the algorithm's own model size
    val picked = scala.collection.mutable.ArrayBuffer[
      (Any, Seq[Float], Option[Long])]()
    picked += ((seedRow(0).get(0), seedRow(0).getSeq[Float](1), None))
    def cosTo(emb: Seq[Float]): Column =
      floor(cosine(col("__e"), typedLit(emb)) * 1000000L).cast("long")
    // classic incremental farthest-point: per-point RUNNING
    // max-similarity state, each round scored against ONLY the
    // newest pick (greatest fold) — O(k·n) vector ops; the former
    // re-score-the-whole-selected-set spelling paid O(k²·n) and a
    // per-round broadcast that grew with k. Rounds self-reference,
    // so each is pinned ([[ColumnBridge.pinned]]).
    var (state, stateRdd) = ColumnBridge.pinned(
      base.filter(col("__id") =!= lit(seedRow(0).get(0)))
        .select(col("__id"), col("__e"),
          cosTo(picked(0)._2).as("__mx")))
    try {
      while (picked.size < k) {
        val next = state.orderBy(col("__mx"), col("__id"))
          .limit(1).collect()
        if (next.isEmpty)
          return result(spark, picked.toSeq, idCol,
            base.schema(0).dataType)
        val (id, mx) = (next(0).get(0), next(0).getLong(2))
        val emb = next(0).getSeq[Float](1)
        picked += ((id, emb, Some(mx)))
        if (picked.size < k) {
          val (ns, nr) = ColumnBridge.pinned(
            state.filter(col("__id") =!= lit(id))
              .select(col("__id"), col("__e"),
                greatest(col("__mx"), cosTo(emb)).as("__mx")))
          stateRdd.unpersist()
          state = ns; stateRdd = nr
        }
      }
      result(spark, picked.toSeq, idCol, base.schema(0).dataType)
    } finally stateRdd.unpersist()
  }

  private def result(spark: org.apache.spark.sql.SparkSession,
      picked: Seq[(Any, Seq[Float], Option[Long])], idCol: String,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val rows = picked.zipWithIndex.map { case ((id, _, mx), i) =>
      org.apache.spark.sql.Row(i + 1L, id,
        mx.map(java.lang.Long.valueOf).orNull)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField(idCol, idType),
      StructField("max_cos_m", LongType))))
  }
}
