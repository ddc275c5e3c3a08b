package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify a sparse per-(key, bucket)
  * aggregate into one row per key per bucket over the key's own
  * [min, max] bucket span, filling the gaps with caller-supplied
  * values — the "resample with gap fill" every monitoring/feature
  * pipeline needs before windowed models (a rolling mean over a
  * sparse series silently skips the zeros).
  *
  * Shape at scale: one hash agg for the per-key span (map-side
  * combined), a `sequence` + `explode` to manufacture the dense
  * grid — generation is distributed, each task emits only its keys'
  * spans — and one hash join back onto the sparse rows, shuffling on
  * (key, bucket). Nothing driver-side; grid size is the sum of key
  * spans, independent of partition layout. A single key whose span
  * would dominate a task is refused up front (`maxBucketsPerKey`) —
  * at 100 TB one misparsed epoch-0 timestamp would otherwise turn a
  * minute-grain resample into a 40-million-row single-task explode.
  * (`sequence` materializes a key's span as one in-memory array
  * before exploding, so the cap also bounds task memory — spans
  * beyond it want a coarser grain, not a bigger cap.)
  */
object Resample {

  /** Densify `sparse` (one row per present (key, bucket)) to the full
    * per-key bucket grid. `fills` maps each value column to its
    * gap-fill expression; value columns not in `fills` are refused —
    * an unfilled column would silently emit nulls.
    *
    * @param sparse  per-(key, bucket) aggregate; bucket must be an
    *                integral column (epoch-bucket arithmetic is the
    *                caller's choice of grain)
    * @param keyCol  series key column name
    * @param bucketCol integral bucket column name
    * @param fills   gap-fill expression per value column
    * @param maxBucketsPerKey refuse a key spanning more buckets than
    *                this (skew/typo guard)
    */
  def gapFill(sparse: DataFrame, keyCol: String, bucketCol: String,
      fills: Map[String, Column], maxBucketsPerKey: Long = 1000000L)
      : DataFrame = {
    val valueCols = sparse.columns.filter(c => c != keyCol && c != bucketCol)
    val unfilled = valueCols.filterNot(fills.contains)
    require(unfilled.isEmpty,
      s"no gap-fill value for column(s): ${unfilled.mkString(", ")}")
    val unknown = fills.keys.filterNot(valueCols.contains)
    require(unknown.isEmpty,
      s"gap-fill for absent column(s): ${unknown.mkString(", ")}")
    val spans = sparse.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
    // assert-in-plan: the guard rides the grid generation (no extra
    // action); a violating key fails the job with this message
    val guarded = spans.withColumn("__span",
      col("__mx") - col("__mn") + lit(1L))
      .withColumn("__ok", when(col("__span") <= lit(maxBucketsPerKey),
        lit(true)).otherwise(raise_error(concat(
          lit(s"resample key spans more than $maxBucketsPerKey buckets: "),
          col(keyCol).cast("string")))))
    val grid = guarded.filter(col("__ok"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"))).as(bucketCol))
    grid.join(sparse, Seq(keyCol, bucketCol), "left")
      .select(col(keyCol) +: col(bucketCol) +: valueCols.map(c =>
        coalesce(col(c), fills(c)).as(c)): _*)
  }

  /** Trailing-window rolling count per key: for every row, how many
    * of the key's rows (itself included) fall in
    * `(ts − windowUs, ts]` — rate-limiting forensics, burst
    * detection, events-per-user-per-hour features. Event-time RANGE
    * frame over an integral microsecond column, so rows sharing a
    * timestamp are peers and count together — deterministic without
    * a tie-break, identical semantics in any SQL engine.
    *
    * Scale shape: one shuffle on the key; each key's rows sort
    * within their window partition. Per-key volume bounds the task —
    * a pathologically hot key (one user = 10% of events) is
    * [[Skew]]-territory: pre-aggregate to (key, ts) counts first or
    * salt by coarse time bucket. */
  def rollingCount(df: DataFrame, keyCol: String, tsUsCol: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window must be positive (got $windowUs)")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol))
      .rangeBetween(-(windowUs - 1), Window.currentRow)
    df.withColumn("n_trailing", count(lit(1)).over(w))
  }

  /** Recency-weighted activity score with base-2 exponential decay —
    * `score(k) = Σ_b count(k, b) div 2^((ref - b) div halfLife)`
    * where `ref` is the globally latest bucket. The libm-free decay:
    * shifts instead of exp(), so the score is integer-exact and
    * engine-reproducible, with the same ranking role as e^-λt
    * recency weighting (feature stores, trending feeds, freshness
    * priors). Ages beyond 62 half-lives contribute 0 (shift cap).
    *
    * Output: (keyCol, score, ref_bucket) — one row per key.
    *
    * Scale shape: one (key, bucket) map-side-combined count agg, a
    * broadcast one-row ref join, and a key-sized final agg. */
  def decayedCount(df: DataFrame, keyCol: String, tsUsCol: Column,
      bucketUs: Long, halfLifeBuckets: Long = 1L): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    require(halfLifeBuckets > 0,
      s"halfLifeBuckets must be positive (got $halfLifeBuckets)")
    val counts = df.select(col(keyCol).as("k"),
        tsUsCol.cast("long").as("__ts"))
      .select(col("k"), expr(s"__ts div ${bucketUs}L").as("b"))
      .groupBy(col("k"), col("b")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = counts.agg(max(col("b")).as("ref_bucket"))
    counts.crossJoin(broadcast(ref))
      .withColumn("__age",
        expr(s"(ref_bucket - b) div ${halfLifeBuckets}L"))
      .groupBy(col("k"))
      .agg(
        sum(when(col("__age") <= 62,
          expr("n div shiftleft(1L, CAST(__age AS INT))"))
          .otherwise(lit(0L))).as("score"),
        first(col("ref_bucket")).as("ref_bucket"))
      .select(col("k").as(keyCol), col("score"), col("ref_bucket"))
  }

  /** Bucket-over-bucket categorical distribution drift — the total
    * variation distance (×2, to stay integral) between consecutive
    * time buckets' category shares: `tv2_ppm(d, d+1) =
    * Σ_cat |p_d(cat) - p_{d+1}(cat)|` with shares in integer ppm.
    * The data-drift monitor an ingest pipeline alarms on (PSI needs
    * a log; total variation is the libm-free member of the family
    * with the same alerting role).
    *
    * Missing (bucket, category) cells count as share 0 — the
    * complete bucket×category grid is materialized first (bounded:
    * time range × category cardinality, never corpus-sized).
    *
    * Output: (bucket, next_bucket, tv2_ppm) for each consecutive
    * bucket pair present in the data. */
  def distributionDrift(df: DataFrame, catCol: String, tsUsCol: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    val cells = df.select(col(catCol).as("cat"),
        tsUsCol.cast("long").as("__ts"))
      .select(col("cat"), expr(s"__ts div ${bucketUs}L").as("bucket"))
      .groupBy(col("bucket"), col("cat")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = cells.select(col("bucket")).distinct()
    val cats = cells.select(col("cat")).distinct()
    val totals = cells.groupBy(col("bucket")).agg(sum(col("n")).as("tot"))
    val grid = buckets.crossJoin(cats)
      .join(cells, Seq("bucket", "cat"), "left")
      .join(totals, "bucket")
      .select(col("bucket"), col("cat"),
        expr("(coalesce(n, 0L) * 1000000L) div tot").as("ppm"))
    grid.as("a")
      .join(grid.as("b"),
        col("a.bucket") + 1 === col("b.bucket") &&
          col("a.cat") === col("b.cat"))
      .groupBy(col("a.bucket").as("bucket"),
        col("b.bucket").as("next_bucket"))
      .agg(sum(abs(col("a.ppm") - col("b.ppm"))).as("tv2_ppm"))
  }

  /** Integer CUSUM change-point detection per series (Page 1954's
    * cumulative-sum chart, the offline argmax form): bucket counts
    * per (`keyCol`, bucket), deviations from the series' integer
    * mean (`tot div buckets`), cumulative deviation in bucket order,
    * and the change point = the bucket where |cusum| peaks (ties →
    * earliest bucket). The drift/level-shift detector an ingest
    * monitor runs per source/event type — all integer, so the peak
    * location is engine-exact.
    *
    * Output: (keyCol, cp_bucket, cusum_at_cp, mean_per_bucket,
    * n_buckets) — one row per series.
    *
    * Scale shape: bucket counts are one map-side-combined agg; the
    * cumulative window partitions BY SERIES (each partition is
    * bucket-count-sized, bounded by the time range — never the
    * corpus), and the argmax is `max(struct(abs, -bucket))` — one
    * more tiny agg, no sort of the full frame. */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsUsCol: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    val counts = df.select(col(keyCol).as("k"),
        tsUsCol.cast("long").as("__ts"))
      .select(col("k"), expr(s"__ts div ${bucketUs}L").as("bucket"))
      .groupBy(col("k"), col("bucket")).agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col("k"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("nb"))
      .select(col("k"), expr("tot div nb").as("mean"), col("nb"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.join(stats, "k")
      .withColumn("__cusum", sum(col("n") - col("mean")).over(w))
      .groupBy(col("k"))
      .agg(max(struct(abs(col("__cusum")).as("a"),
        (-col("bucket")).as("nb2"), col("__cusum").as("c"))).as("m"),
        first(col("mean")).as("mean_per_bucket"),
        first(col("nb")).as("n_buckets"))
      .select(col("k").as(keyCol), (-col("m.nb2")).as("cp_bucket"),
        col("m.c").as("cusum_at_cp"), col("mean_per_bucket"),
        col("n_buckets"))
  }

  /** Periodic seasonal profile — traffic mass per phase bucket of a
    * repeating period (hour-of-day, day-of-week): the seasonal index
    * table an anomaly monitor divides by before alarming ("is 3am
    * Tuesday low, or just 3am?"), and the load model a scheduler
    * reads. `index_ppm = n·buckets·1e6 div n_group` — 1e6 = exactly
    * flat; `share_ppm` is the plain fraction.
    *
    * The phase is pure integer arithmetic on the µs timestamp
    * (`(ts div slot) mod buckets` with slot = periodUs/buckets), so
    * the table reproduces anywhere; timestamps are epoch-UTC by the
    * repo contract (a local-time profile shifts phase by the zone
    * offset — callers add it to ts first if they want wall-clock
    * phases).
    *
    * Scale shape: one map-side-combined agg to groups×buckets cells;
    * group totals re-aggregate the CELL table (never a second corpus
    * scan) and attach by a group-keyed join of the bucket-sized
    * frame. */
  def seasonalProfile(df: DataFrame, groupCols: Seq[String],
      tsUsCol: Column, periodUs: Long, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    require(periodUs > 0 && periodUs % buckets == 0,
      s"periodUs $periodUs must be a positive multiple of $buckets")
    val slot = periodUs / buckets
    val cells = df
      .select(groupCols.map(col) :+ tsUsCol.cast("long").as("__ts"): _*)
      .filter(col("__ts").isNotNull)
      .withColumn("bucket",
        expr(s"pmod(__ts div ${slot}L, ${buckets}L)"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("__tot"))
    val joined =
      if (groupCols.nonEmpty) cells.join(broadcast(totals), groupCols)
      else cells.crossJoin(broadcast(totals))
    joined
      .withColumn("share_ppm", expr("(n * 1000000) div __tot"))
      .withColumn("index_ppm",
        expr(s"(n * ${buckets}L * 1000000) div __tot"))
      .drop("__tot")
  }
}
