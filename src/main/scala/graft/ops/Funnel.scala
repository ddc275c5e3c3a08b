package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over event logs — conversion funnels and
  * cohort retention, the two standard product-warehouse rollups. Both
  * are beyond-reference components in the events family (sessionize
  * q38, rolling counts q91, transition graphs q130): the reference
  * stops at row-group I/O, while a training-data platform's telemetry
  * side runs exactly these to audit ingest behavior.
  *
  * Timestamps follow the repo-wide ns-Long contract
  * (`graft.Tables.tsToNanos`); gaps and buckets are µs integers, so
  * every comparison is integer arithmetic — engine-reproducible.
  */
object Funnel {

  /** Ordered conversion funnel: stage 1 anchors at a user's FIRST
    * `steps(0)` event; stage i+1 requires the first `steps(i)` event
    * STRICTLY after the previous stage's anchor and within
    * `maxGapUs` of it. Strict ordering + first-match anchoring is
    * the common product-analytics semantics (a later, closer match
    * never replaces the first qualifying one — deterministic and
    * monotone: stage counts never increase).
    *
    * Output: (stage, step, users) — stage 1..n, users = distinct
    * users that reached it.
    *
    * Scale shape: one user-keyed min-agg per stage plus one
    * user-keyed join per stage — n small (funnels are 3-6 steps).
    * Each stage's frame is user-sized, far below the event table; no
    * window over the raw events, no per-user event sort. */
  def conversionFunnel(events: DataFrame, userCol: String,
      typeCol: String, tsUsCol: Column, steps: Seq[String],
      maxGapUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapUs > 0, s"maxGapUs must be positive (got $maxGapUs)")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      tsUsCol.cast("long").as("ts"))
    // each stage's anchor frame is pinned before its count so later
    // stages extend a materialized user-sized frame, not a recomputed
    // event-table lineage
    var anchor = ev.filter(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = Seq.newBuilder[(Long, String, Long)]
    // try/finally: a failed stage count must not leak EITHER pinned
    // frame — `prev` stays visible to the finally so a count() that
    // throws after the anchor reassignment but before the handover
    // unpersist still releases both live frames
    var prev: DataFrame = null
    try {
      counts += ((1L, steps.head, anchor.count()))
      steps.zipWithIndex.drop(1).foreach { case (st, i) =>
        prev = anchor
        anchor = ev.filter(col("t") === st)
          .join(prev.select(col("u"), col("a").as("__prev")), "u")
          .filter(col("ts") > col("__prev") &&
            col("ts") - col("__prev") <= maxGapUs)
          .groupBy(col("u")).agg(min(col("ts")).as("a"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        counts += ((i + 1L, st, anchor.count()))
        prev.unpersist()
        prev = null
      }
    } finally {
      if (prev != null && (prev ne anchor)) prev.unpersist()
      anchor.unpersist()
    }
    val s = events.sparkSession
    import s.implicits._
    counts.result().toDF("stage", "step", "users")
  }

  /** Cohort retention matrix: users are cohorted by the time bucket
    * of their FIRST event; every (cohort, active-bucket) cell counts
    * the distinct cohort users active in that bucket. The standard
    * retention triangle (active_bucket >= cohort always).
    *
    * Output: (cohort, bucket, users), bucket = µs div `bucketUs`.
    *
    * Scale shape: first-event cohorts are one user-keyed min-agg;
    * the (user, bucket) activity set is one distinct over a
    * projection; the join is user-keyed and the final agg is
    * cohort×bucket-sized — all shuffles on the user id, no skew
    * beyond what the data carries. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsUsCol: Column, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    // integer floor bucket (values are non-negative by contract)
    val act = events.select(col(userCol).as("u"),
        tsUsCol.cast("long").as("__ts"))
      .select(col("u"), expr(s"__ts div ${bucketUs}L").as("bucket"))
      .distinct()
    val cohort = act.groupBy(col("u")).agg(min(col("bucket")).as("cohort"))
    act.join(cohort, "u")
      .groupBy(col("cohort"), col("bucket"))
      .agg(count_distinct(col("u")).as("users"))
  }

  /** Linear multi-touch revenue attribution, EXACT to the cent: each
    * conversion's cents split evenly across the user's touch events
    * in the preceding `windowUs`, with the remainder cents assigned
    * by Hamilton's largest-remainder rule to the MOST RECENT touches
    * (deterministic tie-break on touch id) — so the per-channel
    * attributed cents sum EXACTLY to total conversion cents, the
    * invariant float "credit fractions" always break. Conversions
    * with zero in-window touches credit the synthetic `(direct)`
    * channel in full.
    *
    * Inputs are column-generic: `convIdCol` must uniquely identify a
    * conversion row and `touchIdCol` a touch row (event ids).
    * `centsCol` is the conversion's integer cents.
    *
    * Output: (channel, n_conversions, n_touches, attributed_cents),
    * one row per touch channel that received credit (+ `(direct)`).
    *
    * Scale shape: the conversion×touch pairing is a user-keyed join
    * (shuffles on the user id); the remainder ranking partitions by
    * CONVERSION id, so the window's partition size is one user's
    * touches within one window — bounded by per-user activity, the
    * same per-key skew contract as rollingCount (a bot user with
    * millions of in-window touches is a data problem to cap
    * upstream, not a plan problem). Channel rollup output is
    * channel-sized. */
  def linearAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsUsCol: Column, idCol: String,
      centsCol: Column, convType: String, touchTypes: Seq[String],
      windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs touch types")
    require(windowUs > 0, s"windowUs must be positive (got $windowUs)")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(idCol).as("conv_id"),
        tsUsCol.cast("long").as("conv_ts"),
        centsCol.cast("long").as("cents"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__tu"), col(idCol).as("touch_id"),
        col(typeCol).as("channel"), tsUsCol.cast("long").as("touch_ts"))
    // window bounds live in the JOIN condition: a conversion whose
    // user HAS touches but none in-window must still survive as a
    // left-join miss (a post-join filter would drop it entirely)
    val paired = conv.join(touch,
        col("u") === col("__tu") &&
          col("touch_ts") <= col("conv_ts") &&
          col("touch_ts") > col("conv_ts") - windowUs,
        "left")
    val w = Window.partitionBy(col("conv_id"))
    val ord = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id"))
    val credited = paired
      .withColumn("__k", count(col("touch_id")).over(w))
      .withColumn("__rk", row_number().over(ord))
      .withColumn("channel",
        when(col("touch_id").isNull, lit("(direct)"))
          .otherwise(col("channel")))
      .withColumn("attr_cents",
        when(col("touch_id").isNull, col("cents"))
          // floored division with a floored (pmod) remainder: credits
          // sum to cents EXACTLY for any sign — truncating div plus a
          // `% __k` top-up under-distributes negative cents (refunds:
          // cents=-5, k=2 would attribute -4)
          .otherwise(expr("(cents - pmod(cents, __k)) div __k") +
            when(col("__rk") <= expr("pmod(cents, __k)"), 1L)
              .otherwise(0L)))
    credited.groupBy(col("channel"))
      .agg(count_distinct(col("conv_id")).as("n_conversions"),
        count(col("touch_id")).as("n_touches"),
        sum(col("attr_cents")).as("attributed_cents"))
  }
}
