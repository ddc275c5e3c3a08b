package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at scale.
  *
  * `percentile_approx` is the right tool for continuous domains, but
  * corpus curation constantly needs EXACT cut points over discrete,
  * bounded-cardinality measures — document lengths, token counts,
  * quality buckets, label ids — where "approximately the p99 length"
  * is not reproducible across engines and reruns. The scalable exact
  * form is a two-level histogram reduction:
  *
  *   1. `groupBy(group, value).count()` — one shuffle, map-side
  *      combined, output is the per-group VALUE HISTOGRAM whose size
  *      is bounded by the value domain, not the corpus (100 TB of
  *      documents with lengths < 1e6 compacts to ≤ 1e6 rows/group);
  *   2. a running sum over the compacted histogram ordered by value —
  *      per-group window when grouped (partitioned, parallel), the
  *      [[Ranking.withRunningTotal]] distributed prefix scan when
  *      ungrouped (a global `Window.orderBy` would be the
  *      single-partition scale-killer this repo bans);
  *   3. the percentile is the smallest value whose cumulative count
  *      clears the integer threshold.
  *
  * Determinism: the threshold test is pure integer arithmetic —
  * `cum * 10000 >= total * round(p*10000)` — the cume_dist ≥ p
  * definition (Postgres/DuckDB `percentile_disc`) with no float
  * boundary ambiguity for any p expressible in basis points. The
  * DuckDB oracle mirrors the same comparison.
  */
object Stats {

  /** Column name for percentile p: 0.5→p50, 0.99→p99, 0.999→p99_9. */
  def pName(p: Double): String = {
    val bp = math.round(p * 10000).toInt
    val whole = bp / 100
    val frac = bp % 100
    if (frac == 0) s"p$whole"
    else s"p${whole}_${if (frac % 10 == 0) (frac / 10).toString else f"$frac%02d"}"
  }

  /** Exact per-group percentiles of an integral `valueCol` via the
    * histogram-cumsum reduction described above. Output: one row per
    * group (one row total if `groupCols` is empty) with a `pNN`
    * LongType column per requested percentile. `ps` must sit on the
    * basis-point grid (multiples of 1e-4). */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame =
    percentilesFromHist(
      df.groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(count(lit(1)).as("__c")),
      groupCols, valueCol, ps)

  /** WEIGHTED exact percentiles — the cut below which p of the
    * total WEIGHT (not the row count) sits: "the document length
    * under which half the corpus tokens live" is the
    * token-weighted p50 of length, the number a packing/compute
    * plan actually needs (a row-count median is dominated by the
    * many small docs that carry few tokens). Same histogram-cumsum
    * reduction and cume_dist ≥ p integer rule, with the histogram
    * weighted by `sum(weightCol)`; rows with null or non-positive
    * weight are excluded (they carry no mass). */
  def exactPercentilesWeighted(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, ps: Seq[Double]): DataFrame =
    percentilesFromHist(
      df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
        .groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(sum(col(weightCol).cast("long")).as("__c")),
      groupCols, valueCol, ps)

  private def percentilesFromHist(hist: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    ps.foreach { p =>
      require(p > 0 && p <= 1, s"percentile $p outside (0, 1]")
      require(math.abs(p * 10000 - math.round(p * 10000)) < 1e-9,
        s"percentile $p is not a basis-point multiple (1e-4 grid)")
    }
    def picks = ps.map { p =>
      val bp = math.round(p * 10000)
      min(when(col("__cum") * 10000 >= col("__tot") * bp,
        col(valueCol).cast("long"))).as(pName(p))
    }
    val gcols = groupCols.map(col)
    if (groupCols.nonEmpty) {
      val running = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
      val whole = Window.partitionBy(gcols: _*)
      hist
        .withColumn("__cum", sum(col("__c")).over(running))
        .withColumn("__tot", sum(col("__c")).over(whole))
        .groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
    } else {
      // Ungrouped: distributed prefix scan over the histogram. The
      // grand total rides the SAME RDD lineage (LogicalRDD), so its
      // extra reduce reuses the scan's shuffle map outputs — the
      // corpus is scanned once, not twice.
      val scanned = Ranking
        .withRunningTotal(hist, Seq(col(valueCol)), "__c", "__pre")
        .withColumn("__cum", col("__pre") + col("__c"))
      val tot = broadcast(scanned.agg(max(col("__cum")).as("__tot")))
      scanned.crossJoin(tot).agg(picks.head, picks.tail: _*)
    }
  }

  /** Per-column data profile — the "analyze my training table" pass
    * every curation pipeline runs before touching 100 TB: one row per
    * requested column with row/null counts, a DETERMINISTIC distinct
    * estimate, and lexicographic min/max (all values profiled through
    * their canonical string form, so one schema fits every column
    * type and the DuckDB oracle reproduces it bit-for-bit).
    *
    * Scale shape: `stack` unpivots the C columns in the scan (no
    * shuffle, C output rows per input row); the count/min/max agg is
    * one map-side-combined hash agg whose exchange carries ≤ C rows
    * per task; the distinct estimate is [[Sketch.kmvEstimate]] over
    * the same unpivot — bounded per-partition heaps, so its exchange
    * is sketch-sized (≤ k·C·partitions), never vocabulary-sized.
    * An exact `count(DISTINCT)` per column would shuffle every
    * distinct value of every column; the KMV estimate is the only
    * honest profile at corpus scale, and groups with fewer than k
    * distinct values are exact by construction.
    *
    * Output: (col_name, n_rows, n_null, n_distinct_est, min_s, max_s)
    * where min_s/max_s are over non-null string forms (null for an
    * all-null column) and n_distinct_est counts non-null values. */
  def profile(df: DataFrame, cols: Seq[String], kmvK: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile of absent column(s): ${missing.mkString(", ")}")
    val stacked = df.selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ") +
        ") AS (col_name, v)")
    val stats = stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("v"))).as("n_null"),
      min(col("v")).as("min_s"),
      max(col("v")).as("max_s"))
    val dist = Sketch
      .kmvEstimate(stacked.filter(col("v").isNotNull), Seq("col_name"), "v",
        kmvK)
      .select(col("col_name"), col("est_distinct").cast("long")
        .as("n_distinct_est"))
    stats.join(dist, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct_est"), lit(0L)).as("n_distinct_est"),
        col("min_s"), col("max_s"))
  }

  /** Per-row quantile-bucket assignment — the curriculum/quality
    * binning step ("short/medium/long thirds", "quality quartiles")
    * that feeds per-bin sampling or temperature mixes. Bin k = the
    * number of [[exactPercentiles]] boundaries the row's value
    * EXCEEDS, so `ps.length + 1` bins indexed 0..len(ps), boundary
    * values inclusive on the low side — pure integer comparisons,
    * reproducible anywhere.
    *
    * Null semantics (crawl data has both): a null GROUP key is a
    * group like any other — the boundary join is null-safe, so those
    * rows bin against their own group's boundaries instead of
    * silently vanishing through SQL join semantics; a null VALUE
    * gets a null bin (it exceeds nothing and belongs nowhere — a
    * silent bin 0 would mislabel it "shortest"). Null values are
    * also EXCLUDED from the boundary computation — boundaries are
    * quantiles of the non-null values (matching `percentile_disc`'s
    * null handling), so a group's cut points don't shift low just
    * because it carries nulls; an all-null group has no boundaries
    * and its rows (all null-valued) keep their null bin via the
    * left join.
    *
    * Scale shape: boundaries are one row per group (broadcast); the
    * assignment is a broadcast join + a map-side integer sum — the
    * only corpus-sized work is [[exactPercentiles]]' own histogram
    * pass. Output: the input columns + `bin` (long, null iff the
    * value is null); exactly one output row per input row. */
  def quantileBins(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    val bounds =
      exactPercentiles(df.filter(col(valueCol).isNotNull), groupCols,
        valueCol, ps)
    val joined =
      if (groupCols.nonEmpty) {
        // eqNullSafe: a null group key must match its own bounds row;
        // left: an all-null group has no bounds row but keeps its rows
        val b = broadcast(bounds.select(
          bounds.columns.map(c =>
            if (groupCols.contains(c)) col(c).as(s"__gb_$c")
            else col(c)): _*))
        val cond = groupCols.map(c => col(c) <=> col(s"__gb_$c"))
          .reduce(_ && _)
        df.join(b, cond, "left").drop(groupCols.map(c => s"__gb_$c"): _*)
      } else df.crossJoin(broadcast(bounds))
    val bin = when(col(valueCol).isNull, lit(null))
      .otherwise(ps.map(p =>
        when(col(valueCol) > col(pName(p)), 1).otherwise(0))
        .reduce(_ + _))
    joined.withColumn("bin", bin.cast("long"))
      .drop(ps.map(pName): _*)
  }

  /** Per-source dataset report card — the rollup a data card or
    * ingest review reads: doc/char/token counts, CORPUS-WIDE
    * exact-duplicate membership attributed per source (a doc is a
    * dup if its [[TextAnalysis.fingerprint]] appears ≥ 2 times
    * anywhere, so two sources mirroring each other both show it),
    * language spread, and the dup rate in exact ppm.
    *
    * Scale: one fingerprint-keyed exchange (the q09 dedup shape)
    * to attach corpus multiplicity, then a source-keyed partial
    * aggregation — source cardinality output, never the corpus.
    * Null text fingerprints as empty (the q114 null-safety
    * lesson: a naive join key would silently drop those docs);
    * token convention is the shingle family's `[a-z0-9]+`.
    *
    * Returns `(source, n_docs, n_chars, n_tokens, n_dup_docs,
    * n_langs, dup_ppm)`. */
  /** One data-quality rule → one report row (rule, violations,
    * checked): the Deequ-style constraint check as a single
    * map-side-combined conditional agg (violation predicate
    * evaluated at scan speed; no second pass for the denominator).
    * Union rows from many rules into the audit report. */
  def dqRule(name: String, df: DataFrame, violation: Column): DataFrame =
    df.agg(
        coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
          .as("violations"),
        count(lit(1)).as("checked"))
      .select(lit(name).as("rule"), col("violations"), col("checked"))

  /** Referential-integrity rule row: child rows whose key has no
    * match in the parent's key set. One left join against the
    * DISTINCT parent keys (key-sized, broadcastable when the parent
    * is a dim; AQE decides) + one conditional agg — never two
    * passes over the child. Null child keys count as orphans (they
    * reference nothing). */
  def dqOrphans(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    child.select(childKey.as("__k"))
      .join(parent.select(parentKey.as("__k")).distinct()
        .withColumn("__hit", lit(1)), Seq("__k"), "left")
      .agg(
        coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)),
          lit(0L)).as("violations"),
        count(lit(1)).as("checked"))
      .select(lit(name).as("rule"), col("violations"), col("checked"))

  /** Empirical-CDF transform of an integer column — the rank
    * normalization a feature pipeline applies before quantile-based
    * clipping or monotone model inputs: for every DISTINCT value,
    * its multiplicity and `cdf_ppm = count(x <= v) · 1e6 div N`.
    * Joining this table back to the data maps each value to its
    * percentile in one broadcast/hash join.
    *
    * Scale shape: one map-side-combined distinct-value count agg
    * (value-cardinality-sized output), then the cumulative count
    * rides [[Ranking.withRunningTotal]]'s range-shuffle prefix
    * scan — never a single-partition `Window.orderBy` over the
    * corpus. Nulls are excluded (no rank). */
  def ecdf(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.select(col(valueCol).cast("long").as("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__tot"))
    Ranking.withRunningTotal(counts, Seq(col("value")), "n", "__lt")
      .crossJoin(broadcast(tot))
      .select(col("value"), col("n"),
        expr("((__lt + n) * 1000000L) div __tot").as("cdf_ppm"))
  }

  /** Per-GROUP empirical-CDF transform — every row's value mapped to
    * its percentile WITHIN its group (`cdf_ppm = count(v' <= v in
    * group)·1e6 div group_n`): the cross-source score normalizer
    * ("is 2k chars long FOR THIS SOURCE?") that makes thresholds
    * comparable across groups with different scales — the per-group
    * sibling of [[ecdf]] and the rank-normalization feeding
    * quantile-matching pipelines.
    *
    * Scale shape: one (group, value) histogram (map-side combined,
    * value-domain-sized), per-group cumulative window over the
    * COMPACTED histogram (the q62 contract), then a broadcast-sized
    * join back on (group, value) — the corpus is scanned once and
    * never window-sorted. Null values keep a null cdf (no rank);
    * null GROUPS are groups (null-safe join back).
    *
    * Output: the input columns + `cdf_ppm`. */
  def groupEcdf(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupEcdf needs group columns")
    val g = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("long").as("__v"): _*)
      .groupBy(g :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val table = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__tot", sum(col("__c")).over(wAll))
      .select(groupCols.map(c => col(c).as(s"__ge_$c")) ++ Seq(
        col("__v"),
        expr("(__cum * 1000000) div __tot").as("cdf_ppm")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__ge_$c"))
      .reduce(_ && _) && col(valueCol).cast("long") === col("__v")
    df.join(table, cond, "left")
      .drop(groupCols.map(c => s"__ge_$c") :+ "__v": _*)
  }

  /** Exact precision–recall curve per group from the score
    * histogram — the threshold-picking table next to [[aucTable]]'s
    * single-number ROC summary (PR is the one that matters under
    * class imbalance, the usual regime for quality filters and
    * contamination flags): for every distinct score s, classify
    * `score >= s` positive and report exact TP/FP plus
    * precision/recall in ppm.
    *
    * Grouped-only by the [[aucTable]] contract: the cumulative runs
    * as a window over the per-group SCORE HISTOGRAM (score-
    * cardinality-sized, partitioned by group) — an ungrouped
    * corpus-wide curve should bucket scores first (e.g. through
    * [[hdrSketch]] or [[quantileBins]]). Labels are 0/1; null
    * labels/scores are excluded. Groups with no positives emit null
    * recall (0-denominator), not a crash.
    *
    * Output: (groupCols*, score, tp, fp, precision_ppm, recall_ppm)
    * — one row per distinct score, descending thresholds. */
  def prCurve(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "prCurve is grouped-only (bucket scores for a global curve)")
    val g = groupCols.map(col)
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(g :+ col(scoreCol).cast("long").as("score") :+
        col(labelCol).cast("long").as("__y"): _*)
      .groupBy(g :+ col("score"): _*)
      .agg(sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y") === 1L, 0L).otherwise(1L)).as("__nn"))
    val wDesc = Window.partitionBy(g: _*).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    hist
      .withColumn("tp", sum(col("__np")).over(wDesc))
      .withColumn("fp", sum(col("__nn")).over(wDesc))
      .withColumn("__P", sum(col("__np")).over(wAll))
      .select(g ++ Seq(col("score"), col("tp"), col("fp"),
        expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
        expr("CASE WHEN __P = 0 THEN NULL" +
          " ELSE (tp * 1000000) div __P END").as("recall_ppm")): _*)
  }

  /** Cohen's kappa inter-annotator agreement in exact ppm — the
    * human-eval QA gate (q221 builds the annotation batches; this
    * scores the annotators): observed agreement po, chance-expected
    * agreement pe from the marginals, and
    * `kappa_ppm = (po_ppm − pe_ppm)·1e6 div (1e6 − pe_ppm)`.
    * Three named flooring points (po, pe, kappa) — stacked floors
    * are the price of a bit-exact cross-engine number, and at ppm
    * resolution the bias is ≤ 2e-6, far below any agreement
    * decision threshold. Perfect chance agreement (pe = 1e6) emits
    * null kappa (undefined), not a division error.
    *
    * Scale shape: one pass to the k×k label-pair cell table,
    * marginals re-aggregated from the CELLS (never a second corpus
    * scan), one output row. Pairs with a null on either side are
    * excluded (no verdict). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ra = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ra"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
    val n = cells.agg(sum(col("__c")).as("__n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))),
        lit(0L)).as("__agree"))
    val pe = ra.join(cb, col("__a") === col("__b"))
      .select((col("__ra") * col("__cb")).as("__rc"))
      .agg(coalesce(sum(col("__rc")), lit(0L)).as("__pesum"))
    n.crossJoin(pe)
      .withColumn("po_ppm", expr("(__agree * 1000000) div __n"))
      .withColumn("pe_ppm",
        expr("CAST((CAST(__pesum AS DECIMAL(38,0)) * 1000000)" +
          " div (CAST(__n AS DECIMAL(38,0)) * __n) AS BIGINT)"))
      // negative numerator when agreement is below chance — FLOOR
      // explicitly (pmod trick) so both engines read the same value
      .withColumn("__kn", expr("(po_ppm - pe_ppm) * 1000000"))
      .withColumn("kappa_ppm",
        expr("CASE WHEN pe_ppm = 1000000 THEN NULL ELSE" +
          " (__kn - pmod(__kn, 1000000 - pe_ppm))" +
          " div (1000000 - pe_ppm) END"))
      .drop("__kn")
      .select(col("__n").as("n"), col("__agree").as("n_agree"),
        col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
  }

  /** Exact AUC (Mann–Whitney U) per group from the score histogram —
    * no float ranks, no sampling: with pos(s)/neg(s) counts per
    * distinct score, `U·2 = Σ_s pos(s)·(2·neg_below(s) + neg(s))`
    * (ties count half — the standard mid-rank convention, kept
    * integer by working in doubled units) and
    * `auc_ppm = U2·1e6 div (2·P·N)`. One corpus scan; the running
    * neg_below is a window over the per-group SCORE HISTOGRAM
    * (score-cardinality-sized), partitioned by group — grouped-only
    * by contract, so no single-partition corpus window exists (an
    * ungrouped corpus-wide AUC should bucket scores first, e.g.
    * through [[hdrSketch]], and accept the bucket-resolution tie
    * handling). No positives or no negatives → null AUC. */
  def aucTable(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "aucTable is grouped-only (bucket scores for a global AUC)")
    val gcols = groupCols.map(col)
    val hist = df.filter(col(scoreCol).isNotNull)
      .groupBy(gcols :+ col(scoreCol).cast("long").as("__v"): _*)
      .agg(sum(when(col(labelCol), lit(1L)).otherwise(lit(0L))).as("__pos"),
        sum(when(col(labelCol), lit(0L)).otherwise(lit(1L))).as("__neg"))
    val below = Window.partitionBy(gcols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("__nb", coalesce(sum(col("__neg")).over(below), lit(0L)))
      .groupBy(gcols: _*)
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        sum(expr("CAST(__pos AS DECIMAL(38,0)) * (2 * __nb + __neg)"))
          .as("__u2"))
      .select(gcols ++ Seq(col("n_pos"), col("n_neg"),
        expr("CAST(coalesce(__u2, 0) AS BIGINT)").as("u2"),
        expr("CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN" +
          " (__u2 * 1000000) div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)" +
          " END AS BIGINT)").as("auc_ppm")): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistics for every group pair,
    * in exact integer units: over the union value grid,
    * `ks_scaled = max |cumA·nb − cumB·na|`, with the float
    * statistic ks_scaled/(na·nb) the caller's last step. KS sees
    * SHAPE differences (location/spread shifts) that q163's
    * total-variation share drift can miss on re-binned categories —
    * the right drift alarm for ordered quantities (lengths,
    * latencies, scores). Engine-exact: cumulative counts are
    * integers; no empirical-CDF floats ever materialize.
    *
    * Scale shape: one corpus scan into the per-group value
    * histogram (persisted); pair expansion joins histogram rows
    * against the broadcast group list (rows × (groups−1), group
    * count categorical by contract); cumulatives ride windows
    * PARTITIONED BY PAIR over the value-domain-sized grid. Overflow
    * bound: cum·n ≤ na·nb must fit a Long (fine to ~3e9 rows per
    * group). */
  def ksPairs(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val hist = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = hist.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val groups = broadcast(hist.select(col("__g").as("__g2")).distinct())
    val cells = hist.join(groups, col("__g") =!= col("__g2"))
      .select(least(col("__g"), col("__g2")).as("ga"),
        greatest(col("__g"), col("__g2")).as("gb"),
        col("__g").as("__side"), col("__v"), col("__c"))
      .groupBy(col("ga"), col("gb"), col("__v"))
      .agg(sum(when(col("__side") === col("ga"), col("__c"))
          .otherwise(lit(0L))).as("__da"),
        sum(when(col("__side") === col("gb"), col("__c"))
          .otherwise(lit(0L))).as("__db"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("__v"))
    cells
      .withColumn("__cuma", sum(col("__da")).over(w))
      .withColumn("__cumb", sum(col("__db")).over(w))
      .join(sizes.select(col("__g").as("ga"), col("__n").as("na")), "ga")
      .join(sizes.select(col("__g").as("gb"), col("__n").as("nb")), "gb")
      .groupBy(col("ga"), col("gb"))
      .agg(min(col("na")).as("na"), min(col("nb")).as("nb"),
        max(abs(col("__cuma") * col("nb") - col("__cumb") * col("na")))
          .as("ks_scaled"))
  }

  /** Benford first-digit audit (Newcomb 1881; Benford 1938) — the
    * fabricated-numbers smell test for financial/measure columns:
    * observed first-significant-digit shares vs the Benford
    * expectation log10(1+1/d), shipped as the standard rounded-ppm
    * constant table (301030 … 45757, summing to exactly 1e6 — fixed
    * literals, not computed logs, per the no-libm doctrine), plus a
    * per-digit divergence `(obs_ppm − exp_ppm)² div exp_ppm`. Only
    * positive values participate (first digit of |0| is undefined).
    * Output: (digit, n, obs_ppm, exp_ppm, dev_ppm), 9 rows. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    // the first-digit extraction goes through the value's canonical
    // string form — integral types only, or "1.5" would read digit
    // '1' at the wrong magnitude (cast money to cents upstream)
    require(Seq("long", "integer", "short", "byte")
        .contains(df.schema(valueCol).dataType.typeName),
      s"benfordDigits needs an integral column (got " +
        s"${df.schema(valueCol).dataType.typeName}); cast to cents first")
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(expr(s"CAST(substring(CAST($valueCol AS STRING), 1, 1)" +
        " AS BIGINT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__tot"))))
      .withColumn("obs_ppm", expr("(n * 1000000) div __tot"))
      .withColumn("exp_ppm",
        element_at(array(benford.map(lit): _*), col("digit").cast("int")))
      .withColumn("dev_ppm",
        expr("((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) div exp_ppm"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        col("dev_ppm"))
  }

  /** Gini / Lorenz-curve sufficient statistics — the inequality
    * audit ("how concentrated is revenue / token mass / degree"):
    * with x ranked ascending (1-based rank r over a TOTAL order —
    * ties ordered arbitrarily, which is safe because Σ r·x is
    * invariant under permutations within an equal-x block),
    * `G = 2·Σ r·x / (n·Σx) − (n+1)/n`. The moments (n, sum_x,
    * sum_rx) are the output — integer-exact, the float G is the
    * caller's last step. Negative values are rejected by filter
    * (the Lorenz construction assumes non-negative mass).
    *
    * Scale shape: the global rank rides
    * [[Ranking.withGlobalIndex]]'s distributed prefix scan (range
    * shuffle + partials + broadcast offsets) — never
    * `row_number().over(Window.orderBy(...))`'s single task — and
    * the moment agg is map-side combined. Σ r·x rides
    * DECIMAL(38,0) (r ≤ n, so the product caps at n²·max_x). */
  def giniMoments(df: DataFrame, valueCol: String): DataFrame = {
    val v = df.select(col(valueCol).cast("long").as("__x"))
      .filter(col("__x").isNotNull && col("__x") >= 0)
    Ranking.withGlobalIndex(v, Seq(col("__x")), "__r0")
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sum_x"),
        sum(expr("CAST(__r0 + 1 AS DECIMAL(38,0)) * __x")).as("__srx"))
      .select(col("n"), col("sum_x"),
        expr("CAST(coalesce(__srx, 0) AS BIGINT)").as("sum_rx"))
  }

  /** Decile lift table — the model-evaluation staple: rows ranked
    * into `nBins` score bins by the exact [[quantileBins]] cuts;
    * per bin, the positive count, rate and LIFT over the base rate
    * in exact ppm (`lift = rate_bin / rate_overall`, computed as one
    * integral divide `(pos·N·1e6) div (n·P)` — a single flooring
    * point, no intermediate rate rounding). Lift ≫ 1e6 in high
    * bins = the score ranks well; flat 1e6 everywhere = the score
    * is noise. Zero positives overall → null lift (no base rate).
    *
    * Scale shape: the bin cuts ride the percentile histogram
    * reduction; binning is a broadcast join of the 1-row cut table;
    * the per-bin rollup is one map-side-combined agg; totals attach
    * as a broadcast 1-row aggregate. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100,
      s"nBins must be in [2, 100] (got $nBins)")
    require(10000 % nBins == 0,
      s"nBins must divide the basis-point grid (got $nBins)")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val per = quantileBins(df.filter(col(scoreCol).isNotNull), Nil,
        scoreCol, ps)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), lit(1L)).otherwise(lit(0L))).as("pos"))
    per.crossJoin(broadcast(
        per.agg(sum(col("n")).as("__tn"), sum(col("pos")).as("__tp"))))
      .select(col("bin"), col("n"), col("pos"),
        expr("(pos * 1000000) div n").as("rate_ppm"),
        expr("CAST(CASE WHEN __tp > 0 THEN" +
          " (CAST(pos AS DECIMAL(38,0)) * __tn * 1000000)" +
          " div (CAST(n AS DECIMAL(38,0)) * __tp) END AS BIGINT)")
          .as("lift_ppm"))
  }

  /** HDR-style histogram sketch (Gray & Tene's HdrHistogram bucket
    * scheme): each non-negative value keeps its top `subBits`+1
    * significant bits — bucket lower bound
    * `lb = (v >> s) << s, s = max(bits(v) − 1 − subBits, 0)` — so
    * state is bounded at ~63·2^subBits buckets per group for ANY
    * long-valued domain, with relative error ≤ 2^−subBits. This is
    * the honest percentile path when [[exactPercentiles]]' value
    * histogram would be corpus-sized (µs-resolution latencies,
    * byte-exact sizes: near-unique values make "exact" a full
    * shuffle of the column). Buckets are pure functions of the value
    * (bin()-length arithmetic, engine-portable like the HLL rho) and
    * merge by adding counts — shard/replay/engine independent.
    * Negative values are rejected by filter (latencies/sizes are the
    * contract; signed data should be offset upstream).
    *
    * Output: (groupCols*, bucket_lo, cnt), ordered-joinable;
    * map-side combined, ≤ buckets·partitions rows shuffle. */
  def hdrSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16] (got $subBits)")
    val gcols = groupCols.map(col)
    val b1 = subBits + 1
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(gcols :+ col(valueCol).cast("long").as("__v"): _*)
      .withColumn("bucket_lo", expr(
        s"shiftleft(shiftright(__v, greatest(length(bin(__v)) - $b1, 0))," +
          s" greatest(length(bin(__v)) - $b1, 0))"))
      .groupBy(gcols :+ col("bucket_lo"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Percentile estimates from a [[hdrSketch]]: the cume_dist ≥ p
    * rule over buckets ordered by lower bound, reporting the bucket
    * lower bound — an underestimate by at most 2^−subBits relative
    * (spec-asserted against exact percentiles). The window runs over
    * the SKETCH (≤ 63·2^subBits rows per group), never the data. */
  def hdrPercentiles(sketch: DataFrame, groupCols: Seq[String],
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    ps.foreach { p =>
      require(p > 0 && p <= 1, s"percentile $p outside (0, 1]")
      require(math.abs(p * 10000 - math.round(p * 10000)) < 1e-9,
        s"percentile $p is not a basis-point multiple (1e-4 grid)")
    }
    val gcols = groupCols.map(col)
    val running = Window.partitionBy(gcols: _*).orderBy(col("bucket_lo"))
    val whole = Window.partitionBy(gcols: _*)
    val picks = ps.map { p =>
      val bp = math.round(p * 10000)
      min(when(col("__cum") * 10000 >= col("__tot") * bp,
        col("bucket_lo"))).as(pName(p))
    }
    sketch
      .withColumn("__cum", sum(col("cnt")).over(running))
      .withColumn("__tot", sum(col("cnt")).over(whole))
      .groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
  }

  /** Per-group bivariate moments — [[corrMoments]]' single-pair,
    * grouped sibling: for each group, (n, sum_x, sum_y, sum_xy,
    * sum_x2, sum_y2) over rows where both are non-null. The
    * sufficient statistics for a per-group least-squares slope
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` and correlation — the
    * per-user activity-trend fit, a million tiny regressions as ONE
    * map-side-combined agg. Moments add across shards. Sums ride
    * DECIMAL(38,0), outputs BIGINT (callers keep values ≤ ~1e5
    * scale, same contract as corrMoments). */
  def groupedMoments(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedMoments needs group columns")
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    def dec(c: String) = s"CAST($c AS DECIMAL(38,0))"
    df.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(when(both, lit(1L))), lit(0L)).as("n"),
        sum(when(both, expr(dec(xCol)))).as("__sx"),
        sum(when(both, expr(dec(yCol)))).as("__sy"),
        sum(when(both, expr(s"${dec(xCol)} * $yCol"))).as("__sxy"),
        sum(when(both, expr(s"${dec(xCol)} * $xCol"))).as("__sx2"),
        sum(when(both, expr(s"${dec(yCol)} * $yCol"))).as("__sy2"))
      .select(groupCols.map(col) ++ Seq(col("n"),
        expr("CAST(coalesce(__sx, 0) AS BIGINT)").as("sum_x"),
        expr("CAST(coalesce(__sy, 0) AS BIGINT)").as("sum_y"),
        expr("CAST(coalesce(__sxy, 0) AS BIGINT)").as("sum_xy"),
        expr("CAST(coalesce(__sx2, 0) AS BIGINT)").as("sum_x2"),
        expr("CAST(coalesce(__sy2, 0) AS BIGINT)").as("sum_y2")): _*)
  }

  /** Median / MAD robust outlier report per group — the
    * non-parametric cousin of z-scoring (no mean, no variance, no
    * float): med = p50 of the values, mad = p50 of |v − med|, and a
    * value is an outlier when |v − med| > k·mad (Hampel's rule;
    * k = 3 by default — for a normal distribution 3·MAD ≈ 2σ).
    * Both medians use the cume_dist ≥ p integer rule, so the report
    * is engine-exact. mad = 0 (over half the mass on one value)
    * makes every deviating value an outlier — correct and
    * deliberate for the degenerate distributions it flags.
    *
    * Output: (groupCols*, n, med, mad, n_outliers).
    *
    * Scale shape: ONE corpus scan. Everything derives from the
    * persisted value histogram: the median from its cumsum, the
    * DEVIATION histogram by re-keying histogram rows on |v − med|
    * (value-domain-sized arithmetic, not a rescan), the MAD from
    * that, and the outlier count from the original histogram joined
    * to both cuts. */
  def madStats(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Long = 3L): DataFrame = {
    require(groupCols.nonEmpty, "madStats needs group columns")
    require(k >= 1, s"k must be >= 1 (got $k)")
    val gcols = groupCols.map(col)
    val (hist, med, mad) = medMadOf(df, groupCols, valueCol)
    hist.join(med, groupCols).join(mad, groupCols)
      .groupBy(gcols: _*)
      .agg(sum(col("__c")).as("n"), min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(abs(col("__v") - col("med")) > lit(k) * col("mad"),
          col("__c")).otherwise(lit(0L))).as("n_outliers"))
  }

  /** Shared med/MAD derivation: the persisted value histogram, the
    * per-group median, and the MAD — all by the cume_dist·2 ≥ tot
    * integer rule, the deviation histogram re-keyed from the value
    * histogram (no input rescan). */
  private def medMadOf(df: DataFrame, groupCols: Seq[String],
      valueCol: String): (DataFrame, DataFrame, DataFrame) = {
    val gcols = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .select(gcols :+ col(valueCol).cast("long").as("__v"): _*)
      .groupBy(gcols :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def p50(h: DataFrame, vCol: String): DataFrame = {
      val running = Window.partitionBy(gcols: _*).orderBy(col(vCol))
      val whole = Window.partitionBy(gcols: _*)
      h.withColumn("__cum", sum(col("__c")).over(running))
        .withColumn("__tot", sum(col("__c")).over(whole))
        .groupBy(gcols: _*)
        .agg(min(when(col("__cum") * 2 >= col("__tot"), col(vCol)))
          .as(s"__p50_$vCol"))
    }
    val med = p50(hist, "__v").withColumnRenamed("__p50___v", "med")
    val devHist = hist.join(med, groupCols)
      .select(gcols :+ abs(col("__v") - col("med")).as("__d")
        :+ col("__c"): _*)
      .groupBy(gcols :+ col("__d"): _*).agg(sum(col("__c")).as("__c"))
    val mad = p50(devHist, "__d").withColumnRenamed("__p50___d", "mad")
    (hist, med, mad)
  }

  /** Row-level companion of [[madStats]] — the offending rows
    * themselves, with med/mad attached: the spike/anomaly LIST
    * (which days spiked, which docs are length freaks), where
    * madStats gives only counts. Same Hampel rule
    * |v − med| > k·mad. Costs one extra pass over the input to
    * emit rows (the summary derives everything from the histogram;
    * a row list cannot) — run it on rollups, not raw corpora, when
    * the input is corpus-sized. */
  def madOutlierRows(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Long = 3L): DataFrame = {
    require(groupCols.nonEmpty, "madOutlierRows needs group columns")
    require(k >= 1, s"k must be >= 1 (got $k)")
    val (_, med, mad) = medMadOf(df, groupCols, valueCol)
    df.join(med, groupCols).join(mad, groupCols)
      .filter(col(valueCol).isNotNull &&
        abs(col(valueCol).cast("long") - col("med")) > lit(k) * col("mad"))
  }

  /** Herfindahl–Hirschman concentration index per key in exact ppm —
    * the no-libm diversity measure (Simpson index's complement):
    * hhi_ppm = 1e6·Σᵢnᵢ² div n², where nᵢ are the per-category
    * counts under the key. 1e6 = all activity in one category;
    * 1e6/k = uniform over k categories. The entropy-style diversity
    * report without a log in sight — rankings agree with entropy for
    * the monitoring purposes this serves (bot detection: a "user"
    * hammering one event type scores ~1e6; drift: a source feeding
    * one language). Output: (key, n, n_cats, sum_sq, hhi_ppm); the
    * integer moments merge across shards (sum_sq adds only if
    * category sets are disjoint — re-aggregate from the (key,
    * category) level when merging, which is why that level is the
    * published intermediate).
    *
    * Scale shape: two nested map-side-combined aggs — (key,
    * category) then (key) — both shuffles carry count rows, never
    * raw events. DECIMAL(38,0) guards the n² product for hot keys. */
  def concentration(df: DataFrame, keyCol: String,
      catCol: String): DataFrame = {
    val cells = df
      .filter(col(keyCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(keyCol), col(catCol)).agg(count(lit(1)).as("__n"))
    cells.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("n_cats"),
        sum(col("__n") * col("__n")).as("sum_sq"))
      .withColumn("hhi_ppm",
        expr("CAST((CAST(sum_sq AS DECIMAL(38,0)) * 1000000) div" +
          " (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
  }

  /** Winsorized (percentile-clipped) robust statistics per group —
    * the outlier-tamed mean a curation dashboard reports when a few
    * giant documents would otherwise dominate: values below the
    * `loP` cut or above the `hiP` cut are CLAMPED to the cut before
    * summing (winsorization; trimming would drop them). Cuts use the
    * same integer cume_dist ≥ p definition as [[exactPercentiles]],
    * so they are engine-exact.
    *
    * Output per group: (groupCols*, n, sum_raw, sum_wins, n_lo,
    * n_hi, lo_cut, hi_cut) — integer sums; the float means are the
    * caller's division. Null values are excluded (no rank), matching
    * [[quantileBins]].
    *
    * Scale shape: ONE corpus scan. The value histogram (groupBy
    * (group, value), map-side combined, value-domain-sized) is
    * persisted and serves both the cut computation (per-group window
    * prefix sums over the HISTOGRAM — partitioned, never a global
    * sort) and the clipped sums: Σ clip(v)·count over histogram rows
    * equals Σ clip(v) over the corpus, so the corpus is never
    * rescanned after the histogram agg. */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String],
      valueCol: String, loP: Double = 0.05,
      hiP: Double = 0.95): DataFrame = {
    require(groupCols.nonEmpty, "winsorizedStats needs group columns")
    require(loP > 0 && hiP <= 1 && loP < hiP,
      s"need 0 < loP < hiP <= 1 (got $loP, $hiP)")
    Seq(loP, hiP).foreach { p =>
      require(math.abs(p * 10000 - math.round(p * 10000)) < 1e-9,
        s"percentile $p is not a basis-point multiple (1e-4 grid)")
    }
    val (loBp, hiBp) = (math.round(loP * 10000), math.round(hiP * 10000))
    val gcols = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .select(gcols :+ col(valueCol).cast("long").as("__v"): _*)
      .groupBy(gcols :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val running = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val whole = Window.partitionBy(gcols: _*)
    val cuts = hist
      .withColumn("__cum", sum(col("__c")).over(running))
      .withColumn("__tot", sum(col("__c")).over(whole))
      .groupBy(gcols: _*)
      .agg(
        min(when(col("__cum") * 10000 >= col("__tot") * loBp, col("__v")))
          .as("__lo"),
        min(when(col("__cum") * 10000 >= col("__tot") * hiBp, col("__v")))
          .as("__hi"))
    val clipped = greatest(col("__lo"), least(col("__hi"), col("__v")))
    hist.join(cuts, groupCols)
      .groupBy(gcols: _*)
      .agg(sum(col("__c")).as("n"),
        sum(col("__v") * col("__c")).as("sum_raw"),
        sum(clipped * col("__c")).as("sum_wins"),
        sum(when(col("__v") < col("__lo"), col("__c")).otherwise(lit(0L)))
          .as("n_lo"),
        sum(when(col("__v") > col("__hi"), col("__c")).otherwise(lit(0L)))
          .as("n_hi"),
        min(col("__lo")).as("lo_cut"), min(col("__hi")).as("hi_cut"))
  }

  /** Chi-squared contingency cells for two categorical columns —
    * the categorical-association audit (is `lang` independent of
    * `source`?) that complements [[corrMoments]]'s numeric one. Per
    * grid cell (x, y): the observed count `o`, the expected count in
    * ppm `e_ppm = 1e6·rx·cy div N`, and the cell's χ² contribution
    * in ppm via the algebraically cleared form
    * `chi2_ppm = 1e6·(N·o − rx·cy)² div (N·rx·cy)` — one flooring
    * point, engine-exact (the float χ² is Σ chi2_ppm / 1e6, the
    * caller's last step; compare to the (kx−1)(ky−1)-df critical
    * value off-engine). UNOBSERVED grid cells are included with
    * o = 0 — dropping them understates the statistic — via the
    * row-total × column-total cross join.
    *
    * Scale shape: ONE corpus scan (the cell agg, map-side combined);
    * row totals, column totals and N are all re-aggregated from the
    * CELL table, which is value-cardinality-sized, so the corpus is
    * never rescanned (the cell frame is persisted across its four
    * uses). The grid cross join is kx×ky — categorical by contract;
    * a high-cardinality "category" column belongs in
    * [[quantileBins]] first. DECIMAL(38,0) headroom: N·o ≤ N²
    * must fit a Long (N ≤ 3e9 rows — beyond that, pre-aggregate per
    * shard and sum cells; cells merge by adding o). */
  def chiSquareCells(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("x"), col(yCol).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rx = cells.groupBy(col("x")).agg(sum(col("o")).as("rx"))
    val cy = cells.groupBy(col("y")).agg(sum(col("o")).as("cy"))
    val nn = cells.agg(sum(col("o")).as("nn"))
    rx.crossJoin(cy).crossJoin(broadcast(nn))
      .join(cells, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("o"), lit(0L)).as("o"),
        col("rx"), col("cy"), col("nn"))
      .withColumn("__d", col("nn") * col("o") - col("rx") * col("cy"))
      .select(col("x"), col("y"), col("o"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * rx * cy) div nn" +
          " AS BIGINT)").as("e_ppm"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __d * __d) div" +
          " (CAST(nn AS DECIMAL(38,0)) * rx * cy) AS BIGINT)")
          .as("chi2_ppm"))
  }

  /** All-pairs Pearson correlation sufficient statistics in ONE
    * corpus scan: for every unordered column pair (x, y), the row
    * (col_x, col_y, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) over
    * rows where BOTH are non-null (pairwise deletion). The float
    * correlation `(n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² −
    * (Σy)²))` is the caller's last step — moments, not floats, cross
    * the oracle boundary (q165 doctrine), and moments from disjoint
    * shards ADD, so the statistics merge across clusters/days for
    * free.
    *
    * Scale shape: the 6·C(k,2) aggregates are columns of ONE
    * map-side-combined global agg — one scan, one 1-row exchange, no
    * per-pair jobs and no row explosion (an explode-by-pair form
    * would shuffle rows×pairs). The 1-row result is unpivoted to
    * pair rows by `stack` — a projection, not a shuffle. Sums ride
    * DECIMAL(38,0) internally and return as BIGINT; callers keep
    * |value| ≤ ~1e5-scale integers so Σx² fits Long at any corpus
    * size they intend (the cents→dollars floor in q170). Columns
    * must be integer-typed (cast upstream — the caller owns the
    * exactness contract). */
  def corrMoments(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns (got ${cols.size})")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    def dec(c: String) = s"CAST($c AS DECIMAL(38,0))"
    val aggs = pairs.flatMap { case (i, j) =>
      val (a, b) = (cols(i), cols(j))
      val both = col(a).isNotNull && col(b).isNotNull
      Seq(
        coalesce(sum(when(both, lit(1L))), lit(0L)).as(s"n_${i}_$j"),
        sum(when(both, expr(dec(a)))).as(s"sx_${i}_$j"),
        sum(when(both, expr(dec(b)))).as(s"sy_${i}_$j"),
        sum(when(both, expr(s"${dec(a)} * $b"))).as(s"sxy_${i}_$j"),
        sum(when(both, expr(s"${dec(a)} * $a"))).as(s"sx2_${i}_$j"),
        sum(when(both, expr(s"${dec(b)} * $b"))).as(s"sy2_${i}_$j"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (i, j) =>
      Seq(s"'${cols(i)}'", s"'${cols(j)}'", s"n_${i}_$j",
        s"CAST(coalesce(sx_${i}_$j, 0) AS BIGINT)",
        s"CAST(coalesce(sy_${i}_$j, 0) AS BIGINT)",
        s"CAST(coalesce(sxy_${i}_$j, 0) AS BIGINT)",
        s"CAST(coalesce(sx2_${i}_$j, 0) AS BIGINT)",
        s"CAST(coalesce(sy2_${i}_$j, 0) AS BIGINT)").mkString(", ")
    }
    one.select(expr(s"stack(${pairs.size}, ${rows.mkString(", ")})" +
      " AS (col_x, col_y, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2)"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al. 2013) —
    * the A/B-test adjustment every mature experimentation platform
    * applies: with a pre-experiment covariate x per unit, the
    * adjusted metric `y − θ·(x − E[x])` keeps the same expectation
    * but sheds the variance x explains, often halving the sample
    * size an effect needs. θ = cov(x,y)/var(x) is estimated POOLED
    * (both arms — pooling keeps the estimate treatment-independent
    * and the adjustment unbiased).
    *
    * Everything is integer with named flooring points, replayable on
    * any engine: `theta_ppm = floor(1e6·(n·Σxy − Σx·Σy) /
    * (n·Σx² − Σx·Σx))` (true floor via the pmod trick — numerators
    * go negative), per-arm micro-means floor separately, and
    * `adj_mean_e6 = mean_y_e6 − floor(theta_ppm·(mean_x_e6 −
    * pooled_mean_x_e6) / 1e6)`.
    *
    * Input is the PER-UNIT frame (one row per randomization unit —
    * aggregate raw events to units first; adjusting row-level data
    * against a unit-level covariate would be a unit-of-analysis
    * error). Scale shape: one pooled agg (broadcast single row) +
    * one per-arm agg, both map-side combined; output is arm-sized.
    * Degenerate var(x) = 0 → theta 0 (no adjustment, not a crash).
    *
    * Output: (armCol, n, mean_x_e6, mean_y_e6, theta_ppm,
    * adj_mean_e6). */
  def cupedAdjust(units: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = units
      .filter(col(armCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(armCol).as("arm"),
        col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    def dec(c: String) = s"CAST($c AS DECIMAL(38,0))"
    val pooled = broadcast(base.agg(
      count(lit(1)).as("__pn"),
      sum(col("__x")).as("__psx"), sum(col("__y")).as("__psy"),
      expr(s"sum(${dec("__x")} * __y)").as("__psxy"),
      expr(s"sum(${dec("__x")} * __x)").as("__psxx")))
    val arms = base.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"))
    // floor division that agrees with SQL's // on negatives
    def fdiv(num: String, den: String) =
      s"CAST((($num) - pmod(($num), ($den))) div ($den) AS BIGINT)"
    arms.crossJoin(pooled)
      .withColumn("__tnum",
        expr(s"(${dec("__pn")} * __psxy - ${dec("__psx")} * __psy)" +
          " * 1000000"))
      .withColumn("__tden",
        expr(s"${dec("__pn")} * __psxx - ${dec("__psx")} * __psx"))
      .withColumn("theta_ppm",
        expr(s"CASE WHEN __tden = 0 THEN 0L ELSE " +
          fdiv("__tnum", "__tden") + " END"))
      .withColumn("mean_x_e6",
        expr(fdiv(s"${dec("__sx")} * 1000000", "n")))
      .withColumn("mean_y_e6",
        expr(fdiv(s"${dec("__sy")} * 1000000", "n")))
      .withColumn("__pmx",
        expr(fdiv(s"${dec("__psx")} * 1000000", "__pn")))
      .withColumn("adj_mean_e6", expr("mean_y_e6 - " +
        fdiv(s"${dec("theta_ppm")} * (mean_x_e6 - __pmx)", "1000000")))
      .select(col("arm").as(armCol), col("n"), col("mean_x_e6"),
        col("mean_y_e6"), col("theta_ppm"), col("adj_mean_e6"))
  }

  /** Fixed Poisson(1) CDF thresholds ×1e6 (cumP(0)..cumP(5); draws
    * ≥ the last take weight 6). The ONLINE-bootstrap weight table:
    * a deterministic integer surrogate for the multinomial resample
    * (Oza & Russell 2001's Poisson approximation), chosen over true
    * multinomial weights because each row's weight is then a pure
    * function of (seed, replicate, row id) — no global coordination,
    * no RNG stream, bit-identical on any engine. */
  private val PoissonCdfE6 =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)

  /** Shared replicate-cell builder for the bootstrap family: ONE md5
    * per row yields two 60-bit uniforms, and replicate `b`'s draw is
    * the double-hash mix `(h1 + b·(h2 mod 2^54)) mod 2^60 mod 1e6`
    * (the TicketRaceMin arithmetic-progression move — h2 is reduced
    * to 54 bits so `b·h2` stays inside a signed long at any sane
    * replicate count; the dispersion trade is the one documented at
    * the HashRace kernel, and a weight draw needs far less than even
    * 54 bits). This replaces b md5 digests per row with one — at
    * b = 40 the digest work that dominated the scan drops 40×.
    * Poisson weights come from the fixed CDF thresholds; cells are
    * map-side combined to groups×b rows. */
  private def bootCells(base: DataFrame,
      g: Seq[Column], b: Int, seed: String): DataFrame = {
    val thresholds = PoissonCdfE6.zipWithIndex
      .map { case (t, w) => s"WHEN __u < ${t}L THEN ${w}L" }
      .mkString("CASE ", " ", " ELSE 6L END")
    val digest = md5(concat_ws(":", lit(seed), col("__id")))
    base
      .withColumn("__h1",
        conv(substring(digest, 1, 15), 16, 10).cast("long"))
      .withColumn("__h2",
        pmod(conv(substring(digest, 17, 15), 16, 10).cast("long"),
          lit(18014398509481984L))) // 2^54
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__u",
        pmod(pmod(col("__h1") + col("__b") * col("__h2"),
          lit(1152921504606846976L)), lit(1000000L))) // 2^60, 1e6
      .withColumn("__w", expr(thresholds))
      .groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__sw"),
        sum(col("__w") * col("__e")).as("__swe"))
  }

  /** Deterministic bootstrap confidence band for per-group means —
    * "is this week's quality-score shift real?" answered with error
    * bars that reproduce across engines, retries and partitionings:
    * `b` resample replicates, each row weighted by the Poisson(1)
    * surrogate drawn from ONE md5(seed:id) stepped per replicate by
    * the [[bootCells]] double-hash mix, per-replicate integer-micros
    * means ranked, and the band read at `loRank`/`hiRank` of the
    * ranked replicate means (defaults ≈ 5th/95th percentile at
    * b = 40). The point estimate (floor-div mean of the real data)
    * rides along.
    *
    * All arithmetic is integer: e = floor(value·1e6), replicate mean
    * = FLOOR(Σw·e / Σw) via the pmod floor-division trick (the q212
    * move — Spark's `div` truncates while floor is the cross-engine
    * form), so the entire table is hash-exact.
    *
    * Scale shape: the replicate explode multiplies SCAN work by `b`
    * (the standard online-bootstrap price) but the exchange is
    * map-side combined to ≤ groups·b cells; the ranking window
    * partitions by group over exactly `b` rows. A replicate whose
    * weights all drew 0 contributes no mean (n_boots counts the
    * survivors).
    *
    * Output: (groupCols*, n, mean_e6, n_boots, boot_lo_e6,
    * boot_hi_e6). */
  def bootstrapMeans(df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String, b: Int = 40,
      loRank: Int = 2, hiRank: Int = 39,
      seed: String = "bs"): DataFrame = {
    require(groupCols.nonEmpty, "bootstrapMeans needs group columns")
    require(b >= 2 && loRank >= 1 && hiRank <= b && loRank <= hiRank,
      s"bad ranks: b=$b lo=$loRank hi=$hiRank")
    val g = groupCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
      .select(g :+ col(idCol).cast("string").as("__id") :+
        expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * 1000000) AS BIGINT)")
          .as("__e"): _*)
    val cells = bootCells(base, g, b, seed)
    val means = cells.filter(col("__sw") > 0L)
      .withColumn("__mean",
        expr("(__swe - pmod(__swe, __sw)) div __sw")) // floor div
    val w = Window.partitionBy(g: _*)
      .orderBy(col("__mean"), col("__b"))
    val band = means
      .withColumn("__rk", row_number().over(w))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_boots"),
        max(when(col("__rk") === loRank, col("__mean")))
          .as("boot_lo_e6"),
        max(when(col("__rk") === hiRank, col("__mean")))
          .as("boot_hi_e6"))
    val point = base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(col("__e")).as("__se"))
      .withColumn("mean_e6", expr("(__se - pmod(__se, n)) div n"))
      .drop("__se")
    // eqNullSafe join: null groups are groups (the quantileBins /
    // groupEcdf / exactSplit convention) — a plain equi-join would
    // silently drop a null-keyed group's row from the output
    val bandR = band.select(
      groupCols.map(c => col(c).as(s"__bb_$c")) ++
        Seq(col("n_boots"), col("boot_lo_e6"), col("boot_hi_e6")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__bb_$c"))
      .reduce(_ && _)
    point.join(bandR, cond)
      .select(g ++ Seq(col("n"), col("mean_e6"), col("n_boots"),
        col("boot_lo_e6"), col("boot_hi_e6")): _*)
  }

  /** Two-sample bootstrap: confidence band for the DIFFERENCE of
    * means between two arms — the experiment readout itself ("is
    * treat − control real?"), built on [[bootstrapMeans]]'
    * replicate machinery: per replicate both arms' floor-div means
    * difference, the b diffs ranked, the band read at loRank/hiRank.
    * Weights per (replicate, unit) are identical to
    * [[bootstrapMeans]] under the same seed family — the two arms'
    * draws are independent because the unit ids differ.
    *
    * Rows outside the two named arms are ignored (multi-arm tables
    * pass through unchanged). Replicates where either arm drew
    * all-zero weights are dropped (n_boots counts survivors).
    *
    * Output (one row): (n_control, n_treat, diff_e6, n_boots,
    * diff_lo_e6, diff_hi_e6), diff = treat − control. */
  def bootstrapDiff(df: DataFrame, armCol: String, valueCol: String,
      idCol: String, control: String, treat: String, b: Int = 40,
      loRank: Int = 2, hiRank: Int = 39,
      seed: String = "bd"): DataFrame = {
    require(control != treat, "control and treat must differ")
    require(b >= 2 && loRank >= 1 && hiRank <= b && loRank <= hiRank,
      s"bad ranks: b=$b lo=$loRank hi=$hiRank")
    val base = df
      .filter(col(valueCol).isNotNull &&
        col(armCol).isin(control, treat))
      .select(col(armCol).cast("string").as("__arm"),
        col(idCol).cast("string").as("__id"),
        expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * 1000000) AS BIGINT)")
          .as("__e"))
    val cells = bootCells(base, Seq(col("__arm")), b, seed)
      .filter(col("__sw") > 0L)
      .withColumn("__mean",
        expr("(__swe - pmod(__swe, __sw)) div __sw"))
    val diffs = cells.filter(col("__arm") === control)
      .select(col("__b"), col("__mean").as("__mc"))
      .join(cells.filter(col("__arm") === treat)
        .select(col("__b"), col("__mean").as("__mt")), Seq("__b"))
      .withColumn("__d", col("__mt") - col("__mc"))
    val w = Window.orderBy(col("__d"), col("__b")) // b rows total
    val band = diffs.withColumn("__rk", row_number().over(w))
      .agg(count(lit(1)).as("n_boots"),
        max(when(col("__rk") === loRank, col("__d"))).as("diff_lo_e6"),
        max(when(col("__rk") === hiRank, col("__d"))).as("diff_hi_e6"))
    val point = base.groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("__se"))
      .withColumn("__mean", expr("(__se - pmod(__se, __n)) div __n"))
    val pc = point.filter(col("__arm") === control)
      .select(col("__n").as("n_control"), col("__mean").as("__mc"))
    val pt = point.filter(col("__arm") === treat)
      .select(col("__n").as("n_treat"), col("__mean").as("__mt"))
    pc.crossJoin(pt).crossJoin(band)
      .select(col("n_control"), col("n_treat"),
        (col("__mt") - col("__mc")).as("diff_e6"), col("n_boots"),
        col("diff_lo_e6"), col("diff_hi_e6"))
  }

  /** Declarative data-quality suite in ONE corpus scan — [[dqRule]]
    * runs one aggregation pass per rule; at a 100 TB table the scan
    * IS the cost, so the suite form evaluates every rule predicate
    * as a conditional-sum COLUMN of a single map-side-combined agg
    * and unpivots the 1-row result to the per-rule report (the
    * corrMoments stack move — a projection, not a shuffle, and
    * provably no Union of per-rule subplans).
    *
    * Output: (rule, violations, checked), one row per rule in
    * declaration order semantics (sort for a total order). */
  def dqSuite(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "dqSuite needs rules")
    require(rules.map(_._1).distinct.size == rules.size,
      "duplicate rule names")
    val aggs = rules.zipWithIndex.map { case ((_, violation), i) =>
      coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
        .as(s"__v_$i")
    } :+ count(lit(1)).as("__checked")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', __v_$i, __checked"
    }
    one.select(expr(s"stack(${rules.size}, ${rows.mkString(", ")})" +
      " AS (rule, violations, checked)"))
  }

  /** Per-group power moments to order 4 — the shard-mergeable basis
    * for variance, skewness and kurtosis (the shape alarms a drift
    * monitor derives downstream): n and Σe, Σe², Σe³, Σe⁴ over
    * `e = floor(value·scale)`. Keeping raw POWER SUMS instead of
    * central moments is deliberate: power sums add across shards and
    * days (central moments don't), and the single flooring point
    * makes the whole table engine-exact — skew/kurtosis themselves
    * are one float division away, computed caller-side where float
    * semantics are the caller's problem.
    *
    * Σe²–Σe⁴ overflow int64 at corpus scales, so they are carried
    * and RETURNED as DECIMAL(38,0) — cast to string for cross-engine
    * hashing if needed (HUGEINT territory in DuckDB).
    *
    * Scale shape: ONE map-side-combined agg, groups-sized output,
    * no second pass. Nulls are excluded per group. */
  def powerMoments(df: DataFrame, groupCols: Seq[String],
      valueCol: String, scale: Long = 1000L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1 (got $scale)")
    val e = df.filter(col(valueCol).isNotNull)
      .withColumn("__e",
        expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * $scale) AS BIGINT)"))
    val d = "CAST(__e AS DECIMAL(38,0))"
    val grouped =
      if (groupCols.nonEmpty) e.groupBy(groupCols.map(col): _*)
      else e.groupBy()
    grouped.agg(
      count(lit(1)).as("n"),
      sum(col("__e")).as("s1"),
      expr(s"sum($d * __e)").as("s2"),
      expr(s"sum($d * __e * __e)").as("s3"),
      expr(s"sum($d * __e * __e * __e)").as("s4"))
  }

  /** Exact per-column uniqueness profile — the key-candidate
    * discovery pass a schema audit runs before declaring a join key
    * or dedup identity: for each column its exact non-null distinct
    * count, null count, maximum multiplicity, and an `is_key` verdict
    * (no nulls AND distinct == rows).
    *
    * [[profile]] deliberately estimates distincts (KMV) because an
    * exact per-column distinct over arbitrary columns is a
    * vocabulary-sized exchange; THIS pass is the one you run when you
    * need the exact answer for candidate keys, and its shape is the
    * honest floor for exactness: ONE `groupBy(col_name, value)`
    * histogram (map-side combined, exchange = distinct (column,
    * value) pairs — value-domain-sized, not corpus-sized) followed by
    * a C-row rollup. Run it on the columns you suspect are keys, not
    * on free-text payloads.
    *
    * Output: (col_name, n_rows, n_null, n_distinct, max_mult,
    * is_key), one row per requested column; `n_distinct` counts
    * non-null values, `max_mult` is the largest multiplicity among
    * non-null values (0 for an all-null column). */
  def uniquenessProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "uniquenessProfile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"uniquenessProfile of absent column(s): ${missing.mkString(", ")}")
    val stacked = df.selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ") +
        ") AS (col_name, v)")
    stacked.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("__cnt")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("__cnt"))), lit(0L))
          .as("n_null"),
        count(col("v")).as("n_distinct"),
        coalesce(max(when(col("v").isNotNull, col("__cnt"))), lit(0L))
          .as("max_mult"))
      .withColumn("is_key",
        col("n_null") === 0L && col("n_distinct") === col("n_rows"))
  }

  /** Functional-dependency violation report: the determinant groups
    * where `detCols → depCol` FAILS — more than one distinct
    * dependent value under one determinant. The schema-inference /
    * data-contract check ("order_status is a function of order_key",
    * "one language per document id") run before denormalizing or
    * keying on the determinant.
    *
    * A null dependent value counts as a value of its own (two-level
    * groupBy, not `count(DISTINCT)` — a group holding {X, NULL}
    * genuinely has two observed states and IS a violation; SQL's
    * null-skipping count would hide it).
    *
    * Scale shape: one `groupBy(det, dep)` histogram (map-side
    * combined; exchange = distinct (det, dep) pairs) then a
    * det-keyed rollup — never a distinct-count window over raw rows.
    * Output: one row per VIOLATING determinant: (detCols...,
    * n_dep_values, n_rows). Empty result = the FD holds. */
  def fdViolations(df: DataFrame, detCols: Seq[String],
      depCol: String): DataFrame = {
    require(detCols.nonEmpty, "fdViolations needs determinant columns")
    val pairs = df
      .groupBy((detCols :+ depCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    pairs.groupBy(detCols.map(col): _*)
      .agg(count(lit(1)).as("n_dep_values"),
        sum(col("__cnt")).as("n_rows"))
      .filter(col("n_dep_values") > 1L)
  }

  def sourceReport(df: DataFrame, srcCol: String, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val base = df.filter(col(idCol).isNotNull).select(
      col(srcCol).as("source"), col(langCol).as("__lang"),
      length(t).cast("long").as("__chars"),
      regexp_count(lower(t), lit("[a-z0-9]+")).cast("long").as("__toks"),
      graft.ops.TextAnalysis.fingerprint(t).as("__fp"))
    val fpCounts = base.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__nfp"))
    base.join(fpCounts, Seq("__fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("n_chars"),
        sum(col("__toks")).as("n_tokens"),
        sum((col("__nfp") >= 2).cast("long")).as("n_dup_docs"),
        countDistinct(col("__lang")).as("n_langs"))
      .withColumn("dup_ppm", expr("n_dup_docs * 1000000 div n_docs"))
  }

  /** k-anonymity audit over quasi-identifier columns: every row's
    * equivalence class is the set of rows sharing its QI tuple, and a
    * class smaller than k re-identifies its members. One histogram
    * exchange (`groupBy(QIs).count`, map-side combined) then a
    * class-SIZE histogram — output is O(distinct class sizes), tiny
    * at any corpus scale. Null QI values form classes like any other
    * value (the repo's null-groups-are-groups convention): an absent
    * zip code is itself identifying. Complements [[uniquenessProfile]]
    * (per-column) — re-identification risk lives in the COMBINATION. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1)
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy(col("class_size"))
      .agg(count(lit(1)).cast("long").as("n_classes"))
      .withColumn("n_rows", col("class_size") * col("n_classes"))
      .withColumn("at_risk", (col("class_size") < k).cast("long"))
  }

  /** Leakage-free (out-of-fold) target encoding — the standard
    * high-cardinality categorical feature for tabular/ranker
    * training, built so a row NEVER sees its own fold's targets:
    * enc(cat, fold) = mean(target | cat, all folds except `fold`).
    * In-fold means leak the label (the q254/q302 audits detect it;
    * this is the constructive fix). Cells whose category only
    * occurs in the row's own fold fall back to the fold-excluded
    * GLOBAL mean (the prior).
    *
    * All arithmetic is integral: targets are summed as longs and
    * the mean is one `div` — engine-exact. Output is the
    * model-sized encoding TABLE (category, fold, n_in_fold, n_oof,
    * enc), one row per observed (category, fold); callers join it
    * onto rows. Scale: one (cat, fold) agg off the data, tiny
    * per-cat and global rollups off that — nothing row-sized ever
    * re-exchanges. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      foldCol: String): DataFrame = {
    val cells = df
      .filter(col(catCol).isNotNull && col(foldCol).isNotNull &&
        col(targetCol).isNotNull)
      .groupBy(col(catCol).as("category"), col(foldCol).as("fold"))
      .agg(count(lit(1)).as("n_in_fold"),
        sum(col(targetCol).cast("long")).as("__s"))
    val perCat = cells.groupBy(col("category"))
      .agg(sum(col("n_in_fold")).as("__cn"), sum(col("__s")).as("__cs"))
    val glob = cells.groupBy(col("fold"))
      .agg(sum(col("n_in_fold")).as("__fn"), sum(col("__s")).as("__fs"))
      .crossJoin(broadcast(cells.agg(sum(col("n_in_fold")).as("__tn"),
        sum(col("__s")).as("__ts"))))
      .select(col("fold"), (col("__tn") - col("__fn")).as("__gn"),
        (col("__ts") - col("__fs")).as("__gs"))
    cells.join(perCat, Seq("category")).join(glob, Seq("fold"))
      .select(col("category"), col("fold"), col("n_in_fold"),
        (col("__cn") - col("n_in_fold")).as("n_oof"),
        when(col("__cn") - col("n_in_fold") > 0,
          expr("(__cs - __s) div (__cn - n_in_fold)"))
          .otherwise(when(col("__gn") > 0, expr("__gs div __gn"))
            .otherwise(lit(null).cast("long"))).as("enc"))
  }

  /** Cross-source quantile normalization — map each row's score to
    * the GLOBAL score at the same within-group quantile, so
    * heterogeneous sources become comparable before one corpus-wide
    * threshold (per-source score scales are the classic trap when
    * mixing crawls: source A's "p90 quality" must mean the same as
    * source B's). Midpoint quantile q_ppm = (2r−1)·1e6 div 2n over
    * the within-group row_number r (ties broken by `tieCol` — a
    * total order, so reproducible); the normalized value is the
    * global k-th order statistic at k = q_ppm·N div 1e6 + 1.
    *
    * Exactness and scale: within-group ranks ride group-partitioned
    * windows (groups bound the partition); the global order
    * statistics ride [[Ranking.withGlobalIndex]] over the DISTINCT
    * value histogram + the distributed running total — no global
    * row sort, no single-task window; the rank→value lookup is a
    * range join against the value-bounded histogram. Output: input
    * columns' keys + (q_ppm, norm). */
  def quantileNormalize(df: DataFrame, groupCol: String,
      scoreCol: String, tieCol: String): DataFrame = {
    val base = df.filter(col(scoreCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(tieCol).as("__t"),
        col(scoreCol).cast("long").as("__v"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__v"), col("__t"))
    val ranked = base
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("__g"))))
      .withColumn("q_ppm", expr("((2 * __r - 1) * 1000000) div (2 * __n)"))
    // global order statistics from the compacted value histogram
    val hist = base.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val cum = Ranking.withRunningTotal(hist, Seq(col("__v")), "__c",
      "__lo") // exclusive prefix: ranks (__lo, __lo+__c] hold __v
    val total = base.count()
    val target = ranked.withColumn("__k",
      least(expr(s"(q_ppm * ${total}L) div 1000000") + 1L, lit(total)))
    target.join(cum,
        col("__k") > col("__lo") && col("__k") <= col("__lo") + col("__c"))
      .select(col("__g").as(groupCol), col("__t").as(tieCol),
        target("__v").as(scoreCol), col("q_ppm"),
        cum("__v").as("norm"))
  }

  /** ANALYZE-style per-column statistics in ONE table scan — the
    * stats row a cost-based optimizer / snapshot-store manifest
    * wants per column: row count, null count, exact NDV, and the
    * KMV distinct sketch (count + k-th min hash + estimate, the
    * [[Sketch.kmvEstimate]] state) so readers can choose between
    * the exact number and the mergeable sketch path.
    *
    * Scale shape: `stack` unpivots the projected columns in one
    * Generate over one scan (vs one scan per column); everything
    * downstream groups on the column name — exchange bounded by
    * (columns × distinct values) for the NDV agg, columns × k for
    * the sketch. Values are hashed/compared AS STRINGS (the cast is
    * injective for the integer/string columns this targets;
    * document the cast when analyzing floats). Exact NDV of a
    * high-cardinality column is the one genuinely corpus-sized
    * aggregation — that is what the sketch columns are for at
    * 100 TB; both ship so the caller can reconcile them.
    *
    * Output: (column, n_rows, n_nulls, ndv, kmv_n, kth_min,
    * est_distinct), one row per analyzed column. */
  def analyzeTable(df: DataFrame, cols: Seq[String],
      k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "analyzeTable needs at least one column")
    require(k >= 2, s"k must be >= 2 (got $k)")
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)")
      .mkString(", ")
    val up = df.select(
      expr(s"stack(${cols.size}, $stackArgs)").as(Seq("col_name", "val")))
    val basic = up.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col("val")).as("ndv"))
    val kmv = Sketch.kmvEstimate(up.filter(col("val").isNotNull),
      Seq("col_name"), "val", k)
    basic.join(kmv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        coalesce(col("kmv_n"), lit(0L)).as("kmv_n"), col("kth_min"),
        coalesce(col("est_distinct").cast("long"), lit(0L))
          .as("est_distinct"))
  }

  /** l-diversity audit — the sensitive-attribute companion to
    * [[kAnonymity]]: a class of indistinguishable quasi-identifier
    * rows is still a disclosure if everyone in it shares the same
    * sensitive value (the "homogeneity attack" k-anonymity misses).
    * Reports the equivalence-class histogram keyed by DISTINCT
    * sensitive values per class: (diversity, n_classes, n_rows,
    * at_risk) with at_risk = 1 where diversity < l.
    *
    * Scale: two hash aggregations (classes, then the
    * class-cardinality histogram) — the first is bounded by distinct
    * QI combinations, the second by the sensitive-domain size. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty && l >= 1)
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensCol)).as("diversity"))
    classes.groupBy(col("diversity"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("at_risk", (col("diversity") < l).cast("long"))
  }

  /** Differentially-private per-key counts, exactly reproducible
    * given `seed` — the governance release an aggregate leaves the
    * data boundary through (per-domain doc counts to a dashboard,
    * per-source token tallies to a paper) when the raw histogram
    * would leak membership.
    *
    * Mechanism (all integer, bit-for-bit cross-engine):
    *  - Contribution bounding: each `unitCol` value contributes at
    *    most `clip` rows to each key group (`least(cnt, clip)` over
    *    the per-(unit,key) histogram) — unit-level sensitivity ≤
    *    clip. Two map-side-combined exchanges, no windows.
    *  - Noise: clip-scaled difference of two Geom(1/2) draws,
    *    `z = clip·(g1 − g2)`, where g = leading zeros of a 60-bit
    *    integer cut from md5(seed:key) — P(g=j) = 2^-(j+1), so
    *    g1−g2 is the exact discrete Laplace with ratio 2 per step.
    *    Adjacent datasets (one unit added/removed) shift a key's
    *    clipped sum by ≤ clip = one noise step, so the per-key
    *    release is ε-DP with ε = ln 2. No floats, no ln/exp — the
    *    geometric inverse-CDF IS the bit length, `60 − length(bin(u))`,
    *    identical in Spark and DuckDB.
    *
    * Per-key ε composes across the released keys a unit can touch;
    * callers bound that (e.g. one unit ⇒ few domains) or account for
    * it. Noise std is clip·2 — the price of exact dyadic sampling. */
  def dpGroupCounts(df: DataFrame, keyCols: Seq[String],
      unitCol: String, clip: Int, seed: String): DataFrame = {
    require(keyCols.nonEmpty && clip >= 1)
    val perUnit = df.groupBy((unitCol +: keyCols).map(col): _*)
      .agg(least(count(lit(1)), lit(clip.toLong)).as("__c"))
    val clipped = perUnit.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("__true"))
    // one md5 per key: chars 1-15 and 16-30 are two independent
    // 60-bit uniforms (the q236/q261 draw-splitting discipline)
    val keyTag = concat_ws("",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val h = md5(concat(lit(s"$seed:"), keyTag))
    def geo(u: Column): Column =
      when(u === 0L, lit(60L)).otherwise(lit(60L) - length(bin(u)))
    val u1 = conv(substring(h, 1, 15), 16, 10).cast("long")
    val u2 = conv(substring(h, 16, 15), 16, 10).cast("long")
    clipped
      .withColumn("noised_count",
        col("__true") + lit(clip.toLong) * (geo(u1) - geo(u2)))
      .drop("__true")
  }

  /** Differentially-private per-key SUMS — [[dpGroupCounts]]' value
    * release: each unit's per-key contribution is first summed then
    * CLAMPED to [−clip, clip] (unit-level sensitivity ≤ clip for
    * add/remove-a-unit adjacency), and the clipped key total is
    * released with the same exact dyadic discrete-Laplace noise,
    * scaled by clip: z = clip·(g1 − g2) with g the md5-derived
    * Geom(1/2) draws. ε = ln 2 per key release, all integer, bit-
    * reproducible in any engine. Output: keyCols + noised_sum. */
  def dpGroupSums(df: DataFrame, keyCols: Seq[String], unitCol: String,
      valueCol: String, clip: Long, seed: String): DataFrame = {
    require(keyCols.nonEmpty && clip >= 1)
    val perUnit = df.groupBy((unitCol +: keyCols).map(col): _*)
      .agg(sum(col(valueCol).cast("long")).as("__s0"))
      .withColumn("__s",
        greatest(least(col("__s0"), lit(clip)), lit(-clip)))
    val clipped = perUnit.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__s")).cast("long").as("__true"))
    val keyTag = concat_ws("",
      keyCols.map(c => coalesce(col(c).cast("string"), lit(" "))): _*)
    val h = md5(concat(lit(s"$seed:"), keyTag))
    def geo(u: Column): Column =
      when(u === 0L, lit(60L)).otherwise(lit(60L) - length(bin(u)))
    val u1 = conv(substring(h, 1, 15), 16, 10).cast("long")
    val u2 = conv(substring(h, 16, 15), 16, 10).cast("long")
    clipped
      .withColumn("noised_sum",
        col("__true") + lit(clip) * (geo(u1) - geo(u2)))
      .drop("__true")
  }

  /** Krippendorff's alpha for NOMINAL labels with a fixed panel of
    * `raters` judges per item — the multi-rater agreement number a
    * labeling pipeline reports where Cohen's kappa (q244) stops at
    * two raters. Complete-case convention: items without exactly
    * `raters` single-labeled judges are excluded (duplicate
    * (item, rater) labels make an item incomplete, not an error).
    * With m raters, I complete items, N = mI, per-item value counts
    * n_iv and global counts n_v:
    *   Do = Σ n_iv(m−n_iv) / (N(m−1)),  De = Σ n_v(N−n_v) / (N(N−1))
    *   alpha = 1 − Do/De = 1 − A(N−1) / ((m−1)B)
    * — a single exact rational, published as a ppm FLOOR computed in
    * pure long arithmetic (`div` on an exactly-divisible numerator;
    * the pmod subtraction makes it a true floor for negative alpha,
    * which truncating division would round the wrong way). All-same
    * labels ⇒ De = 0 ⇒ alpha undefined ⇒ null. Long-safe to
    * N ≈ 1e6 labels (runtime-enforced); the exchanges are the item-
    * and label-keyed aggs, nothing row-count-squared. */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
      raterCol: String, labelCol: String, raters: Int): DataFrame = {
    require(raters >= 2, s"need >= 2 raters per item, got $raters")
    val m = raters.toLong
    val labels = df.select(col(itemCol).as("__i"),
      col(raterCol).as("__r"), col(labelCol).as("__l"))
      .filter(col("__i").isNotNull && col("__r").isNotNull &&
        col("__l").isNotNull)
    val kept = labels.groupBy(col("__i"))
      .agg(count(lit(1)).as("__rows"),
        count_distinct(col("__r")).as("__rt"))
      .filter(col("__rows") === m && col("__rt") === m)
      .select(col("__i"))
    val niv = labels.join(kept, "__i")
      .groupBy(col("__i"), col("__l"))
      .agg(count(lit(1)).cast("long").as("n_iv"))
    val ai = niv.agg(
      sum(col("n_iv") * (lit(m) - col("n_iv"))).cast("long").as("a"),
      count_distinct(col("__i")).as("i"))
    val b = niv.groupBy(col("__l"))
      .agg(sum(col("n_iv")).cast("long").as("n_v"))
      .crossJoin(ai.select((lit(m) * col("i")).as("__n")))
      .agg(sum(col("n_v") * (col("__n") - col("n_v")))
        .cast("long").as("b"))
    ai.crossJoin(b)
      .withColumn("i", when(col("i") * m > 1000000L, raise_error(
        lit("krippendorffAlpha is long-safe to N = m*items <= 1e6")))
        .otherwise(col("i")))
      .withColumn("__num", lit(1000000L) *
        (lit(m - 1) * col("b") - col("a") * (lit(m) * col("i") - 1)))
      .withColumn("__den", lit(m - 1) * col("b"))
      .withColumn("alpha_ppm",
        when(col("b") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(__num - pmod(__num, __den)) div __den")))
      .select(col("i").as("n_items"), col("a").as("disagree_sum"),
        col("alpha_ppm"))
  }

  /** Unbiased pass@k over per-task attempt outcomes (Chen et al.
    * 2021, arXiv 2107.03374 §2.1 — the HumanEval estimator):
    * pass@k = 1 − C(n−c, k)/C(n, k), the expectation over k-subsets
    * of a task's n attempts of "at least one passes"; the naive
    * 1 − (1 − c/n)^k is biased. Exact integer arithmetic end to end:
    * binomials via falling factorials (long-safe for n ≤ 30,
    * runtime-enforced; k ≤ 10), the ppm result an exact integral
    * division — no float anywhere, so any engine reproduces it
    * bit-identically. One scan, one agg, all ks share it; the only
    * exchange is the task-keyed groupBy. */
  def passAtK(df: DataFrame, taskCol: String, passCol: Column,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 10),
      s"ks must sit in [1, 10] (long-safe binomials), got $ks")
    val agg = df.groupBy(col(taskCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(passCol, 1L).otherwise(0L)).as("c"))
      .withColumn("n", when(col("n") > 30, raise_error(concat(
        lit("passAtK needs n <= 30 attempts per task (long-safe "),
        lit("binomials); got "), col("n").cast("string"))))
        .otherwise(col("n")))
    // x and y are exactly-divisible longs well under 2^53, so the
    // double division is exact (pmod strips any remainder first)
    def exactDiv(x: Column, y: Column): Column =
      ((x - pmod(x, y)) / y).cast("long")
    // C(top, k): the k-term falling factorial hits a zero factor
    // whenever top < k (top is never negative here), so the binomial
    // is naturally 0 without a guard
    def binom(top: Column, k: Int): Column =
      exactDiv((0 until k).map(i => top - lit(i.toLong)).reduce(_ * _),
        lit((1 to k).map(_.toLong).product))
    ks.foldLeft(agg) { (acc, k) =>
      val den = binom(col("n"), k)
      val num = binom(col("n") - col("c"), k)
      acc.withColumn(s"pass_at_$k",
        when(col("n") < k, lit(null).cast("long"))
          .otherwise(exactDiv(lit(1000000L) * (den - num), den)))
    }
  }

  /** Bradley–Terry preference strengths from a directed win table —
    * the aggregation step of pairwise human/model preference data
    * (RLHF comparisons, arena-style eval): given `n` games won by
    * `winnerCol` over `loserCol`, estimate per-item strengths p_i
    * under P(i beats j) = p_i / (p_i + p_j) by the standard MM fixed
    * point  p_i ← W_i / Σ_j n_ij / (p_i + p_j)  (Hunter 2004),
    * run for `iters` rounds from the uniform start.
    *
    * The iteration runs in SCALED INTEGER arithmetic (fixed point at
    * `scale`): term_j = (n_ij·scale²) div (P_i + P_j), P'_i =
    * (W_i·scale²) div Σ term_j — every step is exact 64-bit integer
    * math, so the result is bit-reproducible across engines and
    * partitionings (float Σ would depend on reduction order). A
    * guard rejects inputs where W_i·scale² could overflow a long.
    *
    * Scale design: items × opponents is the model-sized pair table
    * (k² for k items), NOT the game log — the caller aggregates raw
    * games down to (winner, loser, n) first (one shuffle on the
    * pair). Rounds are hash joins + one sum per item on that table;
    * k can reach millions before any stage is large.
    *
    * Output: (item, games, wins, rating) — rating is the strength
    * normalized to Σ = 1, in ppm (floor((P_i·1e6) / ΣP)). Items with
    * zero wins rate 0 (the MLE boundary). */
  def bradleyTerry(winTable: DataFrame, winnerCol: String,
      loserCol: String, nCol: String, iters: Int = 5,
      scale: Long = 10000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in [1,20], got $iters")
    require(scale >= 1000L && scale <= 100000000L,
      s"scale in [1e3,1e8], got $scale")
    val s2 = scale * scale
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // pin = persisted InternalRow RDD + rewrap (the Dedup.clusters
    // lineage-truncation idiom): every MM round references pairs,
    // items and the previous ratings SEVERAL times, so a lazy
    // lineage re-runs the caller's pair-generation pipeline an
    // exponential-in-rounds number of times (measured 19 s at sf0.1
    // for a 5-item table; pinned: ~1 s). ContextCleaner unpersists
    // the pins once the result is unreferenced.
    def pin(df: DataFrame): DataFrame = {
      val rdd = ColumnBridge.internalRdd(df).map(_.copy())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ColumnBridge.internalCreateDataFrame(df, rdd, df.schema)
    }
    val directed = winTable.select(col(winnerCol).as("__w"),
      col(loserCol).as("__l"), col(nCol).cast("long").as("__n"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l") && col("__n") > 0)
    // symmetric games table + per-item win totals
    val pairs = pin(directed
      .select(col("__w").as("__i"), col("__l").as("__j"), col("__n"))
      .union(directed.select(col("__l").as("__i"), col("__w").as("__j"),
        col("__n")))
      .groupBy(col("__i"), col("__j")).agg(sum(col("__n")).as("__nij")))
    val items = pin(pairs.groupBy(col("__i"))
      .agg(sum(col("__nij")).as("__games"))
      .join(directed.groupBy(col("__w").as("__i"))
        .agg(sum(col("__n")).as("__wins")), Seq("__i"), "left")
      .withColumn("__wins", coalesce(col("__wins"), lit(0L))))
    val maxW = items.agg(max(col("__wins"))).head().getLong(0)
    require(maxW <= Long.MaxValue / s2,
      s"bradleyTerry: max wins $maxW overflows at scale $scale — " +
        "lower `scale` or pre-aggregate items")
    var r = items.select(col("__i"), lit(scale).as("__p"))
    for (_ <- 1 to iters) {
      val den = pairs
        .join(r.select(col("__i"), col("__p").as("__pi")), Seq("__i"))
        .join(r.select(col("__i").as("__j"), col("__p").as("__pj")),
          Seq("__j"))
        .select(col("__i"), call_function("div",
          col("__nij") * lit(s2), col("__pi") + col("__pj")).as("__t"))
        .groupBy(col("__i")).agg(sum(col("__t")).as("__den"))
      r = pin(items.join(den, Seq("__i"), "left")
        .select(col("__i"),
          when(col("__den").isNull || col("__den") === 0, lit(0L))
            .otherwise(call_function("div",
              col("__wins") * lit(s2), col("__den"))).as("__p")))
    }
    val tot = r.agg(sum(col("__p")).as("__tot"))
    items.join(r, Seq("__i")).crossJoin(broadcast(tot))
      .select(col("__i").as("item"), col("__games").as("games"),
        col("__wins").as("wins"),
        call_function("div", col("__p") * lit(1000000L), col("__tot"))
          .as("rating"))
  }

  /** Split-conformal calibration over a discrete score — the
    * distribution-free coverage guarantee for a quality/anomaly
    * score: on the calibration slice (`calibFlag` true) take the
    * k-th smallest score with k = ⌈(n_cal+1)·(1−α)⌉; scores ≤ that
    * threshold then cover ≥ 1−α of exchangeable held-out points.
    * Reports the realized held-out coverage next to the guarantee.
    *
    * Exactness: k and the threshold are integer order statistics via
    * the two-level histogram (groupBy(score).count + the distributed
    * running total — never a global sort of rows); coverage is an
    * integral-div ppm. When k exceeds n_cal (α too small for the
    * slice) the threshold is NULL = +∞ and coverage is 1e6 by
    * definition.
    *
    * Output (one row): n_cal, k, thr, n_test, cov_ppm. */
  def conformal(df: DataFrame, scoreCol: String, calibFlag: Column,
      alphaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm >= 1L && alphaPpm < 1000000L,
      s"alphaPpm in [1, 1e6), got $alphaPpm")
    val scored = df.select(col(scoreCol).cast("long").as("__s"),
        calibFlag.as("__cal"))
      .filter(col("__s").isNotNull)
    val calHist = scored.filter(col("__cal"))
      .groupBy(col("__s")).agg(count(lit(1)).as("__cnt"))
    val cum = Ranking.withRunningTotal(calHist, Seq(col("__s")),
      "__cnt", "__cum")
    val nCal = scored.filter(col("__cal")).count()
    val k = ((nCal + 1L) * (1000000L - alphaPpm) + 999999L) / 1000000L
    val thr: Option[Long] =
      if (k > nCal) None
      else Some(cum.filter(col("__cum") < k && lit(k) <= col("__cum") +
          col("__cnt"))
        .agg(min(col("__s"))).head().getLong(0))
    val test = scored.filter(!col("__cal"))
    val agg = test.agg(count(lit(1)).as("__n"),
      sum(when(thr.map(t => col("__s") <= t).getOrElse(lit(true)),
        1L).otherwise(0L)).as("__cov")).head()
    val (nTest, nCov) = (agg.getLong(0), agg.getLong(1))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((nCal, k, thr, nTest,
      if (nTest == 0) 1000000L else 1000000L * nCov / nTest))
      .toDF("n_cal", "k", "thr", "n_test", "cov_ppm")
  }
  /** Bottom-up mergesort of `a` IN PLACE that returns its inversion
    * count (pairs i < j with a(i) > a(j)) — the per-partition
    * Kendall kernel. One scratch array, no per-row boxing: 16
    * bytes/row peak, the figure [[kendallStats]]' scaladoc quotes. */
  private[ops] def sortCountingInversions(a: Array[Long]): Long = {
    val n = a.length
    val buf = new Array[Long](n)
    var inv = 0L
    var width = 1
    var src = a; var dst = buf
    while (width < n) {
      var lo = 0
      while (lo < n) {
        val mid = math.min(lo + width, n)
        val hi = math.min(lo + 2 * width, n)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (src(i) <= src(j)) { dst(k) = src(i); i += 1 }
          else { dst(k) = src(j); j += 1; inv += mid - i }
          k += 1
        }
        while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
        while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
        lo = hi
      }
      val t = src; src = dst; dst = t
      width *= 2
    }
    if (!(src eq a)) System.arraycopy(src, 0, a, 0, n)
    inv
  }

  /** #pairs (x ∈ a, y ∈ b) with x > y — both ascending, one
    * two-pointer pass. */
  private[ops] def sortedGreaterCount(a: Array[Long],
      b: Array[Long]): Long = {
    var i = 0; var j = 0; var c = 0L
    while (j < b.length) {
      while (i < a.length && a(i) <= b(j)) i += 1
      c += a.length - i
      j += 1
    }
    c
  }

  /** Merge two ascending arrays into one ascending array. */
  private[ops] def mergeAscending(a: Array[Long],
      b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { out(k) = a(i); i += 1 }
      else { out(k) = b(j); j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    out
  }

  /** Exact Kendall rank-correlation sufficient statistics — the
    * filter-agreement audit ("does the NEW quality scorer rank
    * documents like the old one?") as pure integers. Output (one
    * row): `n`, `n_pairs` = C(n,2), `tx`/`ty`/`txy` = pairs tied on
    * x / y / both, `nc` concordant, `nd` discordant — everything
    * tau-b, tau-a, or Goodman–Kruskal gamma needs, with no float in
    * the contract (the repo's q49 exact-moments doctrine: ship the
    * integer sufficient statistics, let the caller divide).
    *
    * Scale design — the O(n²) pair definition computed in
    * O(n log n) work and ONE range exchange:
    *  1. range-partition by (x, y): partitions are totally ordered,
    *     tied keys never split;
    *  2. per partition, a sortWithinPartitions feeds a mapPartitions
    *     mergesort kernel ([[sortCountingInversions]]): the
    *     (x,y)-ascending y-sequence's INVERSIONS are exactly its
    *     strict-x discordant pairs (tied-x pairs sit y-ascending —
    *     zero contribution), and the same sort leaves the
    *     merge-ready ascending array;
    *  3. across partitions p < q (all x_p ≤ x_q, ties y-ascending so
    *     tied-x cross pairs never count), discordant pairs =
    *     y_p > y_q counts. Because that count is additive over
    *     multiset union, partitions first fold in pid order into
    *     GROUPS of `mergeGroup` (within-group cross pairs counted as
    *     each member merges in; 0 = auto picks max(1, parts/8) — the
    *     fold is an extra full exchange, only worth paying when it
    *     shrinks a big grid), then the pair grid runs over the
    *     ⌈P/g⌉ merged arrays via the sorted two-pointer merge
    *     ([[graft.codecs.SortedMergeGreater]]) — exchange volume
    *     n·P/g instead of the ungrouped grid's n·P;
    *  4. ties by groupBy histograms; nc by inclusion–exclusion:
    *     nc = C(n,2) − tx − ty + txy − nd.
    * The counts are partition-layout-invariant (any split of a
    * sorted order yields the same pair totals), so the output is
    * deterministic even though range boundaries are sampled.
    *
    * Bounds, enforced — measured shapes, not aspirations:
    * per-partition tasks hold the y-array plus its mergesort
    * scratch, 16 bytes/row — ~50 MB/task at the `maxRows` = 1e8
    * default with parts = 32 (a 32-task wave ≈ 1.6 GB; NO
    * struct-list buffering anywhere — the rows stream straight into
    * a long array). Group-merge tasks hold `mergeGroup` member
    * arrays plus the merged copy: ≤ 2·g·(n/P)·8 bytes ≈ 200 MB at
    * the defaults. `maxRows` caps the input with a loud message
    * because a rank-correlation audit beyond that size should run
    * on a scored SAMPLE (the statistic's precision gains nothing
    * from the tail); `parts` ≤ 256 bounds the grid. The range key
    * carries a unique spread column after (x, y), so even a
    * CONSTANT scorer (the degenerate case this audit exists to
    * catch) splits evenly across partitions instead of collapsing
    * into one array — the tied-pair argument above is indifferent
    * to how tied groups split (equal (x,y) cross pairs count 0
    * under strict >). Columns must be integer-valued (the repo's
    * micro-scaled score convention) — floats would make the tie
    * counts engine-dependent. */
  def kendallStats(df: DataFrame, xCol: String, yCol: String,
      parts: Int = 32, maxRows: Long = 100000000L,
      mergeGroup: Int = 0): DataFrame = {
    require(parts >= 1 && parts <= 256, s"parts in [1,256], got $parts")
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    require(mergeGroup >= 0 && mergeGroup <= 256,
      s"mergeGroup in [0,256] (0 = auto), got $mergeGroup")
    // auto: the group fold is an EXTRA full exchange, worth paying
    // only when it shrinks a big grid — small part counts skip it
    val grp = if (mergeGroup > 0) mergeGroup else math.max(1, parts / 8)
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // error-path cache hygiene: any of the ~6 actions below can
    // fail, and a thrown job must not leave pts/arrs/hist pinned
    // for the session lifetime
    var arrsCache: Option[DataFrame] = None
    var histCache: Option[DataFrame] = None
    try {
    val n = pts.count() // also materializes the cache for the 4 jobs below
    require(n <= maxRows,
      s"kendallStats: $n rows > maxRows=$maxRows — exact rank " +
        "correlation at this size should run on a scored sample " +
        "(or raise maxRows explicitly)")
    val spark = df.sparkSession
    import spark.implicits._
    if (n < 2) {
      return Seq((n, 0L, 0L, 0L, 0L, 0L, 0L))
        .toDF("n", "n_pairs", "tx", "ty", "txy", "nc", "nd")
    }
    // __r spreads TIED keys across range partitions (a constant
    // column must not collapse into one partition-sized array); the
    // counts are invariant to its values, see scaladoc
    val parted = pts
      .withColumn("__r", monotonically_increasing_id())
      .repartitionByRange(parts, col("__x"), col("__y"), col("__r"))
      .sortWithinPartitions(col("__x"), col("__y"), col("__r"))
    // rows arrive (x, y, __r)-ascending: the y-sequence streams
    // straight into one long array per task (+ mergesort scratch,
    // 16 bytes/row peak), and the inversion count falls out of the
    // same sort that produces the merge-ready ascending array
    val perPart = parted.select(col("__y")).as[Long]
      .mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        while (it.hasNext) b += it.next()
        val ys = b.result()
        if (ys.isEmpty) Iterator.empty
        else Iterator.single(
          (org.apache.spark.TaskContext.getPartitionId(),
            sortCountingInversions(ys), ys))
      }
    // fold pid-contiguous partitions into groups (greater-counts are
    // additive over multiset union, so within-group cross pairs
    // accumulate as each member merges in) — the grid then runs over
    // ⌈P/g⌉ merged arrays, n·P/g exchange volume instead of n·P
    val grouped =
      if (grp == 1) perPart
      else perPart.groupByKey(_._1 / grp).mapGroups {
        (grpId, it) =>
          // pull (pid, array) pairs into a slot buffer and NULL each
          // slot as it folds in, so peak memory stays ≤ 2·group
          // bytes (acc + out at the final merge) — retaining the
          // tuple array would pin every member for a ~3× peak
          var cnt = 0L
          val slots = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Array[Long])]
          it.foreach { m => cnt += m._2; slots += ((m._1, m._3)) }
          slots.sortInPlaceBy(_._1)
          var acc = slots(0)._2
          slots(0) = null
          var i = 1
          while (i < slots.length) {
            val a = slots(i)._2
            slots(i) = null
            cnt += sortedGreaterCount(acc, a)
            acc = mergeAscending(acc, a)
            i += 1
          }
          (grpId, cnt, acc)
      }
    val arrs = grouped.toDF("__pid", "__loc", "__ss")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    arrsCache = Some(arrs)
    // the pair grid as an EXPLICIT pair-key equi-join: the grid ids
    // are driver-enumerated (≤ 256 by the parts bound — a bounded
    // collect), so the θ-join that would force either a full-array
    // broadcast (800 MB through the driver at maxRows) or a
    // cartesian's per-pair re-fetch becomes two shuffles whose
    // volume is the documented n·(G−1)/2 + n — AQE-planned,
    // skew-free (each grid id repeats ≤ G−1 times)
    // one G-row collect serves BOTH the local-inversion sum and the
    // grid id list (and materializes the arrs cache for the join)
    val meta = arrs.select(col("__pid"), col("__loc")).collect()
    val localTotal = meta.iterator.map(_.getLong(1)).sum
    val gridIds = meta.map(_.getInt(0)).sorted
    val gridPairs = gridIds.toSeq.flatMap(i =>
      gridIds.toSeq.filter(_ > i).map(j => (i, j)))
    val crossTotal: Long =
      if (gridPairs.isEmpty) 0L
      else gridPairs.toDF("__pa", "__pb")
        .join(arrs.select(col("__pid").as("__pa"),
          col("__ss").as("__sa")), Seq("__pa"))
        .join(arrs.select(col("__pid").as("__pb"),
          col("__ss").as("__sb")), Seq("__pb"))
        .agg(coalesce(sum(graft.functions.GraftFunctions
          .sortedMergeGreater(col("__sa"), col("__sb"))), lit(0L)))
        .head().getLong(0)
    // ONE value exchange serves all three tie counts: the (x,y)
    // histogram is value-domain-sized and tx/ty marginalize it with
    // domain-sized (not corpus-sized) follow-up aggregations
    val hist = pts.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    histCache = Some(hist)
    def choose2(c: String): Column =
      coalesce(sum(expr(s"$c * ($c - 1) div 2")), lit(0L))
    val txy = hist.agg(choose2("__c")).head().getLong(0)
    val tx = hist.groupBy(col("__x"))
      .agg(sum(col("__c")).as("__cx"))
      .agg(choose2("__cx")).head().getLong(0)
    val ty = hist.groupBy(col("__y"))
      .agg(sum(col("__c")).as("__cy"))
      .agg(choose2("__cy")).head().getLong(0)
    val nd = localTotal + crossTotal
    val nPairs = n * (n - 1) / 2
    Seq((n, nPairs, tx, ty, txy, nPairs - tx - ty + txy - nd, nd))
      .toDF("n", "n_pairs", "tx", "ty", "txy", "nc", "nd")
    } finally {
      histCache.foreach(_.unpersist())
      arrsCache.foreach(_.unpersist())
      pts.unpersist()
    }
  }
  /** Exact Spearman rank-correlation sufficient statistics — the
    * companion audit to [[kendallStats]]: correlation of the
    * tie-averaged RANK variables, shipped as the q49 exact-moments
    * integer six-pack (n, Σrx, Σry, Σrx·ry, Σrx², Σry²) over
    * DOUBLED average ranks (2·avgRank is always an integer:
    * 2·cumBefore + cnt + 1), so ρ = (n·sxy − sx·sy) /
    * √((n·sxx − sx²)(n·syy − sy²)) is one caller-side division away
    * with no float anywhere in the contract (the ×2 scaling cancels).
    *
    * Scale shape: two value HISTOGRAMS (groupBy(value).count — the
    * §exactPercentiles reduction, map-side combined, value-domain-
    * sized) each get their exclusive prefix via the distributed
    * scan ([[Ranking.withRunningTotal]] — never a global row sort),
    * then each corpus row joins its two rank literals (histogram
    * joins, AQE-broadcast at typical domains) and one aggregate
    * emits the six sums.
    *
    * `maxRows` is a HARD 1e6 ceiling, not advisory: with ranks ≤ 2n
    * the sum Σrx² is bounded by n·4n² = 4·10¹⁸ < 2⁶³ exactly at
    * n = 10⁶ — the cap is what makes the BIGINT contract sound.
    * Rank-correlation audits at larger n run on a scored sample
    * (same doctrine as [[kendallStats]]). */
  def spearmanStats(df: DataFrame, xCol: String, yCol: String,
      maxRows: Long = 1000000L): DataFrame = {
    require(maxRows >= 1 && maxRows <= 1000000L,
      s"maxRows in [1, 1e6] (the BIGINT-moment bound), got $maxRows")
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: the maxRows refusal below fires AFTER the persist
    // — without the guard a refused audit leaks the cached frame for
    // the session lifetime (the kendallStats hygiene pattern)
    try {
      val n = pts.count()
      require(n <= maxRows,
        s"spearmanStats: $n rows > maxRows=$maxRows — run the audit " +
          "on a scored sample (the BIGINT moment bound is hard)")
      val spark = df.sparkSession
      import spark.implicits._
      if (n < 1)
        return Seq((0L, 0L, 0L, 0L, 0L, 0L))
          .toDF("n", "sx", "sy", "sxy", "sxx", "syy")
      def rank2(c: String, out: String): DataFrame =
        doubledRanksFromHist(
          pts.groupBy(col(c)).agg(count(lit(1)).as("__cnt")), c)
          .withColumnRenamed("__r2", out)
      val joined = pts
        .join(rank2("__x", "__rx"), Seq("__x"))
        .join(rank2("__y", "__ry"), Seq("__y"))
      val r = joined.agg(
        sum(col("__rx")).as("sx"), sum(col("__ry")).as("sy"),
        sum(col("__rx") * col("__ry")).as("sxy"),
        sum(col("__rx") * col("__rx")).as("sxx"),
        sum(col("__ry") * col("__ry")).as("syy")).head()
      Seq((n, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
        .toDF("n", "sx", "sy", "sxy", "sxx", "syy")
    } finally pts.unpersist()
  }

  /** Doubled tie-averaged ranks from a value HISTOGRAM
    * (`(valCol, __cnt)` rows): 2·avgRank = 2·cumBefore + cnt + 1 —
    * always a BIGINT — with the exclusive prefix from the
    * [[Ranking.withRunningTotal]] distributed scan, never a global
    * row sort. THE cross-engine tie-rank contract shared by
    * [[spearmanStats]], [[kruskalStats]] and [[wilcoxonStats]];
    * every oracle mirrors this exact expression. */
  private def doubledRanksFromHist(hist: DataFrame,
      valCol: String): DataFrame =
    Ranking.withRunningTotal(hist, Seq(col(valCol)), "__cnt", "__cum")
      .select(col(valCol),
        (lit(2L) * col("__cum") + col("__cnt") + 1L).as("__r2"))

  /** Pooled tie term Σ(t³−t) over a value histogram — the variance
    * correction shared by the rank-statistics family. */
  private def tieCubesOf(hist: DataFrame): Long =
    hist.agg(coalesce(
      sum(col("__cnt") * col("__cnt") * col("__cnt") - col("__cnt")),
      lit(0L))).head().getLong(0)

  /** Exact Kruskal–Wallis rank sums — the k-group generalization of
    * the q330/q331 rank-audit family: pooled tie-averaged ranks of
    * `valueCol` (DOUBLED, so 2·avgRank = 2·cumBefore + cnt + 1 is
    * always a BIGINT) summed per `groupCol` group, plus the pooled
    * tie term Σ(t³−t). From the output row set the caller derives
    * H = [12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)] / [1 − Σ(t³−t)/(n³−n)]
    * with one division (the ×2 rank scaling cancels), and for the
    * two-group case the Mann–Whitney U: 2·U_g = r2_sum_g − n_g(n_g+1)
    * — both with no float anywhere in the engine/oracle contract.
    *
    * Scale shape: ONE pooled value histogram (`groupBy(value).count`,
    * map-side combined, value-domain-sized), exclusive prefix via the
    * [[Ranking.withRunningTotal]] distributed scan (never a global
    * row sort), a histogram join to attach each row's rank literal
    * (AQE-broadcast at typical domains), and one per-group aggregate.
    * The 1e6 `maxRows` cap is the hard BIGINT bound of Σ(t³−t) ≤ n³,
    * not advisory — larger audits run on a scored sample (same
    * doctrine as [[spearmanStats]]). */
  def kruskalStats(df: DataFrame, groupCol: String, valueCol: String,
      maxRows: Long = 1000000L): DataFrame = {
    require(maxRows >= 1 && maxRows <= 1000000L,
      s"maxRows in [1, 1e6] (the BIGINT tie-term bound), got $maxRows")
    val pts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: the maxRows refusal fires after the persist —
    // guard both caches so a refused audit cannot leak them
    var hist: DataFrame = null
    try {
      val n = pts.count()
      require(n <= maxRows,
        s"kruskalStats: $n rows > maxRows=$maxRows — run the audit " +
          "on a scored sample (the BIGINT tie-term bound is hard)")
      hist = pts.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ranks = doubledRanksFromHist(hist, "__v")
      val tieCubes = tieCubesOf(hist)
      pts.join(ranks, Seq("__v"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("__r2")).as("r2_sum"))
        .withColumn("n", lit(n))
        .withColumn("tie_cubes", lit(tieCubes))
      // caches only served the scalar actions above; the returned
      // plan re-derives from source (pushdown-friendly) when evaluated
    } finally {
      if (hist != null) hist.unpersist()
      pts.unpersist()
    }
  }

  /** Exact Wilcoxon signed-rank sufficient statistics — the PAIRED
    * companion to [[kruskalStats]]: given one signed difference per
    * subject, rank the nonzero |d| with tie-averaged DOUBLED ranks
    * (2·avgRank = 2·cumBefore + cnt + 1, always a BIGINT) and emit
    * n_nonzero, n_zero, w2_plus (doubled rank sum over d > 0),
    * w2_minus, and the tie term Σ(t³−t) over the |d| histogram —
    * W, the normal-approximation z, and the tie-corrected variance
    * are caller-side divisions with no float in the contract
    * (w2_plus + w2_minus = 2·Σranks = n(n+1)·2/2 doubled, a built-in
    * consistency check).
    *
    * Scale shape: one |d| histogram (`groupBy`, map-side combined,
    * domain-sized), exclusive prefix via [[Ranking.withRunningTotal]],
    * histogram join, one aggregate — identical shape to
    * [[kruskalStats]], same hard 1e6 BIGINT cap. */
  def wilcoxonStats(df: DataFrame, diffCol: String,
      maxRows: Long = 1000000L): DataFrame = {
    require(maxRows >= 1 && maxRows <= 1000000L,
      s"maxRows in [1, 1e6] (the BIGINT tie-term bound), got $maxRows")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.filter(col(diffCol).isNotNull)
      .select(col(diffCol).cast("long").as("__d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: the maxRows refusal fires after the persist
    var hist: DataFrame = null
    try {
      val n = pts.count()
      require(n <= maxRows,
        s"wilcoxonStats: $n rows > maxRows=$maxRows — run the audit " +
          "on a scored sample (the BIGINT tie-term bound is hard)")
      val nz = pts.filter(col("__d") =!= 0L)
        .select(abs(col("__d")).as("__a"),
          when(col("__d") > 0L, 1L).otherwise(0L).as("__pos"))
      hist = nz.groupBy(col("__a")).agg(count(lit(1)).as("__cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ranks = doubledRanksFromHist(hist, "__a")
      val tieCubes = tieCubesOf(hist)
      val r = nz.join(ranks, Seq("__a"))
        .agg(count(lit(1)).as("nn"),
          coalesce(sum(when(col("__pos") === 1L, col("__r2"))
            .otherwise(0L)), lit(0L)).as("wp"),
          coalesce(sum(when(col("__pos") === 0L, col("__r2"))
            .otherwise(0L)), lit(0L)).as("wm")).head()
      Seq((r.getLong(0), n - r.getLong(0), r.getLong(1), r.getLong(2),
        tieCubes))
        .toDF("n_nonzero", "n_zero", "w2_plus", "w2_minus", "tie_cubes")
    } finally {
      if (hist != null) hist.unpersist()
      pts.unpersist()
    }
  }

  /** Exact Kaplan–Meier risk table — the survival-analysis audit a
    * retention pipeline needs, shipped as integer sufficient
    * statistics per distinct duration: subjects at risk (duration ≥
    * d), events at d, censored at d. The survival curve is the
    * caller-side running product Π(1 − d_i/r_i); emitting the
    * integer (r, d, c) triples instead keeps floats out of the
    * engine/oracle contract entirely.
    *
    * Input is one row per SUBJECT. Scale shape: a duration histogram
    * (`groupBy(duration)`, map-side combined, duration-domain-sized),
    * exclusive prefix via the [[Ranking.withRunningTotal]]
    * distributed scan — at_risk(d) = n − cumBefore(d) — never a
    * global row sort, no row cap needed (everything after the first
    * reduction is histogram-sized). */
  def kmRiskTable(df: DataFrame, durCol: String,
      eventCol: String): DataFrame = {
    val subj = df
      .filter(col(durCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durCol).cast("long").as("duration"),
        col(eventCol).cast("long").as("__e"))
    val hist = subj.groupBy(col("duration"))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col("__e") =!= 0L, 1L).otherwise(0L)).as("n_event"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: a failed census action must not leak the cache
    try {
      val n = hist.agg(coalesce(sum(col("__cnt")), lit(0L)))
        .head().getLong(0)
      Ranking
        .withRunningTotal(hist, Seq(col("duration")), "__cnt", "__cum")
        .select(col("duration"),
          (lit(n) - col("__cum")).as("n_at_risk"),
          col("n_event"),
          (col("__cnt") - col("n_event")).as("n_censored"))
    } finally hist.unpersist()
  }

  /** Inclusion-dependency (foreign-key) audit — schema discovery for
    * tables that arrive without declared constraints: for each
    * candidate child.fk → parent.pk, the count of distinct non-null
    * child values and how many of them exist on the parent side;
    * `holds` = 1 iff containment is total. The deliverable of a
    * profiling pass that decides which joins are safe to rely on.
    *
    * Scale shape per candidate: two `distinct()` reductions
    * (map-side combined, key-domain-sized — never the corpus) and
    * one left join between the DISTINCT frames (AQE broadcasts the
    * parent side when it is dimension-sized); results union into a
    * candidates-count frame. Values audit as strings so the check is
    * type-agnostic (a LONG fk against a STRING pk is itself a
    * finding — the cast makes it containment-visible, not an error). */
  def inclusionDependencies(
      cands: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(cands.nonEmpty, "inclusionDependencies needs candidates")
    cands.map { case (nm, child, fk, parent, pk) =>
      val f = child.filter(col(fk).isNotNull)
        .select(col(fk).cast("string").as("__v")).distinct()
      val p = parent.filter(col(pk).isNotNull)
        .select(col(pk).cast("string").as("__v")).distinct()
        .withColumn("__hit", lit(1L))
      f.join(p, Seq("__v"), "left")
        .agg(count(lit(1)).as("n_distinct"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_contained"))
        .select(lit(nm).as("candidate"), col("n_distinct"),
          col("n_contained"),
          (col("n_distinct") === col("n_contained")).cast("long")
            .as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Exact t-closeness numerators — the third leg of the privacy
    * audit family ([[kAnonymity]], [[lDiversity]]): for each
    * quasi-identifier group, the ordered earth-mover's distance
    * between the group's distribution of an ORDERED sensitive
    * attribute and the global one, as an exact integer numerator.
    * With m sensitive levels, EMD = (1/(m−1))·Σ_j |P≤j − Q≤j|; on
    * counts that is emd_num / (n_g·n·(m−1)) where
    * emd_num = Σ_j |cumG_j·n − cum_j·n_g| — pure BIGINT, so the
    * t-threshold check t̂ ≤ t is an integer cross-multiplication on
    * the caller side with no float in the contract.
    *
    * Scale shape: sensitive-level histograms (`groupBy`, map-side
    * combined), a groups×levels grid built by cross join with the
    * m-level frame (m is `require`-capped — the grid is G·m rows,
    * linear in the number of QI groups), per-group cumulative sums
    * via a window PARTITIONED by the QI key (parallel; the only
    * unpartitioned window runs on the m-row level frame). Levels
    * absent from a group still contribute — the grid makes every
    * (group, level) cell explicit. */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensCol: String,
      maxLevels: Int = 1000, maxRows: Long = 1000000L): DataFrame = {
    require(qiCols.nonEmpty, "tCloseness needs at least one QI column")
    require(maxLevels >= 2 && maxLevels <= 100000,
      s"maxLevels in [2, 1e5], got $maxLevels")
    require(maxRows >= 1 && maxRows <= 1000000L,
      s"maxRows in [1, 1e6], got $maxRows")
    val base = df
      .filter(col(sensCol).isNotNull &&
        qiCols.map(col(_).isNotNull).reduce(_ && _))
      .select(qiCols.map(col) :+
        col(sensCol).cast("long").as("__s"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: the level/row refusals below fire AFTER the
    // persist — without the guard a refused audit leaks the cached
    // frame for the session lifetime (the kendallStats pattern)
    try {
    // bounded-action level census: fail fast before any grid work
    val levelRows = base.select(col("__s")).distinct()
      .limit(maxLevels + 1).collect()
    val m = levelRows.length.toLong
    require(m <= maxLevels,
      s"tCloseness: > $maxLevels sensitive levels — EMD over an " +
        "unbounded ordered domain should bucket first")
    val levels = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__cv"))
    // global cumulative over the m-row level frame (m is capped —
    // this unpartitioned window is grid-sized, not corpus-sized)
    val wAll = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lv = levels.select(col("__s"), col("__cv"),
      sum(col("__cv")).over(wAll).as("__cum"))
    val n = base.count()
    // the BIGINT bound of emd_num: each |cumG·n − cum·n_g| term is
    // ≤ n_g·n and a group sums ≤ m of them — m·n² ≤ 1e5·1e12 < 2⁶³
    // exactly under these two caps; larger audits bucket or sample
    // first (the family doctrine, see [[spearmanStats]])
    require(n <= maxRows,
      s"tCloseness: $n rows > maxRows=$maxRows — the BIGINT " +
        "emd_num bound is hard; audit a sample or coarser buckets")
    val groups = base.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_g"))
    val gv = base.groupBy(qiCols.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__cgv"))
    val grid = groups.crossJoin(lv)
      .join(gv, qiCols :+ "__s", "left")
      .na.fill(0L, Seq("__cgv"))
    val wGrp = Window.partitionBy(qiCols.map(col): _*)
      .orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__cumG", sum(col("__cgv")).over(wGrp))
      .groupBy((qiCols.map(col) :+ col("n_g")): _*)
      .agg(coalesce(sum(abs(col("__cumG") * lit(n) -
        col("__cum") * col("n_g"))), lit(0L)).as("emd_num"))
      .withColumn("n", lit(n))
      .withColumn("m", lit(m))
    } finally base.unpersist()
  }
}
