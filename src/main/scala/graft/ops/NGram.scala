package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NGram sliding window over timestamp-sorted rows — the reference's
  * only sequence operator (ngram.py:20-270).
  *
  * Semantics (ngram.py:20-100):
  *  - `fields` maps a *relative offset* to the columns emitted for
  *    that timestep, e.g. `Map(-1 -> Seq("a","b"), 0 -> Seq("a"))`;
  *    window length L spans min..max offset inclusive.
  *  - a window qualifies iff every CONSECUTIVE timestamp delta is
  *    ≤ `deltaThreshold` (ngram.py:179-193).
  *  - `timestampOverlap = true`: all qualifying windows are emitted
  *    (sliding). `false`: greedy non-overlapping selection — scan in
  *    order, emit the first qualifying window, skip its L rows, then
  *    emit the next qualifying window starting at or after that
  *    point (ngram.py:225-270 state machine).
  *
  * Spark formulation: `lead()` columns over
  * `Window.partitionBy(groups).orderBy(ts, tieBreak)` — flat,
  * codegen'd, one shuffle on the group key. Output columns are named
  * `{field}_t{i}` for timestep i (offsets normalized to 0..L-1).
  *
  * Divergence from the reference, by design: petastorm windows never
  * cross *row-group* boundaries (a physical artifact, ngram.py:85-91);
  * ours never cross *group* boundaries (a logical key, e.g. user_id)
  * and are global when no group is given. At 100 TB, `groupBy` is the
  * scalable shape — each group sorts independently after one hash
  * shuffle. The GLOBAL case is evaluated blocked, not in one task:
  * rows get a dense global position ([[Ranking.withGlobalIndex]] —
  * one range shuffle), positions are cut into `blockSize` blocks,
  * the first L−1 rows of each block are duplicated into the previous
  * block so windows can cross the cut, and the lead-window runs per
  * block — every stage fully parallel, never the single-partition
  * `Window.partitionBy()` this API used to build silently.
  *
  * Greedy non-overlap selection is inherently sequential (each pick
  * depends on every prior pick), so it runs over only the qualifying
  * POSITIONS — per group in the grouped case (`flatMapGroups`); the
  * global case runs a SEGMENTED greedy (the r5 form funneled every
  * qualifying position through one `repartition(1)` task — terabytes
  * through a single task at 10¹² rows): pass 1 tabulates, per block
  * and in parallel, the exit `nextAllowed` for each of the ≤ L
  * feasible entry offsets; a driver fold over those O(blocks·L)
  * longs (control-plane sized: positions/blockSize summaries, not
  * data) chains the true entry point of every block; pass 2 replays
  * the greedy per block in parallel from its now-known entry. The
  * heavy lead-columns are joined back by a semi-join on the position.
  */
object NGram {

  /** @param fields offset → emitted columns for that timestep; names
    *   may be regexes, resolved against the input's columns
    *   (reference: ngram.py:195-203)
    * @param orderField optional higher-precision sort column used for
    *   window ORDERING only (e.g. raw ns while `timestampField` is a
    *   µs view) — two rows equal at timestampField precision but
    *   distinct at orderField precision then order identically in
    *   every engine; delta thresholds still use `timestampField`. */
  final case class Spec(
      fields: Map[Int, Seq[String]],
      deltaThreshold: Long,
      timestampField: String,
      timestampOverlap: Boolean = true,
      orderField: Option[String] = None) {
    require(fields.nonEmpty, "fields must cover at least one offset")
    val minOff: Int = fields.keys.min
    val length: Int = fields.keys.max - minOff + 1
    require(length >= 1)
    /** normalized timestep -> columns (0-based). */
    def step(i: Int): Seq[String] = fields.getOrElse(i + minOff, Nil)

    /** Resolve regex field selectors against actual columns
      * (exact-name match wins; else full-regex match, sorted). */
    def resolve(columns: Seq[String]): Spec = {
      def expand(sel: String): Seq[String] =
        if (columns.contains(sel)) Seq(sel)
        else {
          val m = columns.filter(_.matches(sel)).sorted
          require(m.nonEmpty, s"ngram field selector '$sel' matches no column")
          m
        }
      copy(fields = fields.map { case (off, names) =>
        off -> names.flatMap(expand).distinct
      })
    }
  }

  def apply(df: DataFrame, spec0: Spec, groupCols: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil, blockSize: Long = 1L << 20): DataFrame = {
    val spec = spec0.resolve(df.columns.toSeq)
    if (groupCols.isEmpty) return applyGlobal(df, spec, tieBreak, blockSize)
    val ts = col(spec.timestampField)
    val order = (spec.orderField.getOrElse(spec.timestampField) +: tieBreak)
      .map(col)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    val L = spec.length

    // lead timestamps for the qualification predicate
    val tsLeads = (0 until L).map(k => if (k == 0) ts else lead(ts, k).over(w))
    val full = tsLeads.last.isNotNull
    val within = (1 until L).map(k => tsLeads(k) - tsLeads(k - 1) <= spec.deltaThreshold)
      .foldLeft(full)(_ && _)

    // per-timestep projected fields
    val stepCols: Seq[Column] = (0 until L).flatMap { k =>
      spec.step(k).map { f =>
        val c = if (k == 0) col(f) else lead(col(f), k).over(w)
        c.as(s"${f}_t$k")
      }
    }

    val keep = groupCols.map(col)
    if (spec.timestampOverlap) {
      df.select(keep ++ stepCols :+ within.as("__q"): _*)
        .filter(col("__q")).drop("__q")
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val base = df.select(keep ++ stepCols ++ Seq(
        within.as("__q"), row_number().over(w).as("__rn")): _*)
      // group key as ONE unambiguously-encoded string for the typed
      // greedy pass: each part is "len:value" (or "-" for null), so
      // ("a","bc") vs ("ab","c") -- or null vs empty -- cannot collide
      // the way a separator-join can (concat_ws also drops nulls and
      // a separator char can occur in the data).
      val gk = concat(groupCols.map { c =>
          val s = col(c).cast("string")
          when(s.isNull, lit("-"))
            .otherwise(concat(length(s).cast("string"), lit(":"), s))
        }: _*)
      val emitted = base.filter(col("__q"))
        .select(gk.as("__g"), col("__rn"))
        .as[(String, Int)]
        .groupByKey(_._1)
        .flatMapGroups { (g, it) =>
          // greedy: first qualifying rn, then next qualifying rn >= prev+L
          val rns = it.map(_._2).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer[Int]()
          var nextAllowed = Int.MinValue
          rns.foreach { rn =>
            if (rn >= nextAllowed) { out += rn; nextAllowed = rn + L }
          }
          out.iterator.map(rn => (g, rn))
        }
        .toDF("__g", "__rn")
      base.withColumn("__g", gk)
        .join(emitted, Seq("__g", "__rn"), "left_semi")
        .drop("__g", "__rn", "__q")
    }
  }

  /** Global (ungrouped) evaluation — blocked, never single-task.
    * Rows get dense global positions (one range shuffle), blocks of
    * `blockSize` positions evaluate independently, and each block
    * also receives duplicates of the NEXT block's first L−1 rows so
    * windows anchored near the cut see their trailing rows; a window
    * is emitted only by the block that owns its anchor position. */
  private def applyGlobal(df: DataFrame, spec: Spec, tieBreak: Seq[String],
      blockSize: Long): DataFrame = {
    val L = spec.length
    require(blockSize >= L,
      s"blockSize ($blockSize) must be >= window length ($L)")
    val spark = df.sparkSession
    import spark.implicits._
    val orderCols = (spec.orderField.getOrElse(spec.timestampField) +: tieBreak)
      .map(col)
    val idx = Ranking.withGlobalIndex(df, orderCols, "__gidx")
    val ownBlk = expr(s"__gidx DIV $blockSize")
    val own = idx.withColumn("__blk", ownBlk)
    val dup = idx
      .filter(pmod(col("__gidx"), lit(blockSize)) < L - 1 &&
        col("__gidx") >= blockSize)
      .withColumn("__blk", ownBlk - 1)
    val both = own.unionByName(dup)
    val w = Window.partitionBy(col("__blk")).orderBy(col("__gidx"))

    val ts = col(spec.timestampField)
    val tsLeads = (0 until L).map(k => if (k == 0) ts else lead(ts, k).over(w))
    val full = tsLeads.last.isNotNull
    val within = (1 until L)
      .map(k => tsLeads(k) - tsLeads(k - 1) <= spec.deltaThreshold)
      .foldLeft(full)(_ && _)
    val stepCols: Seq[Column] = (0 until L).flatMap { k =>
      spec.step(k).map { f =>
        val c = if (k == 0) col(f) else lead(col(f), k).over(w)
        c.as(s"${f}_t$k")
      }
    }
    // only the block that OWNS the anchor row emits its window — the
    // duplicated copies exist purely as lead() fodder
    val anchored = within && (ownBlk === col("__blk"))

    if (spec.timestampOverlap) {
      both.select(stepCols :+ anchored.as("__q"): _*)
        .filter(col("__q")).drop("__q")
    } else {
      val base = both.select(
        stepCols ++ Seq(col("__gidx"), anchored.as("__q")): _*)
        .filter(col("__q"))
      // Segmented greedy over qualifying POSITIONS — each pick
      // depends on all prior picks, but the dependency between
      // blocks collapses to ONE long (the entering `nextAllowed`),
      // and that entry can exceed a block's start by at most L-1
      // (the previous pick's anchor lies before the block). So:
      // pass 1 tabulates, per block in parallel, the exit value for
      // each of the L feasible entries; a driver fold over the
      // O(blocks·L) summaries chains the true entries; pass 2
      // replays the greedy per block in parallel. Every task is
      // bounded by blockSize positions; the driver holds summaries
      // (positions/blockSize · L longs), never positions.
      val posBlocks = base.select(
          expr(s"__gidx DIV $blockSize").as("__pblk"), col("__gidx"))
        .as[(Long, Long)]
      val summaries = posBlocks.groupByKey(_._1).mapGroups { (blk, it) =>
        val ps = it.map(_._2).toArray
        java.util.Arrays.sort(ps)
        val start = blk * blockSize
        val exits = Array.tabulate(L) { j =>
          var na = start + j
          ps.foreach { g => if (g >= na) na = g + L }
          na
        }
        (blk, exits)
      }.collect().sortBy(_._1)
      var carry = Long.MinValue
      val entries = scala.collection.mutable.HashMap.empty[Long, Long]
      summaries.foreach { case (blk, exits) =>
        val start = blk * blockSize
        val entry = math.max(carry, start) // entry - start in [0, L-1]
        entries(blk) = entry
        carry = exits((entry - start).toInt)
      }
      val bc = spark.sparkContext.broadcast(entries)
      val picked = posBlocks.groupByKey(_._1).flatMapGroups { (blk, it) =>
        val ps = it.map(_._2).toArray
        java.util.Arrays.sort(ps)
        var na = bc.value(blk)
        ps.iterator.filter { g =>
          val take = g >= na
          if (take) na = g + L
          take
        }
      }.toDF("__gidx")
      base.join(picked, Seq("__gidx"), "left_semi").drop("__gidx", "__q")
    }
  }
}
