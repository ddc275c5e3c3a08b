package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch, md5-keyed — the
  * deterministic member of the cardinality-sketch family (Bar-Yossef
  * et al. 2002; the bottom-k form of theta sketches). Every value
  * hashes to a 60-bit integer (first 15 hex chars of md5), a group's
  * sketch is its k smallest DISTINCT hashes, and the estimator is
  * `(k-1) · 2^60 / kth_min` — the k-th minimum of n uniform draws
  * sits near `k/n` of the range.
  *
  * Why KMV and not HLL here: the sketch is a pure function of the
  * value SET — no RNG, no register layout — so the same data gives
  * the same sketch on any engine, partitioning, or cluster size
  * (byte-for-byte reproducible, DuckDB-oracle-checkable), and two
  * sketches merge by unioning hash sets and re-taking the k smallest.
  *
  * Scale shape: hashes are codegen'd scan work; each input partition
  * keeps a bounded per-group DISTINCT-bottom-k (a TreeSet capped at k
  * per group, `mapPartitions` — the r5 form's `.distinct()` shuffled
  * every partition-distinct (group, hash) pair, i.e. a
  * vocabulary-sized exchange, exactly the cost the sketch exists to
  * avoid). Only the surviving candidates shuffle — at most
  * k·groups·partitions rows regardless of corpus size (asserted by a
  * shuffle-metrics test) — and the global distinct + rank runs over
  * that sketch-sized set.
  */
object Sketch {

  /** 60-bit md5-derived hash of a value (non-negative long). */
  def hash60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Bottom-k sketch rows per group: (groupCols*, kmv_rank, kmv_hash)
    * with kmv_rank in 1..k over distinct hashes ascending. The rows
    * ARE the mergeable sketch (union two groups' rows, re-rank, keep
    * k). */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k > 1, s"k must be > 1 (got $k)")
    val hashed = df
      .select(groupCols.map(col) :+ hash60(col(valueCol)).as("kmv_hash"): _*)
    val gN = groupCols.length
    // Per-partition bounded distinct-bottom-k per group: the global
    // bottom-k distinct set is contained in the union of per-partition
    // bottom-k distinct sets, so dropping everything else locally is
    // lossless. A null hash (null value) is one distinct member that
    // sorts first (Spark asc = nulls first), matching the plain
    // distinct+rank semantics this replaces.
    val candidates = hashed.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], java.util.TreeSet[java.lang.Long]]
      val nullSeen = scala.collection.mutable.HashSet.empty[Seq[Any]]
      it.foreach { r =>
        val key: Seq[Any] = (0 until gN).map(r.get)
        if (r.isNullAt(gN)) nullSeen += key
        else {
          val h = r.getLong(gN)
          val set = heaps.getOrElseUpdate(key,
            new java.util.TreeSet[java.lang.Long]())
          if (!set.contains(h)) {
            if (set.size < k) set.add(h)
            else if (h < set.last()) { set.add(h); set.pollLast() }
          }
        }
      }
      val keys = heaps.keySet ++ nullSeen
      keys.iterator.flatMap { key =>
        val hs = heaps.get(key).map { s =>
          scala.jdk.CollectionConverters.SetHasAsScala(s).asScala
            .toSeq.map(h => java.lang.Long.valueOf(h.longValue()))
        }.getOrElse(Nil)
        val all: Seq[java.lang.Long] =
          if (nullSeen(key)) (null: java.lang.Long) +: hs else hs
        all.iterator.map(h => org.apache.spark.sql.Row.fromSeq(key :+ h))
      }
    }(org.apache.spark.sql.Encoders.row(hashed.schema))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("kmv_hash"))
    candidates.distinct() // sketch-sized: ≤ k·groups·partitions rows
      .withColumn("kmv_rank", row_number().over(w))
      .filter(col("kmv_rank") <= k)
      .select(groupCols.map(col) ++ Seq(col("kmv_rank"), col("kmv_hash")): _*)
  }

  /** Deterministic uniform sample of k DISTINCT values per group —
    * "show me 20 example user ids per segment" without a distinct
    * shuffle of the whole value domain: the k distinct values with
    * the smallest [[hash60]] draws (ties broken on the value's
    * string form), a pure function of the data, reproducible across
    * engines, retries and partitionings. The bottom-k-by-hash set IS
    * a uniform sample of the distinct values (the KMV argument), and
    * seeding via `seed` yields independent samples.
    *
    * Scale shape: the kmvSketch move — per-partition bounded
    * distinct-bottom-k heaps per group, so the exchange carries ≤
    * k·groups·partitions candidate rows and the global distinct set
    * is never shuffled; the final rank window runs over that
    * candidate set only. Null values are excluded (a sample of
    * values, not of presence). Values are returned in STRING form
    * (the heap orders on it; samples are for inspection).
    *
    * Output: (groupCols*, smp_rank, value), smp_rank 1..k. */
  def distinctSample(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int, seed: String = "ds"): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        hash60(concat_ws(":", lit(seed), col(valueCol).cast("string")))
          .as("__h"),
        col(valueCol).cast("string").as("value")): _*)
    val gN = groupCols.length
    val ord = new Ordering[(Long, String)] {
      def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }
    val candidates = hashed.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], java.util.TreeSet[(Long, String)]]
      it.foreach { r =>
        val key: Seq[Any] = (0 until gN).map(r.get)
        val e = (r.getLong(gN), r.getString(gN + 1))
        val set = heaps.getOrElseUpdate(key, {
          new java.util.TreeSet[(Long, String)](
            (a: (Long, String), b: (Long, String)) => ord.compare(a, b))
        })
        if (!set.contains(e)) {
          if (set.size < k) set.add(e)
          else if (ord.compare(e, set.last()) < 0) {
            set.add(e); set.pollLast()
          }
        }
      }
      heaps.iterator.flatMap { case (key, set) =>
        scala.jdk.CollectionConverters.SetHasAsScala(set).asScala
          .iterator.map { case (h, v) =>
            org.apache.spark.sql.Row.fromSeq(key ++ Seq(h, v))
          }
      }
    }(org.apache.spark.sql.Encoders.row(hashed.schema))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__h"), col("value"))
    candidates.distinct() // ≤ k·groups·partitions rows
      .withColumn("smp_rank", row_number().over(w))
      .filter(col("smp_rank") <= k)
      .select(groupCols.map(col) ++
        Seq(col("smp_rank").cast("long").as("smp_rank"), col("value")): _*)
  }

  /** 60-bit md5 hash of a value under hash-family row `r` — the
    * count-min row hashes. Seeding by prefixing the row index keeps
    * the d rows pairwise independent enough in practice while staying
    * engine-reproducible (same convention as every md5 draw here). */
  def rowHash60(r: Int, v: Column): Column =
    conv(substring(md5(concat(lit(s"$r:"), v.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Count-min sketch build (Cormode & Muthukrishnan 2005): a d×w
    * grid of counters; every input row increments one counter per
    * hash row. Returns the sketch AS data — (cm_row, cm_col, cnt),
    * at most d·w rows — so sketches merge by unioning and re-summing
    * (the update is a pure counter add: linear, commutative,
    * shuffle-order-free, hence bit-stable on any engine).
    *
    * Why a sketch at 100 TB: the true frequency table of a web-scale
    * token stream is itself huge; the sketch bounds state at d·w
    * counters regardless of vocabulary size, and the agg is map-side
    * combined so only ≤ d·w·partitions counter rows ever shuffle.
    * Estimates overcount (never undercount) by at most εN with
    * ε = e/w at probability 1-δ, δ = e^-d. */
  def countMinSketch(df: DataFrame, valueCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2, s"width must be >= 2 (got $width)")
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("cm_row"),
        (rowHash60(r, col(valueCol)) % width).as("cm_col"))
    }
    df.select(explode(array(rows: _*)).as("t"))
      .select(col("t.cm_row"), col("t.cm_col"))
      .groupBy(col("cm_row"), col("cm_col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinSketch]]: for every key in
    * `keys` (distinct), est = min over the d rows of the counter the
    * key hashes into (0 if a counter row is absent — possible only
    * when nothing hashed there). The keys frame re-derives the same
    * (row, col) coordinates, joins the d·w-row sketch (broadcast — the
    * sketch is tiny by construction) and takes a per-key min.
    * Output: (key, est). est ≥ true count, always. */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame,
      keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2, s"width must be >= 2 (got $width)")
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("cm_row"),
        (rowHash60(r, col("key")) % width).as("cm_col"))
    }
    keys.select(col(keyCol).as("key")).distinct()
      .select(col("key"), explode(array(rows: _*)).as("t"))
      .select(col("key"), col("t.cm_row"), col("t.cm_col"))
      .join(broadcast(sketch), Seq("cm_row", "cm_col"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HyperLogLog register table (Flajolet, Fuchs, Gandouet & Meunier
    * 2007), md5-keyed and float-free. Every non-null value hashes to
    * 60 bits (same [[hash60]] as KMV); the top `p` bits pick one of
    * m = 2^p registers and rho = 1 + (leading zeros of the remaining
    * 60-p suffix bits) updates that register by MAX. Returns the
    * registers AS data — (groupCols*, hll_bucket, hll_rho), at most m
    * rows per group — so sketches merge by unioning and re-MAXing;
    * max is commutative and idempotent, so the register table is
    * independent of engine, partitioning and replay order
    * (DuckDB-oracle-checkable bit-for-bit, unlike library HLLs whose
    * register bytes are implementation-private).
    *
    * rho rides `bin()` — present with identical no-leading-zeros
    * string semantics in Spark and DuckDB — so for a non-zero suffix
    * the leading-zero count is `(60-p) - length(bin(suffix))`, with
    * the all-zero suffix pinned to rho = 61-p.
    *
    * Scale shape: the register grid is the WHOLE state — m ints per
    * group regardless of corpus size — and the max-agg is map-side
    * combined, so at most m·groups·partitions register rows ever
    * shuffle. This is the sketch to ship when even KMV's per-value
    * distinct pass is too wide: updates never materialize a distinct
    * set at all. */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16] (got $p)")
    val span = 60 - p
    val h = hash60(col(valueCol))
    val suffix = h.bitwiseAND(lit((1L << span) - 1L))
    val rho = when(suffix === 0L, lit(span + 1))
      .otherwise(lit(span + 1) - length(bin(suffix)))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col)
        :+ shiftright(h, span).as("hll_bucket")
        :+ rho.cast("int").as("hll_rho"): _*)
      .groupBy((groupCols :+ "hll_bucket").map(col): _*)
      .agg(max(col("hll_rho")).as("hll_rho"))
  }

  /** Integer summary of a [[hllSketch]] per group: (groupCols*, m,
    * buckets_set, sum_rho, z_int) where z_int = Σ over ALL m
    * registers of 2^(61-p-rho), empty registers contributing rho = 0
    * (i.e. 2^(61-p) each). z_int is the float estimator's entire
    * sufficient statistic — E = α_m · m² · 2^(61-p) / z_int, see
    * [[hllEstimate]] — kept integer-exact here per the
    * moments-not-floats doctrine (assortativity q165): the mergeable
    * statistics are engine-exact, the float is the caller's last
    * step. Overflow bound: each term ≤ 2^(61-p) and there are 2^p of
    * them, so z_int ≤ 2^61 < Long.MaxValue for every legal p. */
  def hllSummary(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 8): DataFrame = {
    val q = 61 - p
    val m = 1L << p
    hllSketch(df, groupCols, valueCol, p)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("buckets_set"),
        sum(col("hll_rho").cast("long")).as("sum_rho"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $q - hll_rho))").as("z_set"))
      .withColumn("m", lit(m))
      .withColumn("z_int",
        col("z_set") + (lit(m) - col("buckets_set")) * lit(1L << q))
      .select(groupCols.map(col) ++ Seq(col("m"), col("buckets_set"),
        col("sum_rho"), col("z_int")): _*)
  }

  /** Jaccard similarity estimates between groups' value SETS from
    * their KMV sketches (Beyer et al. 2007's k-minimum-values set
    * operations): for a group pair, take the k smallest distinct
    * hashes of the UNION of the two sketches; the estimate is
    * `1e6·|{h ∈ K : h in BOTH sketches}| div k` — an exact integer
    * ratio of the matched count, engine-reproducible because the
    * md5 hash order is. This answers "how similar are two sources'
    * AUDIENCES / vocabularies" from 2·k longs per group — no
    * corpus-sized set intersection — with RSE ~ 1/√(J·k).
    *
    * Input: a [[kmvSketch]] with ONE group column named as
    * `groupCol`. Output per unordered pair: (src_a, src_b, k_used,
    * n_match, jaccard_est_ppm). k_used < k when the union of the
    * two sketches has fewer than k distinct hashes (then the
    * estimate is exact). Scale shape: sketch rows × (groups−1)
    * against the broadcast group list, per-pair window ranks ≤ 2k
    * rows. */
  def kmvPairJaccard(sketch: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    require(k > 1, s"k must be > 1 (got $k)")
    val groups = broadcast(
      sketch.select(col(groupCol).as("__g2")).distinct())
    // tag every sketch row into each pair it participates in,
    // remembering which side it came from
    val tagged = sketch
      .join(groups, col(groupCol) =!= col("__g2"))
      .select(least(col(groupCol), col("__g2")).as("src_a"),
        greatest(col(groupCol), col("__g2")).as("src_b"),
        col(groupCol).as("__side"), col("kmv_hash"))
    // union bottom-k: distinct hashes ascending, membership count
    // per hash (2 = present in both sketches)
    val perHash = tagged
      .groupBy(col("src_a"), col("src_b"), col("kmv_hash"))
      .agg(count_distinct(col("__side")).as("__sides"))
    val w = Window.partitionBy(col("src_a"), col("src_b"))
      .orderBy(col("kmv_hash"))
    perHash.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("__sides") === 2, lit(1L)).otherwise(lit(0L)))
          .as("n_match"))
      .withColumn("jaccard_est_ppm",
        expr("(n_match * 1000000) div k_used"))
  }

  /** Join-size estimate from two [[countMinSketch]]es (the AGMS /
    * Cormode-Muthukrishnan inner-product estimator): for each hash
    * row r, Σ_col cntA[r,c]·cntB[r,c] overestimates the true join
    * cardinality Σ_k a(k)·b(k) (colliding keys only ADD mass), and
    * the minimum over the d rows is the estimate — never an
    * undercount, within εN_aN_b/w with the usual CM probability.
    * This is the shuffle-planning number: "how many rows will this
    * key join produce" answered from two d×w counter grids, no scan
    * of either side.
    *
    * Both sketches must share depth/width (same [[rowHash60]]
    * family by construction). Rows with no overlapping cells
    * contribute 0 (left join from the row domain — a min over only
    * the joined rows would silently overestimate disjoint inputs).
    * Output: one row, `est_join_size` (BIGINT; products ride
    * DECIMAL(38,0)). */
  def countMinJoinSize(a: DataFrame, b: DataFrame): DataFrame = {
    val ip = a.select(col("cm_row"), col("cm_col"), col("cnt").as("__ca"))
      .join(b.select(col("cm_row"), col("cm_col"), col("cnt").as("__cb")),
        Seq("cm_row", "cm_col"))
      .groupBy(col("cm_row"))
      .agg(sum(expr("CAST(__ca AS DECIMAL(38,0)) * __cb")).as("__ip"))
    a.select(col("cm_row")).distinct()
      .join(ip, Seq("cm_row"), "left")
      .agg(min(coalesce(col("__ip"), expr("CAST(0 AS DECIMAL(38,0))")))
        .as("__est"))
      .select(expr("CAST(__est AS BIGINT)").as("est_join_size"))
  }

  /** Pair-union HLL summaries — the merge law made observable: for
    * every unordered group pair, the UNION sketch obtained by
    * re-MAXing the two groups' registers, summarized like
    * [[hllSummary]]. This is the operation that makes HLL the right
    * sketch for federated cardinality questions ("how many distinct
    * tokens across sources A and B?") — the answer comes from m
    * integers per source, NOT from re-scanning either corpus, and
    * because max-merge is exact (not an approximation on top of the
    * sketch), the union registers are bit-identical to the sketch of
    * the concatenated data (spec-asserted, and the DuckDB oracle
    * rebuilds them independently).
    *
    * Scale shape: the per-group sketch build is [[hllSketch]]'s one
    * scan; pair expansion joins the m·groups register table against
    * the broadcast group list (register rows × (groups−1) — bounded
    * by the categorical group count, never the corpus), then two
    * map-side-combined aggs. Output: (src_a, src_b, m, buckets_set,
    * sum_rho, z_int). */
  def hllPairUnionSummary(df: DataFrame, groupCol: String,
      valueCol: String, p: Int = 8): DataFrame = {
    val q = 61 - p
    val m = 1L << p
    val sk = hllSketch(df.filter(col(groupCol).isNotNull),
        Seq(groupCol), valueCol, p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = broadcast(sk.select(col(groupCol).as("__g2")).distinct())
    sk.join(groups, col(groupCol) =!= col("__g2"))
      .select(least(col(groupCol), col("__g2")).as("src_a"),
        greatest(col(groupCol), col("__g2")).as("src_b"),
        col("hll_bucket"), col("hll_rho"))
      .groupBy(col("src_a"), col("src_b"), col("hll_bucket"))
      .agg(max(col("hll_rho")).as("hll_rho"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("buckets_set"),
        sum(col("hll_rho").cast("long")).as("sum_rho"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $q - hll_rho))").as("z_set"))
      .withColumn("m", lit(m))
      .withColumn("z_int",
        col("z_set") + (lit(m) - col("buckets_set")) * lit(1L << q))
      .select(col("src_a"), col("src_b"), col("m"), col("buckets_set"),
        col("sum_rho"), col("z_int"))
  }

  /** Float distinct-count estimates from [[hllSummary]] rows:
    * est = α_m · m² · 2^(61-p) / z_int with the standard small-range
    * linear-counting correction (est < 2.5m and empty registers
    * present → m·ln(m/empty)). Deliberately NOT part of the oracle
    * contract (float); accuracy is spec-asserted against exact
    * distinct counts (expected RSE ≈ 1.04/√m). */
  def hllEstimate(summary: DataFrame, p: Int = 8): DataFrame = {
    val m = (1L << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val q = 61 - p
    val raw = lit(alpha * m * m * math.pow(2.0, q.toDouble)) /
      col("z_int").cast("double")
    val empty = lit(m) - col("buckets_set").cast("double")
    summary.withColumn("est_distinct",
      when(raw < lit(2.5 * m) && empty > 0.0,
        lit(m) * log(lit(m) / empty)).otherwise(raw))
  }

  /** Per-group distinct-count estimates from the bottom-k sketch:
    * (groupCols*, kmv_n, kth_min, est_distinct). Groups with fewer
    * than k distinct values are EXACT (kmv_n < k → the sketch is the
    * whole set, estimate = kmv_n). The estimate is integer-derived
    * (`(k-1) · 2^60 div kth_min`) so it reproduces across engines. */
  def kmvEstimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    // (k-1)·2^60 overflows a long; precompute it as a DECIMAL(38,0)
    // literal and use integral `div` — exact truncating division, no
    // decimal-scale rounding that could differ from the oracle's
    // HUGEINT floor division (values are positive: trunc == floor)
    val numer = java.math.BigDecimal.valueOf(k - 1L)
      .multiply(java.math.BigDecimal.valueOf(1152921504606846976L)) // 2^60
    kmvSketch(df, groupCols, valueCol, k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kmv_n"), max(col("kmv_hash")).as("kth_min"))
      .withColumn("est_distinct",
        when(col("kmv_n") < k, col("kmv_n")).otherwise(
          expr(s"CAST('$numer' AS DECIMAL(38,0)) div kth_min")))
  }
}
