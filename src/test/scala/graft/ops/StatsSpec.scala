package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference percentile_disc: smallest v with cume_dist(v) >= p. */
  private def disc(vals: Seq[Long], p: Double): Long = {
    val sorted = vals.sorted
    val n = sorted.length
    sorted.zipWithIndex
      .collectFirst { case (v, i) if (i + 1) * 10000L >= math.round(p * 10000) * n => v }
      .get
  }

  private val data: Seq[(String, Long)] = {
    // deterministic skewed values per group
    val gs = for {
      g <- Seq("a", "b", "c")
      i <- 1 to 97
    } yield (g, ((i * i * 7919L) % 50) + (if (g == "b") 1000 else 0))
    gs :+ (("d", 42L)) // single-row group
  }

  test("grouped exact percentiles match the cume_dist definition") {
    val df = data.toDF("g", "v").repartition(4)
    val got = Stats.exactPercentiles(df, Seq("g"), "v",
        Seq(0.5, 0.9, 0.99, 1.0))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val want = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2)
      (g, disc(vs, 0.5), disc(vs, 0.9), disc(vs, 0.99), disc(vs, 1.0))
    }
    assert(got == want)
    // p=1.0 is the max; single-row group returns its value everywhere
    assert(got.find(_._1 == "d").get == (("d", 42L, 42L, 42L, 42L)))
  }

  test("ungrouped path matches and plans NO window (prefix scan)") {
    val df = data.toDF("g", "v").repartition(4)
    val out = Stats.exactPercentiles(df, Nil, "v", Seq(0.5, 0.99))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    val got = out.as[(Long, Long)].collect().head
    val vs = data.map(_._2)
    assert(got == ((disc(vs, 0.5), disc(vs, 0.99))))
  }

  test("percentile column naming and grid validation") {
    assert(Stats.pName(0.5) == "p50")
    assert(Stats.pName(0.9) == "p90")
    assert(Stats.pName(0.99) == "p99")
    assert(Stats.pName(0.999) == "p99_9")
    assert(Stats.pName(0.9995) == "p99_95")
    assert(Stats.pName(1.0) == "p100")
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.12345))
    }
    intercept[IllegalArgumentException] {
      Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.0))
    }
  }

  test("profile: counts, nulls, lexicographic min/max, exact-below-k distinct") {
    val data = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, Some("a"), None),
      (3L, Some("a"), Some(5L)),
      (4L, None, Some(10L)))
      .toDF("id", "s", "v")
    val rows = Stats.profile(data, Seq("id", "s", "v"), kmvK = 64)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(rows("id") == (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(rows("s") == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
    // string-form min/max: "10" < "5" lexicographically
    assert(rows("v") == (("v", 4L, 1L, 2L, Some("10"), Some("5"))))
  }

  test("profile: all-null column estimates 0 distinct with null min/max") {
    val data = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val rows = Stats.profile(data, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(rows == Seq(("s", 2L, 2L, 0L, None, None)))
  }

  test("profile refuses absent columns and empty column lists") {
    val data = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException](Stats.profile(data, Nil))
    intercept[IllegalArgumentException](Stats.profile(data, Seq("nope")))
  }

  test("profile distinct estimate is within KMV error above k") {
    // 2000 distinct ids against k=64: estimator error ~1/sqrt(k)
    val data = spark.range(2000).toDF("id")
    val est = Stats.profile(data, Seq("id"), kmvK = 64)
      .select("n_distinct_est").as[Long].head()
    assert(math.abs(est - 2000.0) / 2000.0 < 0.35, s"estimate $est")
  }

  test("quantileBins: boundary-inclusive quartiles per group") {
    // group g: values 1..8 → p25=2, p50=4, p75=6 (percentile_disc);
    // bin = #boundaries exceeded: 1,2→0; 3,4→1; 5,6→2; 7,8→3
    val df = ((1 to 8).map(v => ("g", v.toLong)) :+ (("h", 100L)))
      .toDF("grp", "v")
    val out = Stats.quantileBins(df, Seq("grp"), "v",
        Seq(0.25, 0.5, 0.75))
      .orderBy("grp", "v").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 1L), ("g", 4L, 1L),
      ("g", 5L, 2L), ("g", 6L, 2L), ("g", 7L, 3L), ("g", 8L, 3L),
      ("h", 100L, 0L))) // single-value group: its own p25=p50=p75
  }

  test("quantileBins ungrouped covers the whole frame") {
    val out = Stats.quantileBins(
        (1L to 4L).toDF("v"), Nil, "v", Seq(0.5))
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("quantileBins: null group keys bin in their own group, " +
      "null values get a null bin, one row per input row") {
    val df = Seq(
      (Some("g"), Some(1L)), (Some("g"), Some(2L)),
      (None, Some(10L)), (None, Some(20L)),     // null-key group
      (Some("g"), None)                          // null value
    ).map { case (g, v) =>
      (g.orNull, v.map(Long.box).orNull)
    }.toDF("grp", "v")
    val out = Stats.quantileBins(df, Seq("grp"), "v", Seq(0.5))
    assert(out.count() == 5) // nothing vanished through the join
    val nullGroup = out.filter($"grp".isNull)
      .orderBy($"v").as[(String, Long, Long)].collect().toSeq
    assert(nullGroup == Seq((null, 10L, 0L), (null, 20L, 1L)))
    val nullVal = out.filter($"v".isNull).select($"bin").collect()
    assert(nullVal.length == 1 && nullVal.head.isNullAt(0))
  }

  test("quantileBins: null values don't shift boundaries; " +
      "all-null groups keep their rows") {
    // g holds 1..4 plus two nulls: boundaries must be quantiles of
    // the NON-NULL values (p50=2 → bins 0,0,1,1), not dragged low by
    // nulls inflating the histogram totals (r7 advice).
    val df = Seq(
      ("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L)), ("g", Some(4L)),
      ("g", None), ("g", None),
      ("z", None) // all-null group: no bounds row, rows must survive
    ).map { case (g, v) => (g, v.map(Long.box).orNull) }.toDF("grp", "v")
    val out = Stats.quantileBins(df, Seq("grp"), "v", Seq(0.5))
    assert(out.count() == 7)
    val g = out.filter($"grp" === "g" && $"v".isNotNull)
      .orderBy($"v").as[(String, Long, Long)].collect().toSeq
    assert(g == Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 1L),
      ("g", 4L, 1L)))
    val z = out.filter($"grp" === "z").select($"bin").collect()
    assert(z.length == 1 && z.head.isNullAt(0))
  }

  test("ksPairs: identical samples give 0, disjoint supports give max") {
    import spark.implicits._
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val g0 = Stats.ksPairs(same, "g", "v")
      .as[(String, String, Long, Long, Long)].head()
    assert(g0 == (("a", "b", 2L, 2L, 0L)))
    // fully separated supports -> D = 1 -> ks_scaled = na·nb
    val sep = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L),
      ("b", 30L)).toDF("g", "v")
    val g1 = Stats.ksPairs(sep, "g", "v")
      .as[(String, String, Long, Long, Long)].head()
    assert(g1 == (("a", "b", 2L, 3L, 6L)))
    // hand-check a partial overlap: a={1,2}, b={2,3}
    // grid cums: v1 a1b0 ->|1·2−0·2|=2; v2 a2b1 ->|4−2|=2; v3 ->0
    val mid = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val g2 = Stats.ksPairs(mid, "g", "v")
      .as[(String, String, Long, Long, Long)].head()
    assert(g2 == (("a", "b", 2L, 2L, 2L)))
  }

  test("benfordDigits: constants sum to 1e6; uniform digits deviate") {
    import spark.implicits._
    // values 1..9 once each -> obs_ppm = 111111 per digit
    val df = (1L to 9L).toDF("v")
    val got = Stats.benfordDigits(df, "v")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 9)
    assert(got.map(_._4).sum == 1000000L)
    assert(got.forall(_._3 == 111111L))
    // digit 1: (111111-301030)²/301030 floors to 119819
    assert(got.head == ((1L, 1L, 111111L, 301030L, 119819L)))
    // zero and negative values are excluded
    val z = Seq(0L, -5L, 10L).toDF("v")
    val gz = Stats.benfordDigits(z, "v")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(gz.toSeq == Seq((1L, 1L, 1000000L, 301030L, 1622958L)))
  }

  test("giniMoments: equal masses give G = 0, extremes approach 1") {
    import spark.implicits._
    val eq = Seq(5L, 5L, 5L, 5L).toDF("x")
    val (n, sx, srx) = Stats.giniMoments(eq, "x")
      .as[(Long, Long, Long)].head()
    // G = 2·srx/(n·sx) − (n+1)/n = 2·50/(4·20) − 5/4 = 0
    assert((n, sx, srx) == ((4L, 20L, 50L)))
    assert(2.0 * srx / (n * sx) - (n + 1.0) / n == 0.0)
    val skew = (Seq.fill(9)(0L) :+ 100L).toDF("x")
    val (n2, sx2, srx2) = Stats.giniMoments(skew, "x")
      .as[(Long, Long, Long)].head()
    // one holder of everything: G = 2·1000/(10·100) − 11/10 = 0.9
    assert(math.abs(2.0 * srx2 / (n2 * sx2) - (n2 + 1.0) / n2 - 0.9) < 1e-12)
  }

  test("topKOthers: deterministic ranks, tail rolled into (other)") {
    import spark.implicits._
    val agg = Seq(("en", "a", 10L), ("en", "b", 5L), ("en", "c", 3L),
      ("en", "d", 3L), ("fr", "a", 1L)).toDF("lang", "src", "n")
    val got = Ranking.topKOthers(agg, Seq("lang"), "src", "n", k = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("en", "a", 10L, 1L), ("en", "b", 5L, 1L),
      ("en", "(other)", 6L, 2L), ("fr", "a", 1L, 1L)))
  }

  test("allocateBudget: quotas sum exactly to the budget, " +
      "proportionality and tie order hold") {
    import spark.implicits._
    // weights 3,3,1 with budget 10: floors 4,4,1 (30/7=4.28->4,
    // 10/7=1.43->1), spare 1 goes to largest remainder
    val df = Seq(("a", 3L), ("b", 3L), ("c", 1L)).toDF("k", "w")
    val got = Sampling.allocateBudget(df, "k", "w", 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got.values.sum == 10L)
    // 3/7 and 3/7 share remainder 2/7; 1/7 has remainder 3/7 ->
    // c gets the top-up: (4, 4, 2)
    assert(got == Map("a" -> 4L, "b" -> 4L, "c" -> 2L))
    // degenerate: one key takes everything; zero weights dropped
    val one = Seq(("x", 5L), ("z", 0L)).toDF("k", "w")
    val g1 = Sampling.allocateBudget(one, "k", "w", 7L)
      .as[(String, Long, Long)].collect()
    assert(g1.toSeq == Seq(("x", 5L, 7L)))
  }

  test("aucTable: perfect, tied and degenerate cases are exact") {
    import spark.implicits._
    // perfect separation -> 1e6
    val perfect = Seq(("g", 1L, false), ("g", 2L, false),
      ("g", 3L, true), ("g", 4L, true)).toDF("g", "s", "y")
    val gp = Stats.aucTable(perfect, Seq("g"), "s", "y")
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(gp == (("g", 2L, 2L, 8L, Some(1000000L))))
    // tie at s=2 counts half: AUC = 3.5/4 = 875000
    val tied = Seq(("g", 1L, false), ("g", 2L, false),
      ("g", 2L, true), ("g", 3L, true)).toDF("g", "s", "y")
    val gt = Stats.aucTable(tied, Seq("g"), "s", "y")
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(gt == (("g", 2L, 2L, 7L, Some(875000L))))
    // anti-ranking -> 0; no positives -> null
    val anti = Seq(("g", 3L, false), ("g", 1L, true)).toDF("g", "s", "y")
    assert(Stats.aucTable(anti, Seq("g"), "s", "y")
      .as[(String, Long, Long, Long, Option[Long])].head()._5 == Some(0L))
    val none = Seq(("g", 1L, false)).toDF("g", "s", "y")
    assert(Stats.aucTable(none, Seq("g"), "s", "y")
      .as[(String, Long, Long, Long, Option[Long])].head()._5.isEmpty)
  }

  test("liftTable: perfect score concentrates lift; flat score is 1e6") {
    import spark.implicits._
    // 20 rows, positives are exactly the top-quarter scores ->
    // 4 bins: top bin all positive, rest zero; base rate 1/4
    val df = (1L to 20L).map(v => (v, v > 15L)).toDF("s", "y")
    val got = Stats.liftTable(df, "s", "y", nBins = 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(3L) == ((3L, 5L, 5L, 1000000L, Some(4000000L))))
    assert(got(0L)._3 == 0L && got(0L)._5 == Some(0L))
    // no positives at all -> null lift everywhere
    val none = (1L to 8L).map(v => (v, false)).toDF("s", "y")
    val gn = Stats.liftTable(none, "s", "y", nBins = 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(gn.forall(_._5.isEmpty))
  }

  test("weighted percentiles: mass cut, zero-weight rows carry none") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7: half the mass (>=5 of 10)
    // is reached at v=4; unweighted p50 would be 2
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 7L), ("g", 9L, 0L)).toDF("g", "v", "w")
    val got = Stats.exactPercentilesWeighted(df, Seq("g"), "v", "w",
      Seq(0.5)).as[(String, Long)].head()
    assert(got == (("g", 4L)))
    val unw = Stats.exactPercentiles(df.filter($"w" > 0), Seq("g"), "v",
      Seq(0.5)).as[(String, Long)].head()
    assert(unw == (("g", 2L)))
  }

  test("hdrSketch: bounded buckets, small values exact, error bound") {
    import spark.implicits._
    val df = spark.range(1, 100001).select(lit("g").as("g"), $"id".as("v"))
    val sk = Stats.hdrSketch(df, Seq("g"), "v", subBits = 5)
    val nb = sk.count()
    // 17-bit domain at subBits=5: at most ~(17-6)*32 + 64 buckets
    assert(nb <= 420L, s"state should be bucket-bounded, got $nb")
    // values below 2^6 are their own buckets (exact)
    val small = sk.filter($"bucket_lo" < 64).count()
    assert(small == 63L)
    val p = Stats.hdrPercentiles(sk, Seq("g"), Seq(0.5, 0.99))
      .as[(String, Long, Long)].head()
    // lower-bound estimate within 2^-5 relative below the exact
    assert(p._2 <= 50000L && p._2 >= (50000 * 31) / 32 - 1, s"p50 ${p._2}")
    assert(p._3 <= 99000L && p._3 >= (99000 * 31) / 32 - 1, s"p99 ${p._3}")
    // sketches merge by adding counts
    val a = Stats.hdrSketch(df.filter($"v" % 2 === 0), Seq("g"), "v", 5)
    val b = Stats.hdrSketch(df.filter($"v" % 2 === 1), Seq("g"), "v", 5)
    val merged = a.unionByName(b).groupBy($"g", $"bucket_lo")
      .agg(sum($"cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    val direct = sk.as[(String, Long, Long)].collect().toSet
    assert(merged == direct)
  }

  test("madStats: hand-checked median/MAD, Hampel outliers, mad=0 case") {
    import spark.implicits._
    // values 1..9 plus outlier 100: med of 10 values (cume_dist rule
    // picks the 5th) = 5; deviations {4,3,2,1,0,1,2,3,4,95} -> mad
    // (5th smallest) = 2; |v-5| > 6 flags only 100
    val df = ((1L to 9L) :+ 100L).map(v => ("g", v)).toDF("g", "v")
    val got = Stats.madStats(df, Seq("g"), "v")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("g", 10L, 5L, 2L, 1L)))
    // constant-heavy distribution -> mad = 0, every deviation flags
    val const = (Seq.fill(5)(7L) ++ Seq(8L, 9L)).map(v => ("g", v))
      .toDF("g", "v")
    val gc = Stats.madStats(const, Seq("g"), "v")
      .as[(String, Long, Long, Long, Long)].head()
    assert(gc == (("g", 7L, 7L, 0L, 2L)))
  }

  test("groupedMoments: per-group sums with pairwise deletion") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("b", 3L, 1L))
      .toDF("g", "x", "y")
    val got = Stats.groupedMoments(df, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 3L, 6L, 10L, 5L, 20L)))
    assert(got("b") == (("b", 1L, 3L, 1L, 3L, 9L, 1L)))
  }

  test("concentration: 1e6 for a monoculture, 1e6/k uniform, nulls out") {
    import spark.implicits._
    val df = (Seq.fill(5)(("bot", "click")) ++
      Seq(("u", "click"), ("u", "view"), ("u", "buy"), ("u", "view")) ++
      Seq((null.asInstanceOf[String], "click"), ("u", null.asInstanceOf[String])))
      .toDF("k", "c")
    val got = Stats.concentration(df, "k", "c")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 2)
    assert(got("bot") == (("bot", 5L, 1L, 25L, 1000000L)))
    // u: click 1, view 2, buy 1 -> sum_sq 6, n=4 -> 6e6/16 = 375000
    assert(got("u") == (("u", 4L, 3L, 6L, 375000L)))
  }

  test("winsorizedStats: clamps to exact cuts, counts clips, " +
      "identity when nothing clips") {
    import spark.implicits._
    // 1..10 with p10/p90: cuts at 1 and 9 (cume_dist >= p rule);
    // only 10 clips high -> sum_wins = 55 - 10 + 9 = 54
    val df = (1L to 10L).map(v => ("g", v)).toDF("g", "v")
    val got = Stats.winsorizedStats(df, Seq("g"), "v", 0.10, 0.90)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == (("g", 10L, 55L, 54L, 0L, 1L, 1L, 9L)))
    // p-range covering everything is the identity
    val id = Stats.winsorizedStats(df, Seq("g"), "v", 0.0001, 1.0)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(id._4 == 55L && id._5 == 0L && id._6 == 0L)
    // null values neither shift cuts nor count
    val wn = (1L to 10L).map(v => ("g", Some(v))).toDF("g", "v")
      .unionByName(Seq(("g", None: Option[Long])).toDF("g", "v"))
    val gn = Stats.winsorizedStats(wn, Seq("g"), "v", 0.10, 0.90)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(gn == got)
  }

  test("chiSquareCells: 2x2 hand-check including the zero cell") {
    import spark.implicits._
    // 3/1/1/3 table: E = 2 everywhere, chi2 contribution 0.5/cell
    val df = (Seq.fill(3)(("a", "u")) ++ Seq(("a", "v")) ++
      Seq(("b", "u")) ++ Seq.fill(3)(("b", "v"))).toDF("x", "y")
    val got = Stats.chiSquareCells(df, "x", "y")
      .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", "u", 3L, 2000000L, 500000L), ("a", "v", 1L, 2000000L, 500000L),
      ("b", "u", 1L, 2000000L, 500000L), ("b", "v", 3L, 2000000L, 500000L)))
    // unobserved grid cells appear with o = 0 and contribute E
    val sparse = Seq(("a", "u"), ("b", "v")).toDF("x", "y")
    val g = Stats.chiSquareCells(sparse, "x", "y")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(g.size == 4)
    assert(g(("a", "v")) == (("a", "v", 0L, 500000L, 500000L)))
    assert(g(("a", "u")) == (("a", "u", 1L, 500000L, 500000L)))
  }

  test("corrMoments: hand-check, pairwise deletion, shard additivity") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(2L), Some(3L)),
      (Some(2L), None, Some(5L)),
      (Some(3L), Some(6L), None)).toDF("a", "b", "c")
    val rows = Stats.corrMoments(df, Seq("a", "b", "c"))
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // (a,b): rows 1 and 3 -> n=2, sx=4, sy=8, sxy=20, sx2=10, sy2=40
    assert(rows(("a", "b")) ==
      (("a", "b", 2L, 4L, 8L, 20L, 10L, 40L)))
    // (a,c): rows 1 and 2 -> n=2, sx=3, sy=8, sxy=13, sx2=5, sy2=34
    assert(rows(("a", "c")) ==
      (("a", "c", 2L, 3L, 8L, 13L, 5L, 34L)))
    // (b,c): row 1 only
    assert(rows(("b", "c")) ==
      (("b", "c", 1L, 2L, 3L, 6L, 4L, 9L)))
    // moments from disjoint shards ADD to the full-frame moments
    val big = spark.range(1000).select($"id".as("a"), ($"id" * 2).as("b"))
    val full = Stats.corrMoments(big, Seq("a", "b"))
      .as[(String, String, Long, Long, Long, Long, Long, Long)].head()
    val lo = Stats.corrMoments(big.filter($"a" < 500), Seq("a", "b"))
      .as[(String, String, Long, Long, Long, Long, Long, Long)].head()
    val hi = Stats.corrMoments(big.filter($"a" >= 500), Seq("a", "b"))
      .as[(String, String, Long, Long, Long, Long, Long, Long)].head()
    assert((lo._3 + hi._3, lo._4 + hi._4, lo._5 + hi._5, lo._6 + hi._6,
      lo._7 + hi._7, lo._8 + hi._8) ==
      ((full._3, full._4, full._5, full._6, full._7, full._8)))
  }

  test("sourceReport attributes corpus-wide dups to both sources") {
    val df = Seq(
      (0L, "A", "a", "en"),
      (1L, "A", "dup text", "en"),
      (2L, "A", null, "de"),             // null text → empty fp, kept
      (3L, "B", "dup text", "en"),       // cross-source mirror of 1
      (4L, "B", "unique b", null))       // null lang ignored in count
      .toDF("doc_id", "source", "text", "lang")
    val out = Stats.sourceReport(df, "source", "doc_id", "text", "lang")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 3L, 9L, 3L, 1L, 2L, 333333L),
      ("B", 2L, 16L, 4L, 1L, 1L, 500000L)))
  }

  test("passAtK matches exact BigInt binomials on every (n, c) " +
      "up to 30 attempts; guards fire on misuse") {
    // one task per (n, c): task t = n*31 + c with n attempts, c passes
    val cases = for { n <- 1 to 30; c <- 0 to n } yield (n, c)
    val rows = cases.flatMap { case (n, c) =>
      (1 to n).map(i => (n.toLong * 31 + c, i <= c))
    }
    val df = rows.toDF("task", "ok")
    val got = Stats.passAtK(df, "task", col("ok"), Seq(1, 5, 10))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          Seq(3, 4, 5).map(i => if (r.isNullAt(i)) None
            else Some(r.getLong(i)))))
      .toMap
    def comb(n: Int, k: Int): BigInt =
      if (k > n) BigInt(0)
      else (0 until k).map(i => BigInt(n - i)).product /
        (1 to k).map(BigInt(_)).product
    cases.foreach { case (n, c) =>
      val (gn, gc, ks) = got(n.toLong * 31 + c)
      assert((gn, gc) == ((n.toLong, c.toLong)))
      Seq(1, 5, 10).zip(ks).foreach { case (k, gk) =>
        val want =
          if (n < k) None
          else Some(((BigInt(1000000) * (comb(n, k) - comb(n - c, k)))
            / comb(n, k)).toLong)
        assert(gk == want, s"pass@$k(n=$n, c=$c): got $gk want $want")
      }
    }
    // guards: n > 30 raises with a clear message; bad k refused
    val big = (1 to 31).map(i => (1L, true)).toDF("task", "ok")
    val e = intercept[Exception] {
      Stats.passAtK(big, "task", col("ok"), Seq(1)).collect()
    }
    assert(e.getMessage.contains("n <= 30"))
    intercept[IllegalArgumentException] {
      Stats.passAtK(df, "task", col("ok"), Seq(11))
    }
  }

  test("krippendorffAlpha matches the float reference (true floor " +
      "for negative alpha), excludes incomplete items, nulls on " +
      "all-same labels") {
    // deterministic 3-rater panel over 60 items, 4 label values
    val rows = for { i <- 0 until 60; r <- 0 until 3 } yield
      (i.toLong, r.toLong, s"v${(i * 7 + r * (i % 5)) % 4}")
    val df = rows.toDF("item", "rater", "label")
    val out = Stats.krippendorffAlpha(df, "item", "rater", "label", 3)
      .as[(Long, Long, Option[Long])].head()
    // float reference on the same panel
    val byItem = rows.groupBy(_._1).values.map(_.map(_._3)).toSeq
    val i = byItem.size; val n = 3 * i
    val a = byItem.map(_.groupBy(identity).values
      .map(g => g.size * (3 - g.size)).sum).sum
    val nv = rows.map(_._3).groupBy(identity).values.map(_.size)
    val bb = nv.map(c => c.toLong * (n - c)).sum
    val alpha = 1.0 -
      (a.toDouble / (n * 2)) / (bb.toDouble / (n.toLong * (n - 1)))
    assert(out._1 == i.toLong && out._2 == a.toLong)
    assert(out._3.contains(math.floor(alpha * 1e6).toLong),
      s"got ${out._3}, float says ${math.floor(alpha * 1e6).toLong}")
    // a panel engineered to DISAGREE maximally goes negative, and
    // the published ppm is the FLOOR (truncation would round up)
    val neg = Seq((0L, 0L, "x"), (0L, 1L, "y"), (0L, 2L, "x"),
      (1L, 0L, "y"), (1L, 1L, "x"), (1L, 2L, "y"))
      .toDF("item", "rater", "label")
    val negOut = Stats
      .krippendorffAlpha(neg, "item", "rater", "label", 3)
      .as[(Long, Long, Option[Long])].head()
    assert(negOut._3.exists(_ < 0L))
    // incomplete and double-labeled items are excluded, not fatal
    val messy = df.unionByName(Seq((100L, 0L, "v0"), (101L, 0L, "v0"),
      (101L, 0L, "v1"), (101L, 1L, "v2"), (101L, 2L, "v3"))
      .toDF("item", "rater", "label"))
    val messyOut = Stats
      .krippendorffAlpha(messy, "item", "rater", "label", 3)
      .as[(Long, Long, Option[Long])].head()
    assert(messyOut == out)
    // all-identical labels: De = 0, alpha undefined → null
    val same = (0 until 9).map(k => ((k / 3).toLong, (k % 3).toLong,
      "only")).toDF("item", "rater", "label")
    assert(Stats.krippendorffAlpha(same, "item", "rater", "label", 3)
      .as[(Long, Long, Option[Long])].head()._3.isEmpty)
  }
}
