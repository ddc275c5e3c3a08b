package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-plan proofs for the round-12 operators: the scale-critical
  * plan shapes claimed in the scaladocs are asserted against the
  * actual physical plans, not just narrated. */
class NewOpsPlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("count-min estimate joins the sketch by broadcast") {
    val data = (1 to 100).map(i => s"t${i % 10}").toDF("v")
    val sk = Sketch.countMinSketch(data, "v", 3, 64)
    val p = plan(Sketch.countMinEstimate(sk, data, "v", 3, 64))
    assert(p.contains("BroadcastHashJoin"),
      s"sketch join should broadcast the d*w grid:\n$p")
  }

  test("overlap join plans as an equi-join on the bin id") {
    val a = Seq(("a", 0L, 100L)).toDF("ai", "alo", "ahi")
    val b = Seq(("b", 50L, 60L)).toDF("bi", "blo", "bhi")
    val p = plan(RangeJoin.overlapByBins(a, "alo", "ahi",
      b, "blo", "bhi", 10L))
    assert(!p.contains("CartesianProduct"),
      s"overlap join must not go cartesian:\n$p")
    // the bin key makes it a hash-joinable equi-join
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("priority sample's top-k is TakeOrdered, not a full sort") {
    val df = (1 to 50).map(i => (s"k$i", i.toLong)).toDF("key", "w")
    val p = plan(Sampling.prioritySample(df, "key", "w", k = 5))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-(k+1) should ride bounded heaps:\n$p")
  }

  test("changelog compaction is one agg — no window, no sort") {
    val log = Seq((1L, "a", 1L, 10L)).toDF("u", "t", "id", "ts")
    val p = plan(Dedup.compactLatest(log, Seq("u"), col("ts"),
      col("id"), Seq("ts", "t", "id"), col("t") === "x"))
    assert(!p.contains("Window"), s"no per-key window expected:\n$p")
    assert(p.contains("Aggregate"), p)
  }

  test("ecdf cumulative rides the prefix scan, not a global window") {
    val p = plan(Stats.ecdf((1 to 100).map(_.toLong).toDF("v"), "v"))
    assert(!p.contains("Window"),
      s"ecdf must not use a single-partition Window.orderBy:\n$p")
  }

  test("corrMoments is one agg over one scan — no join, no window") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong * 2, i.toLong % 7))
      .toDF("a", "b", "c")
    val p = plan(Stats.corrMoments(df, Seq("a", "b", "c")))
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("CartesianProduct"),
      s"all-pairs moments must stay a single agg:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("chiSquareCells totals reuse the persisted cell table") {
    val df = (1 to 100).map(i => (s"x${i % 3}", s"y${i % 4}")).toDF("x", "y")
    val out = Stats.chiSquareCells(df, "x", "y")
    val p = plan(out)
    assert(p.contains("InMemoryTableScan"),
      s"row/col/N totals must re-aggregate the cached cells:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row N total should broadcast:\n$p")
    out.unpersist()
  }

  test("tagKeywords never shuffles the corpus (broadcast NLJ only)") {
    val docs = (1 to 50).map(i => (i.toLong, s"text $i scan")).toDF("id", "t")
    val dict = Seq(("a", "scan")).toDF("tag", "kw")
    val p = plan(TextAnalysis.tagKeywords(docs, "id", "t", dict,
      "tag", "kw"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"dictionary should ride a broadcast nested loop:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffleExchange"),
      s"the corpus must not shuffle for tagging:\n$p")
  }

  test("lengthHistogram is scan + one agg; no join, no window") {
    val docs = (1 to 50).map(i => "a b c").toDF("text")
    val p = plan(Packing.lengthHistogram(docs, "text"))
    assert(!p.contains("Join") && !p.contains("Window"),
      s"length histogram must be a pure agg:\n$p")
  }

  test("hdrSketch is scan + one agg — no join, no window") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val p = plan(Stats.hdrSketch(df, Nil, "v")) // ungrouped global sketch
    assert(!p.contains("Join") && !p.contains("Window"),
      s"hdr bucketing must stay a pure agg:\n$p")
  }

  test("giniMoments ranks via the prefix scan, not a global window") {
    val df = (1 to 100).map(_.toLong).toDF("x")
    val p = plan(Stats.giniMoments(df, "x"))
    assert(!p.contains("Window"),
      s"global rank must ride the distributed prefix scan:\n$p")
  }

  test("kmvPairJaccard expands pairs against a broadcast group list") {
    val df = spark.range(100)
      .select(($"id" % 2).cast("string").as("g"), $"id".as("v"))
    val sk = Sketch.kmvSketch(df, Seq("g"), "v", 16)
    val p = plan(Sketch.kmvPairJaccard(sk, "g", 16))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"group list should broadcast:\n$p")
  }

  test("sortedNeighborPairs joins on rank+offset equality — no " +
      "cartesian, no range join") {
    val v = (1 to 50).map(i => f"w$i%03d").toDF("w")
    val p = plan(FuzzyJoin.sortedNeighborPairs(v, "w", window = 3))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"rank adjacency must be an equi-join:\n$p")
  }

  test("vocabOverlapWeighted expands pairs against a broadcast list") {
    val docs = Seq(("a", "x y z"), ("b", "y z w")).toDF("src", "text")
    val p = plan(TextAnalysis.vocabOverlapWeighted(docs, "src", "text"))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"group list should broadcast:\n$p")
  }

  test("ksPairs windows partition by pair, never a bare global sort") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val p = plan(Stats.ksPairs(df, "g", "v"))
    // the cumulative window's spec must lead with the pair columns
    // (windowspecdefinition(ga, gb, ...)) — a bare global-sort
    // window would have an empty partition prefix
    assert(p.contains("windowspecdefinition(ga"),
      s"pair windows must partition by (ga, gb):\n$p")
  }

  test("transitionProbs' k arrives by broadcast, not a driver action") {
    val ev = Seq((1L, "a", 10L, 1L), (1L, "b", 20L, 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val p = plan(Graph.transitionProbs(ev, "user_id", "event_type",
      col("ts"), col("event_id")))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row k aggregate should broadcast into the grid:\n$p")
  }

  // ---- round-13 operators ----

  test("uniquenessProfile is two aggs over one scan — no join") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val p = plan(Stats.uniquenessProfile(df, Seq("id", "s")))
    assert(!p.contains("Join"), s"no join expected:\n$p")
  }

  test("powerMoments is one map-side-combined agg, no window") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val p = plan(Stats.powerMoments(df, Seq("g"), "v"))
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("zipfOctaves totals attach by broadcast over the octave table") {
    val p = plan(TextAnalysis.zipfOctaves(
      Seq("a b c").toDF("text"), "text"))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"octave totals should broadcast:\n$p")
  }

  test("linearAttribution windows partition by conversion id") {
    val ev = Seq((1L, "view", 10L, 1L, 1.0),
      (1L, "buy", 20L, 2L, 3.0)).toDF("u", "t", "ts", "id", "v")
    val p = plan(Funnel.linearAttribution(ev, "u", "t", col("ts"),
      "id", expr("CAST(round(v*100) AS BIGINT)"), "buy",
      Seq("view"), 100L))
    assert(p.contains("windowspecdefinition(conv_id"),
      s"remainder ranking must partition by conv_id:\n$p")
  }

  test("tagKeywordsFast's only join is the broadcast tag attach") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val dict = Seq(("t", "a")).toDF("tag", "kw")
    val p = plan(TextAnalysis.tagKeywordsFast(docs, "doc_id", "text",
      dict, "tag", "kw"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"the corpus must never cross-join the dict:\n$p")
  }

  test("seasonalProfile totals broadcast back over the cell table") {
    val df = Seq(("g", 5L)).toDF("g", "ts")
    val p = plan(Resample.seasonalProfile(df, Seq("g"), col("ts"),
      40L, 4))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cupedAdjust pools by broadcast, one pass per frame") {
    val u = Seq(("A", 1L, 2L)).toDF("arm", "x", "y")
    val p = plan(Stats.cupedAdjust(u, "arm", "x", "y"))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"pooled moments should broadcast into arms:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("jaccardTopK rides the posting lists — no all-pairs join") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the lazy dog"),
      (97L, "quick dog")).toDF("doc_id", "text")
    val qs = docs.filter(col("doc_id") === 97L)
    val p = plan(Retrieval.jaccardTopK(docs, "doc_id", "text",
      qs, "doc_id", "text", k = 2))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"jaccard candidates must come from the token equi-join, " +
        s"never corpus x queries:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the audited query-term snapshot should broadcast:\n$p")
  }

  test("prioritySample publishes est_w as BIGINT") {
    val df = (1 to 50).map(i => (s"k$i", i.toLong)).toDF("key", "w")
    val out = Sampling.prioritySample(df, "key", "w", k = 5)
    assert(out.schema("est_w").dataType ==
      org.apache.spark.sql.types.LongType,
      "est_w is the published estimator column — BIGINT by contract")
  }

  test("bootstrapMeans cells aggregate before any exchange") {
    val df = Seq(("g", 1L, 1.0)).toDF("g", "id", "v")
    val p = plan(Stats.bootstrapMeans(df, Seq("g"), "v", "id", b = 4,
      loRank = 1, hiRank = 4))
    // the replicate window runs over the groups×b cell table, whose
    // partition spec leads with the group column
    assert(p.contains("windowspecdefinition(g"), p)
  }

  test("band-table self-pairing is an equi-join on band_key — " +
      "never all-pairs (the q292 sidecar-pairing shape)") {
    val docs = (1 to 40).map(i =>
      (i.toLong, s"some shared text body variant ${i % 5}"))
      .toDF("doc_id", "text")
    val bands = NearDedup.bandTable(docs, "doc_id", "text")
    val pairs = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val p = plan(pairs)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"band pairing must ride the band_key equi-join:\n$p")
  }

  test("hammingNearDups64 candidates ride the band-key equi-join") {
    val hs = (1 to 50).map(i => (i.toLong, i.toLong * 2654435761L))
      .toDF("id", "h")
    val p = plan(NearDedup.hammingNearDups64(hs, "id", "h"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"64-bit hamming candidates must meet in band buckets:\n$p")
  }

  test("bcubed and targetEncode are hash aggs + key joins — no window") {
    val items = (1 to 60).map(i => (s"c${i % 7}", s"l${i % 4}"))
      .toDF("c", "l")
    val p1 = plan(Dedup.bcubed(items, col("c"), col("l")))
    assert(!p1.contains("Window") && !p1.contains("CartesianProduct"),
      s"bcubed must stay aggs+joins:\n$p1")
    val rows = (1 to 60).map(i => (s"c${i % 5}", i.toLong, i.toLong % 3))
      .toDF("cat", "t", "fold")
    val p2 = plan(Stats.targetEncode(rows, "cat", "t", "fold"))
    assert(!p2.contains("Window"), s"targetEncode must not window:\n$p2")
    assert(p2.contains("HashAggregate"), p2)
  }

  test("contentDefined chunking is pure scan work — zero exchanges") {
    val docs = (1 to 30).map(i => (i.toLong, s"text body $i " * 20))
      .toDF("id", "text")
    val p = plan(Chunk.contentDefined(docs, "id", "text"))
    assert(!p.contains("Exchange"),
      s"CDC chunking must not shuffle:\n$p")
  }

  test("quantileNormalize: the order-statistic lookup broadcasts the " +
      "value-bounded histogram; the rank window is group-partitioned") {
    val rows = (1 to 200).map(i => (s"g${i % 4}", i.toLong, (i % 37).toLong))
      .toDF("g", "id", "v")
    val out = Stats.quantileNormalize(rows, "g", "v", "id")
    val p = plan(out)
    // the non-equi rank->value lookup is INTENTIONALLY a broadcast
    // nested loop against the histogram (bounded by the value
    // domain, never the row count) — assert the broadcast, and that
    // the within-group rank window carries a partition spec
    assert(p.contains("BroadcastExchange"),
      s"histogram lookup side must broadcast:\n$p")
    assert(!p.contains("Window [") ||
      p.contains("windowspecdefinition"), p)
  }

  test("kruskal rank attach: prefix-scan ranks, no window, no " +
      "cartesian") {
    val pts = (1 to 300).map(i => (s"g${i % 3}", (i % 17).toLong))
      .toDF("g", "v")
    val p = plan(Stats.kruskalStats(pts, "g", "v"))
    assert(!p.contains("Window"),
      s"pooled ranks must ride the prefix scan, not a global " +
        s"window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("km risk table: prefix-scan at-risk counts, no window") {
    // wilcoxon/kruskal's shared rank attach (doubledRanksFromHist)
    // is plan-covered by the kruskal test above; this asserts the
    // survival histogram path
    val ds = (1 to 200).map(i => (i % 9).toLong).toDF("d")
    val p = plan(Stats.kmRiskTable(
      ds.select(abs(col("d")).as("dur"),
        (col("d") > 0).cast("long").as("ev")), "dur", "ev"))
    assert(!p.contains("Window"),
      s"risk table must ride the prefix scan:\n$p")
  }

  test("join-skew advisor: key-histogram join, bounded top-k, " +
      "never the corpus") {
    val left = (1 to 500).map(i => s"k${i % 7}").toDF("k")
    val p = plan(Skew.joinSkewAdvisor(left, "k", left, "k",
      targetPairs = 100L, topK = 3))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must ride bounded heaps, not a full sort:\n$p")
    assert(p.contains("HashAggregate"),
      s"both sides must reduce to key histograms first:\n$p")
  }

  test("inclusion-dependency audit: distinct-frame join, no " +
      "cartesian") {
    val child = (1 to 200).map(i => (i % 50).toLong).toDF("k")
    val parent = (1 to 60).map(_.toLong).toDF("p")
    val p = plan(Stats.inclusionDependencies(Seq(
      ("c", child, "k", parent, "p"))))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }
}
