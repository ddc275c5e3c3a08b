package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("resizeNearest: 8x8 -> 4x4 picks every other pixel; identity at same size") {
    val px = (0 until 64).map(_.toShort)
    val df = Seq(Tuple1(px)).toDF("data")
    val out = df.select(GraftFunctions.resizeNearest(
        array(lit(8), lit(8)), $"data", 4, 4).as("r"))
      .select($"r.dims", $"r.data").as[(Seq[Int], Seq[Short])].head()
    assert(out._1 == Seq(4, 4))
    assert(out._2.map(_.toInt) ==
      (for (y <- 0 until 4; x <- 0 until 4) yield 16 * y + 2 * x))
    val id = df.select(GraftFunctions.resizeNearest(
        array(lit(8), lit(8)), $"data", 8, 8).as("r"))
      .select($"r.data").as[Seq[Short]].head()
    assert(id == px)
  }

  test("resizeNearest: upscaling and 3-channel images") {
    // 2x2x3: pixel (y,x) has channels (v, v+100, v+200), v = 2y+x
    val px = (for (y <- 0 until 2; x <- 0 until 2;
                   c <- 0 until 3) yield (2 * y + x + 100 * c).toShort)
    val df = Seq(Tuple1(px)).toDF("data")
    val out = df.select(GraftFunctions.resizeNearest(
        array(lit(2), lit(2), lit(3)), $"data", 4, 4).as("r"))
      .select($"r.dims", $"r.data").as[(Seq[Int], Seq[Short])].head()
    assert(out._1 == Seq(4, 4, 3))
    // (3,3) maps back to source (1,1) = v 3
    val last = out._2.takeRight(3).map(_.toInt)
    assert(last == Seq(3, 103, 203))
  }

  test("frameSample slices fixed frames; frameCount floors; empty-safe") {
    val bytes = Array.tabulate[Byte](25)(_.toByte) // 3 whole 8-byte frames + 1
    val df = Seq(Tuple1(bytes)).toDF("vid")
    val r = df.select(
      Multimodal.frameCount($"vid", 8).as("n"),
      Multimodal.frameSample($"vid", 8, 2).as("fr"))
    val (n, fr) = r.as[(Int, Seq[Array[Byte]])].head()
    assert(n == 3)
    assert(fr.length == 2) // frames 0 and 2
    assert(fr(0).toSeq == (0 until 8).map(_.toByte))
    assert(fr(1).toSeq == (16 until 24).map(_.toByte))
    val empty = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("vid")
      .select(Multimodal.frameSample($"vid", 8, 2))
      .as[Seq[Array[Byte]]].head()
    assert(empty.isEmpty)
  }

  test("decodePcm16: little-endian signed samples, odd tail ignored") {
    val bytes = Array[Byte](0x01, 0x00, 0xFF.toByte, 0x7F, 0x00, 0x80.toByte, 0x2A)
    val out = Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.decodePcm16($"b")).as[Seq[Short]].head()
    assert(out == Seq[Short](1, 32767, -32768))
  }

  test("firstFrame is the initial fixed-size slice") {
    val bytes = Array.tabulate[Byte](20)(_.toByte)
    val f = Seq(Tuple1(bytes)).toDF("vid")
      .select(Multimodal.firstFrame($"vid", 8)).as[Array[Byte]].head()
    assert(f.toSeq == (0 until 8).map(_.toByte))
  }

  test("pcm16FrameZcr counts sign changes within frames only") {
    def pcm(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(s => Seq((s & 0xFF).toByte,
        ((s >> 8) & 0xFF).toByte)).toArray
    // frame size 4: frame0 = [1,-1,1,-1] → 3 crossings;
    // frame1 = [0,5,7,2] → 0 (zero counts as positive);
    // frame2 = [-3,-3,4,9] → 1; trailing partial [8] dropped.
    // Boundary -1 → 0 between frames 0/1 must NOT count.
    val bytes = pcm(Seq(1, -1, 1, -1, 0, 5, 7, 2, -3, -3, 4, 9, 8))
    val got = Seq(Tuple1(bytes)).toDF("b")
      .select(graft.functions.GraftFunctions
        .pcm16FrameZcr(col("b"), 4).as("z"))
      .as[Seq[Long]].head()
    assert(got == Seq(3L, 0L, 1L))
  }
  test("constellationMatches: the posting-cap window adds no extra " +
      "exchange — every shuffle carries (fp, id) pairs, no payloads") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val fps = (1L to 50L).flatMap(id =>
      (0L until 8L).map(k => (id, id % 5 + k * 100)))
      .toDF("doc_id", "fp")
    val d = Multimodal.constellationMatches(fps, "doc_id",
      minShared = 1L, minContainPpm = 0L, maxPosting = 100L)
    d.collect()
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: e.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val ex = exchanges(d.queryExecution.executedPlan)
    // one fp exchange for the cap window (reused by the equi-join
    // probe side), per-id count aggs, and the final pair agg — the
    // cap must NOT introduce a second corpus-wide fp exchange per
    // join side (that would double the dominant shuffle at scale)
    val fpExchanges = ex.count(_.outputPartitioning.toString
      .contains("fp"))
    assert(fpExchanges <= 2, s"fp exchanged $fpExchanges times:\n" +
      d.queryExecution.executedPlan.toString.take(4000))
    val names = ex.flatMap(_.child.output.map(_.name)).toSet
    assert(names.subsetOf(Set("fp", "__id", "id_a", "id_b", "__n",
      "n_shared", "__pc", "count", "__na")) ||
      names.forall(n => !n.contains("pcm") && !n.contains("text")),
      s"unexpected exchange columns: $names")
  }

  test("constellationMatches: hot fingerprints are dropped by maxPosting") {
    // fp 111 is "silence" — held by every id (posting list 4 > cap 2);
    // fps 201..204 are discriminative and shared only by ids 1 and 2.
    val hot = (1L to 4L).map(id => (id, 111L))
    val disc = Seq(201L, 202L, 203L, 204L).flatMap(fp =>
      Seq((1L, fp), (2L, fp)))
    val lone = Seq((3L, 301L), (4L, 401L)) // so every id keeps some fps
    val fps = (hot ++ disc ++ lone).toDF("doc_id", "fp")
    val capped = Multimodal.constellationMatches(fps, "doc_id",
        minShared = 3L, minContainPpm = 600000L, maxPosting = 2L)
      .collect()
    // only (1,2) survives: 4 shared kept fps, containment 4/4
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    assert(capped.head.getLong(2) == 4L)      // n_shared excludes fp 111
    assert(capped.head.getLong(3) == 1000000L) // denominators exclude it too
    // uncapped, the hot fp inflates every pair's candidate set: with a
    // high cap the (1,2) pair counts 5 shared fps
    val open = Multimodal.constellationMatches(fps, "doc_id",
        minShared = 3L, minContainPpm = 0L, maxPosting = 100L)
      .collect()
    val p12 = open.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(p12.getLong(2) == 5L)
  }
}
