package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph, NearDedup}

/** Hot-key skew soak for the iterative/graph family — the failure
  * mode local[32]@sf0.1 cannot surface (r13 verdict task #7): a
  * zipfian key distribution at ~10× sf0.1 volume, with per-stage
  * per-task metrics captured by a listener, so the worst
  * task-vs-mean ratio is MEASURED, not assumed. The three targets
  * are the ops whose scale story leans on iterative exchanges:
  * [[Dedup.clusters]] (pointer-jumping CC under a giant star
  * component), [[Graph.pageRankInt]] (hub vertex holding ~10% of all
  * edges), [[NearDedup.jaccardJoin]] (one shingle shared by a third
  * of the corpus). Results are recorded in BASELINE.md ("Skew soak"
  * section); re-run with `sbt "runMain graft.SkewSoak"` after
  * touching any of the three.
  *
  * Skew synthesis is deterministic (md5-keyed inverse-CDF zipf, no
  * RNG state) so recorded numbers reproduce. A stage's ratio is
  * max/mean over its tasks for duration and shuffle-read bytes;
  * only stages with ≥ 4 tasks and non-trivial work (≥ 16 KB total
  * shuffle read or ≥ 2 s total task time) are reported (tiny stages
  * make ratios meaningless — AQE coalesces small exchanges). */
object SkewSoak {
  private final class Capture extends SparkListener {
    val stages = scala.collection.concurrent.TrieMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        val buf = stages.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty)
        buf.synchronized {
          buf += ((m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead))
        }
      }
    }
  }

  private def report(spark: SparkSession, label: String)
      (run: => Long): Unit = {
    val cap = new Capture
    spark.sparkContext.addSparkListener(cap)
    val t0 = System.nanoTime()
    val rows = run
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(cap)
    // worst stage by duration ratio among meaningful stages
    val metrics = cap.stages.toSeq.flatMap { case (sid, buf) =>
      val ms = buf.map(_._1.toDouble)
      val sh = buf.map(_._2.toDouble)
      if (ms.length < 4 || (sh.sum < 16384 && ms.sum < 2000)) None
      else Some((sid, ms.length,
        ms.max, ms.sum / ms.length,
        sh.max, sh.sum / sh.length))
    }
    val worst = metrics.sortBy { case (_, _, mx, mn, _, _) =>
      -(mx / math.max(mn, 1.0)) }.take(3)
    println(f"[skew] $label: rows=$rows wall=$sec%.1fs " +
      s"stages_measured=${metrics.length}")
    worst.foreach { case (sid, n, mxMs, mnMs, mxSh, mnSh) =>
      println(f"[skew]   stage $sid: tasks=$n " +
        f"dur max/mean=${mxMs / 1000}%.1fs/${mnMs / 1000}%.2fs " +
        f"(x${mxMs / math.max(mnMs, 1.0)}%.1f) " +
        f"shuffle max/mean=${mxSh / 1048576}%.1fMB/" +
        f"${mnSh / 1048576}%.2fMB " +
        f"(x${mxSh / math.max(mnSh, 1.0)}%.1f)")
    }
  }

  /** Deterministic uniform in (0, 1] from a seeded key. */
  private def u01(seed: String): org.apache.spark.sql.Column =
    (conv(substring(md5(concat(lit(seed), col("id").cast("string"))),
      1, 15), 16, 10).cast("double") + 1.0) / 1.152921504606847e18

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-skew-soak")
    import spark.implicits._

    val nEvents = 1000000L // 10x sf0.1 events
    val nDocs = 50000L     // 10x sf0.1 documents
    val nUsers = 50000.0

    // zipf(~1) user ids by inverse CDF: uid = floor(exp(u·ln U)) —
    // rank-1 holds ~1/ln(U) ≈ 9% of all rows (the hot key)
    def zipfId(seed: String) =
      floor(exp(u01(seed) * math.log(nUsers))).cast("long")

    // --- Dedup.clusters: giant star component -------------------
    // ~9% of 1M pair rows name the same id_a: the CC iteration must
    // not funnel the star through one task
    val pairs = spark.range(nEvents).toDF("id")
      .select(zipfId("a:").as("id_a"), (col("id") + 1000000L).as("id_b"))
    report(spark, "dedup_clusters_star") {
      Dedup.clusters(pairs).count()
    }

    // --- Graph.pageRankInt: hub vertex --------------------------
    val edges = spark.range(nEvents).toDF("id")
      .select(zipfId("s:").as("src"), zipfId("d:").as("dst"),
        lit(1L).as("w"))
      .filter(col("src") =!= col("dst"))
    report(spark, "pagerank_hub") {
      Graph.pageRankInt(edges, "src", "dst", "w", iterations = 5)
        .count()
    }

    // --- NearDedup.jaccardJoin: hot shingle ---------------------
    // 2% of the corpus (1k docs) shares one leading phrase whose
    // shingles land INSIDE the θ=0.5 prefixes — the quadratic-block
    // hazard: every sharing pair becomes a candidate (~500k pairs
    // through one shingle's block) while unique tails keep true
    // similarity below θ, so the output is empty and the entire cost
    // is the hot block. At θ=0.9 the same corpus generates ZERO hot
    // candidates (prefixes keep only the rarest 1-2 shingles) — the
    // prefix filter itself is the skew defense; this measures the
    // threshold regime where it cannot help.
    val docs = spark.range(nDocs).toDF("id")
      .select(col("id").as("doc_id"),
        concat(
          when(pmod(col("id"), lit(50)) === 0,
            lit("the quick brown fox jumps over the lazy dog "))
            .otherwise(lit("")),
          lit("tail"), col("id").cast("string"), lit(" mid"),
          pmod(col("id"), lit(977)).cast("string"), lit(" end"),
          pmod(col("id"), lit(9973)).cast("string")).as("text"))
    report(spark, "jaccard_join_hot_shingle") {
      NearDedup.jaccardJoin(docs, "doc_id", "text",
        minJaccardPpm = 500000L).count()
    }

    // --- JoinView.refresh: hot dim key -------------------------
    // the rank-1 zipf uid holds ~9% of 1M fact rows; ONE dim
    // mutation on that uid drives the dim-side invalidation
    // (file-stats-pruned fact probe + broadcast semi-join), a ~90k
    // re-join and a bloom-pruned copy-on-write view upsert — the
    // IVM path must not funnel the hot key through one task
    val soakBase = sys.props("java.io.tmpdir") + "/graft_skewsoak_" +
      java.util.UUID.randomUUID().toString.take(8)
    val factStore = s"$soakBase/fact"; val dimStore = s"$soakBase/dim"
    val view = s"$soakBase/view"; val idx = s"$soakBase/idx"
    try {
      val fact = spark.range(nEvents).toDF("id")
        .select(col("id").as("ok"), zipfId("jv:").as("uid"),
          (col("id") % 997L).as("cents"))
      val dim = spark.range(50000L).toDF("id")
        .select((col("id") + 1L).as("uid"),
          concat(lit("seg"), pmod(col("id"), lit(7))).as("seg"))
      graft.sources.Snapshots.create(spark, factStore, fact,
        nFiles = 32, clusterBy = Some("uid"))
      graft.sources.Snapshots.indexStats(spark, factStore, Seq("uid"))
      graft.sources.Snapshots.create(spark, dimStore, dim, nFiles = 2)
      graft.sources.JoinView.init(spark, view, factStore, dimStore,
        "ok", "uid", nFiles = 32, clusterByFactKey = true)
      graft.sources.RowGroupIndex.buildBloom(spark, view, Seq("ok"),
        idx)
      graft.sources.Snapshots.upsert(spark, dimStore,
        spark.range(1).select(lit(1L).as("uid"),
          lit("HOT").as("seg")), "uid")
      report(spark, "join_view_hot_dim_refresh") {
        graft.sources.JoinView.refresh(spark, view, factStore,
          dimStore, bloomIndexUrl = Some(idx))
        graft.sources.JoinView.read(spark, view)
          .filter(col("seg") === "HOT").count()
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(soakBase)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }

    spark.stop()
  }
}
