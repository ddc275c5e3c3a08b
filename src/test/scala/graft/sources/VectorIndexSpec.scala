package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Vector-aware file skipping: the IVF posting sidecar must (1) make
  * exhaustive search (nprobe = k) EQUAL integer brute force, (2)
  * actually skip files on a cell-clustered store at nprobe = 1, (3)
  * refresh incrementally — O(new entries) — and stay exact across
  * appends and merge-on-read deletes, (4) pin its centroid set. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    scratch(s"vecidx_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  private val Dim = 8

  /** 4 well-separated clusters on one-hot axes + deterministic
    * jitter; values stay in [-1, 1] (the unit-scale contract). */
  private def emb(id: Long): Seq[Double] = {
    val c = (id % 4).toInt
    (0 until Dim).map { d =>
      val jit = (((id * 31 + d * 17) % 7) - 3) / 100.0
      if (d == c) 0.9 + jit / 10 else jit
    }
  }

  private def rows(ids: Seq[Long]) =
    ids.map(i => (i, emb(i))).toDF("vec_id", "embedding")

  /** Integer rank key — the q316 formula, replicated independently
    * so the spec does not trust the implementation under test. */
  private def key(q: Seq[Double], c: Seq[Double]): Long = {
    def qz(v: Seq[Double]) = v.map(x => math.floor(x * 1e6).toLong)
    val (a, b) = (qz(q), qz(c))
    val dp = a.zip(b).map { case (x, y) => x * y }.sum
    val den = math.max(1L,
      math.floor(math.sqrt(a.map(x => (x * x).toDouble).sum)).toLong *
        math.floor(math.sqrt(b.map(x => (x * x).toDouble).sum)).toLong)
    (dp + 2L * den) * 100000L / den
  }

  test("exhaustive probe (nprobe = k) equals integer brute force; " +
      "nprobe = 1 on a cell-clustered store opens fewer files and " +
      "still finds the in-cell nearest") {
    val url = fresh("exact")
    val ids = (1L to 200L)
    // cluster the LAYOUT by the embedding's cluster id so postings
    // concentrate per file
    Snapshots.create(spark, url,
      rows(ids).withColumn("grp", (col("vec_id") % 4).cast("long")),
      nFiles = 8, clusterBy = Some("grp"))
    assert(VectorIndex.index(spark, url, "vec_id", "embedding", 4) > 0)
    val q = emb(42L) // in cluster 2
    val got = VectorIndex.search(spark, url, "vec_id", "embedding",
      q, topK = 5, nprobe = 4)
      .select("rank", "id").as[(Int, Long)].collect().toSeq
    val want = ids.map(i => (i, key(q, emb(i))))
      .sortBy { case (i, k) => (-k, i) }.take(5).map(_._1)
    assert(got.map(_._2) == want,
      s"exhaustive search ${got.map(_._2)} != brute force $want")
    // narrow probe: strictly fewer entries opened, same top-1 (the
    // query's own cluster holds its nearest neighbors)
    val v = Snapshots.latest(spark, url)
    val total = Snapshots.snap(spark, url, v).files.size
    val pruned = VectorIndex.prunedEntries(spark, url, v, q, 1)
    assert(pruned.size < total,
      s"vector pruning kept ${pruned.size}/$total")
    val top1 = VectorIndex.search(spark, url, "vec_id", "embedding",
      q, topK = 1, nprobe = 1)
      .select("id").as[Long].head()
    assert(top1 == want.head)
  }

  test("incremental refresh scans only new entries; appends and " +
      "MoR deletes stay exact; centroid k is pinned") {
    val url = fresh("incr")
    Snapshots.create(spark, url, rows(1L to 100L), nFiles = 4)
    assert(VectorIndex.index(spark, url, "vec_id", "embedding", 4)
      == 4)
    // append: only the new entries scan
    Snapshots.append(spark, url, rows(101L to 120L), nFiles = 2)
    val rescanned = VectorIndex.index(spark, url, "vec_id",
      "embedding", 4)
    assert(rescanned == 2, s"refresh scanned $rescanned entries")
    val q = emb(103L)
    def brute(ids: Seq[Long], k: Int): Seq[Long] =
      ids.map(i => (i, key(q, emb(i))))
        .sortBy { case (i, kk) => (-kk, i) }.take(k).map(_._1)
    val got = VectorIndex.search(spark, url, "vec_id", "embedding",
      q, topK = 5, nprobe = 4).select("id").as[Long].collect().toSeq
    assert(got == brute(1L to 120L, 5),
      "appended vectors not searched exactly")
    // MoR delete: the deleted vector disappears from results EVEN
    // BEFORE a refresh (stale postings admit the entry, the
    // effective read drops the row)
    Snapshots.deleteWhereMor(spark, url, "vec_id", 103L, 103L)
    val after = VectorIndex.search(spark, url, "vec_id", "embedding",
      q, topK = 5, nprobe = 4).select("id").as[Long].collect().toSeq
    assert(after == brute((1L to 120L).filterNot(_ == 103L), 5),
      "MoR delete not reflected in search")
    // refresh covers the composite entries (their effective rows)
    assert(VectorIndex.index(spark, url, "vec_id", "embedding", 4)
      >= 1)
    // a different k refuses: postings would be silently invalid
    val e = intercept[IllegalArgumentException] {
      VectorIndex.index(spark, url, "vec_id", "embedding", 8)
    }
    assert(e.getMessage.contains("re-train"))
  }
}
