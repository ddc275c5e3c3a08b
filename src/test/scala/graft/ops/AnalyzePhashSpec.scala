package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 batch nine: analyzeTable column stats, perceptual-hash
  * near-dup (dhash64 + 64-bit banded hamming join). */
class AnalyzePhashSpec extends SparkSpec {
  import spark.implicits._

  test("analyzeTable: counts, nulls, exact NDV and KMV state per column") {
    val df = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("b"), None),
      (3L, Some("a"), None),
      (4L, None, None)).toDF("id", "cat", "mostly_null")
    val got = Stats.analyzeTable(df, Seq("id", "cat", "mostly_null"), k = 2)
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        col("kmv_n"), col("est_distinct"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, 2L, got("id")._6)))
    assert(got("id")._6 >= 1L) // k-th-min estimate is positive
    // kmv_n == k engages the (k-1)·2^60/kth_min estimator (noisy at
    // k=2; only kmv_n < k is exact) — check the state, not the value
    assert(got("cat")._1 == "cat" && got("cat")._2 == 4L &&
      got("cat")._3 == 1L && got("cat")._4 == 2L &&
      got("cat")._5 == 2L && got("cat")._6 >= 1L)
    // with fewer distinct than k the estimate is exact
    assert(got("mostly_null") == (("mostly_null", 4L, 3L, 1L, 1L, 1L)))
  }

  test("dhash64 encodes gradient directions bit for bit") {
    // 8 rows x 9 cols; row r strictly increasing -> all bits 0;
    // strictly decreasing -> all row bits 1
    val inc = (0 until 72).map(_.toLong % 9)                 // 0..8 per row
    val dec = (0 until 72).map(i => 8L - (i % 9))
    val got = Seq((1L, inc), (2L, dec)).toDF("id", "img")
      .select(col("id"), Multimodal.dhash64(col("img")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L)   // no descending step anywhere
    assert(got(2L) == -1L)  // every one of the 64 bits set
    // dropping pixel 1 far below its neighbours flips bit 0 only
    // (p0 > p1 becomes true; p1 > p2 stays false)
    val oneFlip = inc.updated(1, -5L)
    val h = Seq((3L, oneFlip)).toDF("id", "img")
      .select(Multimodal.dhash64(col("img"))).as[Long].head()
    assert(h == 1L)
  }

  test("pcmConstellation: fingerprints are whole-frame shift invariant") {
    // PCM16LE bytes from sample values; frame = 8 samples
    def pcm(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(v => Seq((v & 0xff).toByte,
        ((v >> 8) & 0xff).toByte)).toArray
    // energy profile across frames: quiet / LOUD / quiet / LOUD /
    // quiet / louder / quiet — three interior peaks
    val frames = Seq(10, 3000, 20, 5000, 30, 8000, 40)
    val samples = frames.flatMap(a => Seq.fill(8)(a))
    val shifted = Seq.fill(16)(0) ++ samples // +2 whole frames
    val df = Seq((1L, pcm(samples)), (2L, pcm(shifted)))
      .toDF("id", "pcm")
    val fps = Multimodal.pcmConstellation(df, "id", "pcm",
        frameSamples = 8)
      .as[(Long, Long)].collect()
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert(a.nonEmpty)
    // the original's fingerprints all survive the 2-frame shift
    assert(a.subsetOf(b), s"lost fingerprints: ${a.diff(b)}")
    // 3 peaks -> pairs (1,2),(1,3),(2,3) = 3 fingerprints
    assert(a.size == 3)
  }

  test("hammingNearDups64 equals brute force and honors the pigeonhole bound") {
    var st = 7L
    def next(): Long = {
      st = st * 6364136223846793005L + 1442695040888963407L; st
    }
    // 40 random hashes + planted near pairs at known distances
    val rnd = (0 until 40).map(i => (i.toLong, next()))
    val planted = rnd.take(8).zipWithIndex.map { case ((id, h), d) =>
      // flip exactly d low bits -> hamming == d
      (100L + id, h ^ ((1L << d) - 1))
    }
    val all = rnd ++ planted
    val got = NearDedup.hammingNearDups64(all.toDF("id", "h"), "id", "h",
        maxHamming = 7, maxBucket = 1000)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d)).toSet
    assert(got == want)
    // the planted distances 0..7 are all present
    (0 until 8).foreach { d =>
      assert(want.exists(_._3 == d), s"planted distance $d missing")
    }
    // maxHamming >= 8 is refused (no recall guarantee past the bands)
    val e = intercept[IllegalArgumentException] {
      NearDedup.hammingNearDups64(all.toDF("id", "h"), "id", "h",
        maxHamming = 8)
    }
    assert(e.getMessage.contains("recall"))
  }
}
