package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 batch eight: content-defined chunking, cross-doc shared
  * substrings, l-diversity. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  test("cdc chunks concatenate back to the original text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 20),
      (2L, "short"),
      (3L, "x" * 300),
      (4L, "")).toDF("id", "text")
    val got = Chunk.contentDefined(docs, "id", "text")
      .orderBy(col("id"), col("chunk_idx"))
      .select(col("id"), col("chunk"))
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).mkString).toMap
    val want = docs.select(col("id"), col("text")).as[(Long, String)]
      .collect().toMap
    // empty text yields no chunks; everything else must round-trip
    assert(got.keySet == Set(1L, 2L, 3L))
    got.foreach { case (id, s) => assert(s == want(id)) }
  }

  test("cdc boundaries survive a prefix insertion (the shift-resilience property)") {
    // NON-periodic base (a periodic text lets fixed-size chunks
    // re-align by accident through the period)
    var st = 123456789L
    val base = {
      val sb = new StringBuilder
      while (sb.length < 3000) {
        st = st * 6364136223846793005L + 1442695040888963407L
        val w = (st >>> 33) % 9999
        sb.append("w").append(w).append(' ')
      }
      sb.toString
    }
    val docs = Seq((1L, base), (2L, "INSERTED PREFIX >>> " + base))
      .toDF("id", "text")
    val chunks = Chunk.contentDefined(docs, "id", "text")
      .select(col("id"), col("chunk")).as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = a.intersect(b).size
    // all but the first chunk(s) around the edit must re-align
    assert(shared >= (a.size * 8) / 10,
      s"only $shared of ${a.size} chunks re-aligned after the prefix edit")
    // a fixed-size splitter under the same edit shares almost nothing
    val w = 64
    val fixA = base.grouped(w).toSet
    val fixB = ("INSERTED PREFIX >>> " + base).grouped(w).toSet
    assert(fixA.intersect(fixB).size < shared / 2)
  }

  test("cdc kernel matches a direct positional-polynomial replay") {
    // independent reimplementation: boundary at 1-based i >= 16 where
    // sum_{k=0..15} cp(i-15+k) * 257^(15-k) mod 1e9+7 ≡ 0 mod 64
    val text = "abcdefghij klmnopqrst uvwxyz 0123456789 " * 12
    val M = 1000000007L
    val pw = Iterator.iterate(1L)(p => p * 257L % M).take(16).toArray
    val cps = text.codePoints().toArray
    val bounds = (16 to cps.length).filter { i =>
      val h = (0 until 16).map(k =>
        cps(i - 16 + k) * pw(15 - k) % M).sum % M
      h % 64 == 0
    }
    val want = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    bounds.foreach { e => want += text.substring(start, e); start = e }
    if (start < text.length) want += text.substring(start)
    val got = Seq(Tuple1(text)).toDF("text")
      .select(Chunk.cdcChunks(col("text"), 16, 64))
      .as[Seq[String]].head()
    assert(got == want.toSeq)
  }

  test("crossDocShared finds exactly the max shared substring per doc pair") {
    val docs = Seq(
      (1L, "aaaa SHARED-SECRET-PHRASE bbbb"),
      (2L, "cccc SHARED-SECRET-PHRASE dddd"),
      (3L, "eeee no overlap here ffff"),
      (4L, "gggg no overlap here hhhh")).toDF("doc_id", "text")
    val got = SuffixArray.crossDocShared(docs, "doc_id", "text",
        maxLen = 100, minLen = 10)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // " SHARED-SECRET-PHRASE " is 22 chars incl both spaces
    assert(got((1L, 2L)) == 22L)
    assert(got((3L, 4L)) == 17L) // " no overlap here "
    // pairs below minLen are absent
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 4L)))
  }

  test("crossDocShared certificate contract holds against brute force") {
    var state = 42L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state >>> 33
    }
    val docs = (0 until 12).map { i =>
      val s = new StringBuilder
      (0 until 60).foreach(_ =>
        s.append(if (next() % 2 == 0) 'a' else 'b'))
      (i.toLong, s.toString)
    }
    val minLen = 8
    val got = SuffixArray.crossDocShared(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen = 60, minLen = minLen)
      .as[(Long, Long, Long)].collect()
    def lcsub(a: String, b: String): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var k = 0
        while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k))
          k += 1
        best = math.max(best, k)
      }
      best
    }
    val byId = docs.toMap
    val truePair = (for {
      x <- docs; y <- docs if x._1 < y._1
    } yield (x._1, y._1) -> lcsub(x._2, y._2).toLong).toMap
    assert(got.nonEmpty)
    // SOUND: every certificate is a real shared substring >= minLen
    got.foreach { case (a, b, l) =>
      assert(l >= minLen && l <= truePair((a, b)),
        s"($a,$b): certified $l but true max is ${truePair((a, b))}")
    }
    // CORPUS-MAX EXACT
    assert(got.map(_._3).max == truePair.values.max)
    // DOC-COVERING: every doc with a >= minLen partner is reported
    val coveredDocs = got.flatMap(r => Seq(r._1, r._2)).toSet
    val needCover = docs.map(_._1).filter(d =>
      truePair.exists { case ((a, b), l) =>
        (a == d || b == d) && l >= minLen }).toSet
    assert(needCover.subsetOf(coveredDocs))
    // and with byId in scope: certificates never exceed doc length
    got.foreach { case (a, _, l) =>
      assert(l <= byId(a).length.toLong) }
  }

  test("crossDocShared strings-once arm (forced threshold) matches " +
      "the default double-shuffle arm") {
    val docs = Seq(
      (1L, "aaaa SHARED-SECRET-PHRASE bbbb"),
      (2L, "cccc SHARED-SECRET-PHRASE dddd"),
      (3L, "eeee no overlap here ffff"),
      (4L, "gggg no overlap here hhhh"),
      (5L, "zzzz SHARED-SECRET-PHRASE ends")).toDF("doc_id", "text")
    def run(): Set[(Long, Long, Long)] =
      SuffixArray.crossDocShared(docs, "doc_id", "text",
        maxLen = 100, minLen = 10)
        .as[(Long, Long, Long)].collect().toSet
    val key = "spark.graft.crossDocStringsOnceRows"
    val viaDefault = run()
    spark.conf.set(key, "0") // every corpus takes the slim arm
    val viaSlim = try run() finally spark.conf.unset(key)
    assert(viaSlim == viaDefault,
      s"arms disagree:\n slim=$viaSlim\n full=$viaDefault")
    assert(viaSlim.exists { case (a, b, l) =>
      a == 1L && b == 2L && l == 22L })
  }

  test("lDiversity histogram on a hand-built table") {
    val rows = Seq(
      ("q1", "s1"), ("q1", "s1"),              // class q1: diversity 1
      ("q2", "s1"), ("q2", "s2"),              // class q2: diversity 2
      ("q3", "s1"), ("q3", "s2"), ("q3", "s3") // class q3: diversity 3
    ).toDF("qi", "sens")
    val got = Stats.lDiversity(rows, Seq("qi"), "sens", l = 2)
      .select(col("diversity"), col("n_classes"), col("n_rows"),
        col("at_risk"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 2L, 1L), (2L, 1L, 2L, 0L),
      (3L, 1L, 3L, 0L)))
  }
}
