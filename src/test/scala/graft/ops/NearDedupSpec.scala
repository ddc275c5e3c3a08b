package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private lazy val docs = Seq(
    (1L, base),
    (2L, base + " extra"),                       // near-dup of 1
    (3L, "completely different content about databases and query engines here"),
    (4L, base),                                  // exact dup of 1
    (5L, "yet another unrelated document with distinct vocabulary entirely"))
    .toDF("doc_id", "text")

  test("shingles: distinct word trigrams; short docs collapse to whole text") {
    val sh = docs.filter($"doc_id" === 1)
      .select(NearDedup.shingles($"text")).as[Seq[String]].collect()(0)
    assert(sh.contains("the quick brown"))
    assert(sh.contains("far away today"))
    assert(sh.length == 12) // 14 tokens → 12 trigrams, all distinct
    val short = Seq(Tuple1("only two")).toDF("text")
      .select(NearDedup.shingles($"text")).as[Seq[String]].collect()(0)
    assert(short == Seq("only two"))
  }

  test("minhash signature is deterministic and k-long") {
    val sigs = NearDedup.signatures(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(sigs.forall(_._2.length == 16))
    assert(sigs(0)._2 == sigs(3)._2) // identical text → identical signature
    assert(sigs(0)._2 != sigs(2)._2)
  }

  test("candidate pairs find exact and near dups, not unrelated docs") {
    val pairs = NearDedup.candidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(5L) })
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(3L, 1L) })
  }

  test("jaccard verify: exact dup → 1.0; near dup high; computed exactly") {
    val nd = NearDedup.nearDuplicates(docs, "doc_id", "text")
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(nd((1L, 4L)) == 1.0)
    nd.get((1L, 2L)).foreach(j => assert(j > 0.7 && j < 1.0))
  }

  test("band-bucket cap bounds degenerate-doc blowup (skew bomb)") {
    // 300 identical empty-ish docs share one whole-text shingle →
    // identical signatures → ONE band bucket. Uncapped that is
    // 300·299/2 = 44,850 pairs; capped the bucket is dropped.
    val degenerate = (1L to 300L).map(i => (i, "x")).toDF("doc_id", "text")
    val capped = NearDedup.candidatePairs(degenerate, "doc_id", "text",
      maxBucket = 100)
    assert(capped.count() == 0)
    // real near-dups below the cap are unaffected
    val mixed = degenerate.unionByName(docs.filter($"doc_id".isin(1L, 4L))
      .select($"doc_id" + 1000 as "doc_id", $"text"))
    val pairs = NearDedup.candidatePairs(mixed, "doc_id", "text",
      maxBucket = 100).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1001L, 1004L)))
  }

  test("capped band buckets are observable, never silently gone") {
    val degenerate = (1L to 300L).map(i => (i, "x")).toDF("doc_id", "text")
    val dropped = NearDedup.droppedBandBuckets(degenerate, "doc_id", "text",
      maxBucket = 100).as[(String, Long)].collect()
    assert(dropped.length == 4) // all 4 bands of the shared signature
    assert(dropped.forall(_._2 == 300L))
    // under the cap → nothing reported
    assert(NearDedup.droppedBandBuckets(docs, "doc_id", "text").count() == 0)
  }

  test("embedding dedup refuses a degenerate explicit geometry and derives a sane one") {
    val vecs = (0L until 600L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 131.0 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    // explicit planes=1 (2 buckets) with maxBucket=50 → expected
    // width 300 ≫ cap: every bucket would be dropped. Must refuse
    // with the corrective plane count, not return an empty frame.
    val ex = intercept[IllegalArgumentException](
      NearDedup.embeddingNearDups(vecs, "vec_id", "embedding",
        minCosM = 900000L, planes = 1, dim = 8, maxBucket = 50))
    assert(ex.getMessage.contains("degenerate LSH geometry"))
    assert(ex.getMessage.contains("planes >= 4")) // planesFor(600, 50) = 4
    // derived geometry (planes=0) runs fine on the same inputs
    NearDedup.embeddingNearDups(vecs, "vec_id", "embedding",
      minCosM = 999999L, dim = 8).count()
    // and runtime skew drops are reported, not silent: all-identical
    // vectors land in ONE bucket over the cap
    val same = (0L until 200L).map(i => (i, Seq.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val rep = NearDedup.embeddingDroppedBuckets(same, "vec_id", "embedding",
      planes = 2, dim = 8, maxBucket = 100).as[(Long, Long)].collect()
    assert(rep.length == 1 && rep(0)._2 == 200L)
    assert(NearDedup.embeddingNearDups(same, "vec_id", "embedding",
      minCosM = 0L, planes = 2, dim = 8, maxBucket = 100).count() == 0)
  }

  test("simhashNearDups: banded candidates find exact/near pairs; guarantee holds") {
    val pairs = NearDedup.simhashNearDups(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.exists { case (a, b, h) => (a, b) == (1L, 4L) && h == 0 })
    assert(pairs.forall(_._3 <= 3)) // verify stage semantic
    // pigeonhole guarantee: ANY pair within hamming 3 must surface —
    // force one by giving two docs identical token multisets shuffled
    val forced = Seq((100L, "alpha beta gamma delta epsilon"),
      (200L, "epsilon delta gamma beta alpha")).toDF("doc_id", "text")
    val f = NearDedup.simhashNearDups(forced, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(f == Set((100L, 200L, 0))) // order-free hash → identical
    // maxHamming >= 4 breaks the banding guarantee and is refused
    intercept[IllegalArgumentException](
      NearDedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 4))
  }

  test("simhash: equal for identical text, hamming 0; different for unrelated") {
    val sh = docs.select($"doc_id", NearDedup.simhash32($"text").as("s"))
      .orderBy("doc_id").as[(Long, Long)].collect().map(x => x._1 -> x._2).toMap
    assert(sh(1L) == sh(4L))
    assert(sh(1L) != sh(3L))
    assert(sh.values.forall(v => v >= 0 && v <= 0xFFFFFFFFL))
    val hd = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 4)
      .select(NearDedup.hammingDistance(
        NearDedup.simhash32(col("a.text")), NearDedup.simhash32(col("b.text"))))
      .as[Int].collect()(0)
    assert(hd == 0)
  }

  test("incremental pairs equal the cross-side slice of the self-join") {
    // split the fixture: new batch = {1, 3}, corpus = the rest. The
    // incremental band join must find exactly the candidate pairs
    // with one end on each side (bands are per-doc deterministic).
    val newBatch = docs.filter($"doc_id".isin(1L, 3L))
    val corpus = docs.filter(!$"doc_id".isin(1L, 3L))
    val inc = NearDedup.incrementalPairs(newBatch,
      NearDedup.bandTable(corpus, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val self = NearDedup.candidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val crossSlice = self.flatMap { case (a, b) =>
      val (n, c) = (Set(1L, 3L).contains _, (x: Long) => !Set(1L, 3L)(x))
      (if (n(a) && c(b)) Seq((a, b)) else Nil) ++
        (if (n(b) && c(a)) Seq((b, a)) else Nil)
    }
    assert(inc == crossSlice && inc.nonEmpty)
    // 1's dup (4) and near-dup (2) are in the corpus side
    assert(inc.contains((1L, 4L)) && inc.contains((1L, 2L)))
  }

  test("incremental verify computes exact ppm; threshold filters") {
    val newBatch = docs.filter($"doc_id" === 1L)
    val corpus = docs.filter($"doc_id" =!= 1L)
    val m = NearDedup.incrementalNearDuplicates(newBatch, corpus,
      "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    assert(m((1L, 4L)) == 1000000L) // exact dup
    assert(m((1L, 2L)) > 500000L && m((1L, 2L)) < 1000000L)
    val thresholded = NearDedup.incrementalNearDuplicates(newBatch, corpus,
      "doc_id", "text", minJaccardPpm = 999999L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(thresholded.map(t => (t._1, t._2)) == Seq((1L, 4L)))
  }

  test("incremental corpus-side bucket cap drops the accreted bucket") {
    // 30 identical corpus docs collapse into one band bucket wider
    // than the cap; the new doc must then match NOTHING (the drop is
    // the documented skew-protection trade)
    val corpus = (10L until 40L).map(i => (i, base)).toDF("doc_id", "text")
    val newBatch = Seq((1L, base)).toDF("doc_id", "text")
    val capped = NearDedup.incrementalPairs(newBatch,
      NearDedup.bandTable(corpus, "doc_id", "text"), "doc_id", "text",
      maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = NearDedup.incrementalPairs(newBatch,
      NearDedup.bandTable(corpus, "doc_id", "text"), "doc_id", "text",
      maxBucket = 1000)
    assert(uncapped.count() == 30)
  }

  test("incremental pairs work from a PERSISTED band table (no re-hash)") {
    val corpus = docs.filter($"doc_id" =!= 1L)
    val url = scratch("band-table")
    NearDedup.bandTable(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(url)
    val fromStore = NearDedup.incrementalPairs(
      docs.filter($"doc_id" === 1L), spark.read.parquet(url),
      "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val inline = NearDedup.incrementalPairs(
      docs.filter($"doc_id" === 1L),
      NearDedup.bandTable(corpus, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(fromStore == inline && fromStore.nonEmpty)
  }

  test("unicode opt-in: Cyrillic/CJK near-dups are found; the ASCII " +
      "tokenizer degenerately collapses all non-Latin docs (r7 advice)") {
    val ru = "привет мир как дела сегодня дорогой друг мой хороший"
    val cjk = "这是 一段 中文 文本 用来 测试 分词 去重 功能 正常"
    val multi = Seq(
      (1L, ru), (2L, ru + " совсем"),
      (3L, cjk), (4L, cjk + " 额外"),
      (5L, "totally unrelated english words about cooking fresh pasta"))
      .toDF("doc_id", "text")
    val uni = NearDedup.nearDuplicates(multi, "doc_id", "text",
        minJaccard = 0.5, unicode = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uni == Set((1L, 2L), (3L, 4L)))
    // default ASCII mode: non-Latin text tokenizes to NOTHING, so
    // every such doc collapses to the same empty whole-text shingle
    // — unrelated Cyrillic and CJK docs all "match" at jaccard 1.0.
    // Garbage either way; the opt-in is the fix.
    val ascii = NearDedup.nearDuplicates(multi, "doc_id", "text",
        minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ascii == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    // both tokenizers agree on pure-ASCII text (the opt-in is a
    // superset alphabet, not a different algorithm)
    val en = Seq((1L, "the quick brown fox jumps high"))
      .toDF("doc_id", "text")
    val a = NearDedup.shingleSets(en, "doc_id", "text")
      .select("sh").as[Seq[String]].head()
    val b = NearDedup.shingleSets(en, "doc_id", "text", unicode = true)
      .select("sh").as[Seq[String]].head()
    assert(a == b)
  }

  test("null text never crashes the shingle pipelines — the row " +
      "just cannot pair") {
    val docs = Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val pairs = NearDedup.candidatePairs(docs, "id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    assert(NearDedup.jaccardJoin(docs, "id", "text",
      minJaccardPpm = 500000L).count() == 1L)
  }

  test("verify ppm is EXACT integer div — boundary ratios do not " +
      "drift one ulp below their threshold") {
    import org.apache.spark.sql.functions._
    // |A| = 80, |B| = 41, ∩ = 41 → ∪ = 80 and exactly 41/80 =
    // 512500 ppm; the old double-multiply floor computed 512499
    val pairs = Seq((1L, 2L)).toDF("id_new", "id_corpus")
    val nd = Seq((1L, ((1 to 41).map(i => s"a$i") ++
      (1 to 39).map(i => s"c$i")).mkString(" "))).toDF("id", "text")
    val cd = Seq((2L, (1 to 41).map(i => s"a$i").mkString(" ")))
      .toDF("id", "text")
    val ppm = NearDedup.verifyPairsJaccardPpm(pairs, nd, cd,
      "id", "text", shingleN = 1)
      .select(col("jaccard_ppm")).as[Long].head()
    assert(ppm == 512500L, s"expected exact 512500, got $ppm")
  }

  test("simpleLower applies the Unicode simple map (utf8proc parity), " +
      "not Java's full map") {
    // full mapping would give final-sigma 'μυς', 2-codepoint 'i̇' for İ
    val got = Seq("ΜΥΣ ΑΣ", "İstanbul", "Straße", "ǅungla", "ПРИВЕТ")
      .toDF("t")
      .select(TextAnalysis.simpleLower($"t")).as[String].collect().toSeq
    assert(got == Seq("μυσ ασ", "istanbul", "straße", "ǆungla", "привет"))
  }
}
