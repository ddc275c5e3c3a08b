package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the round-5 additions: integer-exact Gram matrix,
  * exact heavy hitters, and the prefix-filtered exact Jaccard join. */
class GramHeavySpec extends SparkSpec {
  import spark.implicits._

  // ---- Gram ----

  /** Naive reference: quantize with the kernel's exact formula, then
    * sum products on the driver. */
  private def naiveGram(vecs: Seq[Array[Float]], dim: Int): Map[(Int, Int), Long] = {
    def quant(v: Array[Float]): Array[Long] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      val s = if (m == 0.0) 0.0 else 127.0 / m
      v.map(x => math.floor(x.toDouble * s + 0.5).toLong)
    }
    val qs = vecs.map(quant)
    (for { i <- 0 until dim; j <- i until dim } yield
      (i + 1, j + 1) -> qs.map(q => q(i) * q(j)).sum).toMap
  }

  private val dim = 5
  private val vecs: Seq[Array[Float]] = Seq(
    Array(1f, 0f, -2f, 3f, 0.5f),
    Array(0f, 0f, 0f, 0f, 0f), // zero vector: scale 0, contributes zeros
    Array(-1f, 4f, 2f, -3f, 1f),
    Array(10f, -20f, 30f, -40f, 50f))

  test("gramInt8 equals the naive quantize-then-sum reference") {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .repartition(3)
    val got = Gram.gramInt8(df, "embedding", dim)
      .as[(Int, Int, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got == naiveGram(vecs, dim))
    assert(got.size == dim * (dim + 1) / 2)
  }

  test("gramInt8 is partitioning-invariant (exact integers)") {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val a = Gram.gramInt8(df.repartition(1), "embedding", dim)
      .as[(Int, Int, Long)].collect().sorted.toSeq
    val b = Gram.gramInt8(df.repartition(7), "embedding", dim)
      .as[(Int, Int, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("gramInt8 rejects wrong-dimension vectors instead of skipping") {
    val df = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val e = intercept[Exception] {
      Gram.gramInt8(df, "embedding", dim).collect()
    }
    assert(e.getMessage != null)
  }

  // ---- Heavy hitters ----

  private val hhDocs: Seq[String] = {
    // 'alpha' x 60, 'beta' x 25, 'gamma' x 10, long tail of uniques
    // tail words must survive the [a-z]+ tokenizer as DISTINCT tokens
    val words = Seq.fill(60)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++
      (0 until 40).map(i => s"u${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    // deterministic shuffle into 12 docs
    words.zipWithIndex.groupBy(_._2 % 12).toSeq.sortBy(_._1)
      .map(_._2.map(_._1).mkString(" "))
  }

  test("frequentTerms equals the naive groupBy count (exact)") {
    val df = hhDocs.toDF("text").repartition(5)
    for (minCount <- Seq(5L, 11L, 26L, 61L)) {
      val got = TextAnalysis.frequentTerms(df, "text", minCount)
        .as[(String, Long)].collect().toMap
      val want = df.select(explode(TextAnalysis.alphaTokens(col("text"))))
        .as[String].collect().groupBy(identity)
        .map { case (t, o) => t -> o.length.toLong }
        .filter(_._2 >= minCount)
      assert(got == want, s"minCount=$minCount")
    }
  }

  test("frequentTerms with a tiny explicit summary still finds every " +
      "item above threshold (MG guarantee + exact recount)") {
    val df = hhDocs.toDF("text").repartition(3)
    // N = 135 tokens; k=30 > N/minCount for minCount=25 (135/25=5.4),
    // far under vocabulary size (43) — MG must still nominate alpha+beta
    val got = TextAnalysis.frequentTerms(df, "text", minCount = 25L,
      summarySize = 30).as[(String, Long)].collect().toMap
    assert(got == Map("alpha" -> 60L, "beta" -> 25L))
  }

  // ---- Exact Jaccard join ----

  /** Brute-force reference over distinct 3-shingle sets. */
  private def naiveJaccard(docs: Seq[(Long, String)], tPpm: Long)
      : Set[(Long, Long, Long)] = {
    def shingles(text: String): Set[String] = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      ppm = inter * 1000000L / uni if ppm >= tPpm
    } yield (ia, ib, ppm)).toSet
  }

  private val jDocs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "the quick brown fox jumps over the lazy cat tonight",  // near 1
    3L -> "the quick brown fox jumps over the lazy dog tonight",  // dup of 1
    4L -> "completely different words about spark shuffles and joins",
    5L -> "spark shuffles and joins are completely different words about",
    6L -> "tiny",                                                  // < n tokens
    7L -> "tiny",                                                  // dup of 6
    8L -> "the the the the the the the the the the")               // degenerate

  test("jaccardJoin is lossless vs brute force at several thresholds") {
    val df = jDocs.toDF("doc_id", "text").repartition(4)
    for (t <- Seq(300000L, 500000L, 800000L, 1000000L)) {
      val got = NearDedup.jaccardJoin(df, "doc_id", "text", t)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == naiveJaccard(jDocs, t), s"threshold=$t")
    }
  }

  test("jaccardJoin prefix filter admits the exact-duplicate pairs") {
    val df = jDocs.toDF("doc_id", "text")
    val got = NearDedup.jaccardJoin(df, "doc_id", "text", 1000000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1000000L), (6L, 7L, 1000000L)))
  }

  test("frequentTerms unicode opt-in: non-Latin heavy hitters surface " +
      "instead of tokenizing to nothing") {
    val df = (Seq.fill(7)("снова зима снова") ++ Seq.fill(3)("лето раз"))
      .map(Tuple1(_)).toDF("text").repartition(3)
    // ASCII default: zero tokens, zero terms — the silent no-op
    assert(TextAnalysis.frequentTerms(df, "text", 2L).isEmpty)
    val got = TextAnalysis.frequentTerms(df, "text", 2L, unicode = true)
      .as[(String, Long)].collect().toMap
    assert(got == Map("снова" -> 14L, "зима" -> 7L, "лето" -> 3L,
      "раз" -> 3L))
  }

  test("frequentTerms on an empty corpus returns empty (derived-k path)") {
    val empty = Seq.empty[String].toDF("text")
    assert(TextAnalysis.frequentTerms(empty, "text", minCount = 2L).count() == 0)
  }

  test("frequentTerms audits a caller-supplied summarySize: a k below " +
      "N/minCount + 1 is refused instead of silently missing terms") {
    val df = Seq.fill(100)("aa bb cc dd ee ff gg hh").toDF("text") // N=800
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.frequentTerms(df, "text", minCount = 2L, summarySize = 3)
    }
    assert(e.getMessage.contains("summarySize"))
    // a sufficient caller-supplied k still returns the exact answer
    val ok = TextAnalysis.frequentTerms(df, "text", minCount = 2L,
        summarySize = 500)
      .as[(String, Long)].collect().toSet
    assert(ok == Set("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      .map(t => (t, 100L)))
  }
}
