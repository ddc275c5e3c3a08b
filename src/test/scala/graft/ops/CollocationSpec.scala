package graft.ops

import graft.SparkSpec

/** Collocations vs an independent in-memory reference — same ppm
  * arithmetic over plain Scala collections, so a swapped n_a/n_b or
  * a reordered flooring point on the Spark side breaks the match. */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    "[a-z]+".r.findAllIn(s.toLowerCase).toSeq

  private def ref(texts: Seq[String], minCount: Long)
      : Map[String, (Long, Long)] = {
    val toks = texts.map(tok)
    val uni = toks.flatten.groupBy(identity).map { case (w, o) =>
      w -> o.size.toLong }
    val nn = uni.values.sum
    toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case ((a, b), o) => (a, b) -> o.size.toLong }
      .collect { case ((a, b), nab) if nab >= minCount =>
        s"$a $b" -> (nab, ((nab * 1000000L) / uni(a)) * nn / uni(b))
      }
  }

  private val corpus = Seq(
    "new york is big and new york is old",
    "the new day in york",
    "big day big day new york")

  test("matches the reference on counts and assoc_ppm") {
    val got = TextAnalysis.collocations(
        corpus.toDF("text"), "text", minCount = 1L)
      .as[(String, Long, Long)].collect()
      .map { case (p, n, s) => p -> (n, s) }.toMap
    assert(got == ref(corpus, 1L))
  }

  test("minCount prunes the bigram tail") {
    val got = TextAnalysis.collocations(
        corpus.toDF("text"), "text", minCount = 3L)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set("new york"))
    assert(got.head._2 == 3L)
  }

  test("bigrams never cross document boundaries") {
    val got = TextAnalysis.collocations(
        Seq("alpha beta", "beta alpha").toDF("text"), "text", 1L)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(got == Set("alpha beta", "beta alpha"))
  }

  test("co-occurrence pairs cover every window offset exactly once") {
    // "a b c d": window 2 ⇒ k=1: ab bc cd; k=2: ac bd
    val got = TextAnalysis.cooccurrencePairs(
        Seq("a b c d").toDF("text"), "text", window = 2, minCount = 1L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a b" -> 1L, "b c" -> 1L, "c d" -> 1L,
      "a c" -> 1L, "b d" -> 1L))
  }

  test("co-occurrence window never crosses documents and counts multiplicity") {
    val got = TextAnalysis.cooccurrencePairs(
        Seq("x y", "x y", "y x").toDF("text"), "text",
        window = 3, minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x y" -> 2L)) // "y x" appears once → pruned
  }

  test("negative samples match the interval reference sampler") {
    val vocab = Seq(("apple", 7L), ("pear", 2L), ("plum", 1L))
    def refDraw(key: String, j: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"0:neg:$key:$j".getBytes("UTF-8"))
      val r = java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16) % 10L
      val sorted = vocab.sortBy(_._1)
      var acc = 0L
      sorted.find { case (_, n) =>
        val in = r >= acc && r < acc + n; acc += n; in }.get._1
    }
    val keys = Seq("k1", "k2", "k3").toDF("key")
    val got = TextAnalysis.negativeSamples(keys, "key",
        vocab.toDF("w", "n"), "w", "n", k = 4)
      .as[(String, Long, String)].collect().toSet
    val want = (for (key <- Seq("k1", "k2", "k3"); j <- 0L to 3L)
      yield (key, j, refDraw(key, j))).toSet
    assert(got == want)
    // frequency proportionality sanity: over many draws the heavy
    // word dominates
    val many = TextAnalysis.negativeSamples(
        (1 to 50).map(i => s"x$i").toDF("key"), "key",
        vocab.toDF("w", "n"), "w", "n", k = 4)
      .as[(String, Long, String)].collect()
    val byWord = many.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byWord.getOrElse("apple", 0) > byWord.getOrElse("plum", 0))
  }

  test("null and empty texts contribute nothing") {
    val got = TextAnalysis.collocations(
        Seq(Some("a b"), None, Some(""), Some("a b")).toDF("text"),
        "text", 1L)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("a b", 2L, ((2L * 1000000L) / 2L) * 4L / 2L)))
  }
}
