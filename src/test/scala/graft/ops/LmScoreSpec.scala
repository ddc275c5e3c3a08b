package graft.ops

import graft.SparkSpec

/** lmScore / lmTables: exact integer-ppm stupid-backoff scoring,
  * hand-computed vectors, pruning, external-LM unknowns, the
  * distinct-id contract, and unicode parity.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // corpus: doc1 "a b a b c", doc2 "a b x", doc3 "z"
  // unigrams: a=3 b=3 c=1 x=1 z=1, N=9
  // bigrams:  "a b"=3, "b a"=1, "b c"=1, "b x"=1 → minCount=2 keeps "a b"=3
  private val corpus = Seq(
    (java.lang.Long.valueOf(1L), "a b a b c"),
    (java.lang.Long.valueOf(2L), "a b x"),
    (java.lang.Long.valueOf(3L), "z"))
    .toDF("doc_id", "text")

  test("hand-computed stupid-backoff scores, self-trained, minCount=2") {
    // p(a b)  = 1000000*3 div 3 = 1000000       (kept bigram)
    // p(b a)  = 400000*cu(a)=3 div 9 = 133333   (backoff)
    // p(b c)  = 400000*1 div 9 = 44444
    // p(b x)  = 400000*1 div 9 = 44444
    // doc1: n=4, sum = 2*1000000+133333+44444 = 2177777, mean 544444
    // doc2: n=2, sum = 1000000+44444 = 1044444, mean 522222
    // doc3: no transitions → 0/0/0 but the row survives
    val out = TextAnalysis.lmScoreSelfTrained(corpus, "doc_id", "text",
        minCount = 2L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 2177777L, 544444L),
      (2L, 2L, 1044444L, 522222L),
      (3L, 0L, 0L, 0L)))
  }

  test("minCount=1 keeps every bigram: every transition is a kept " +
      "conditional probability") {
    // p(a b)=1000000*3 div 3=1000000, p(b a)=1000000*1 div 3=333333,
    // p(b c)=333333, p(b x)=333333
    val out = TextAnalysis.lmScoreSelfTrained(corpus, "doc_id", "text",
        minCount = 1L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 2666666L, 666666L),
      (2L, 2L, 1333333L, 666666L),
      (3L, 0L, 0L, 0L)))
  }

  test("external LM: tokens the LM never saw score exactly 0") {
    val (uni, bi) = TextAnalysis.lmTables(corpus, "text", minCount = 2L)
    val alien = Seq((java.lang.Long.valueOf(9L), "q q q")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(alien, "doc_id", "text", uni, bi)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((9L, 2L, 0L, 0L)))
  }

  test("null ids drop; duplicate ids collapse to one row over the " +
      "id's combined transitions") {
    val dup = Seq(
      (java.lang.Long.valueOf(1L), "a b"),
      (java.lang.Long.valueOf(1L), "b a"),
      (null.asInstanceOf[java.lang.Long], "a b a b"))
      .toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.lmTables(corpus, "text", minCount = 2L)
    val out = TextAnalysis.lmScore(dup, "doc_id", "text", uni, bi)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // id 1 carries both rows' transitions: "a b" (1000000) + "b a" (133333)
    assert(out == Seq((1L, 2L, 1133333L, 566666L)))
  }

  test("plan shape: LM tables broadcast; no exchange carries text " +
      "or token arrays") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val d = TextAnalysis.lmScoreSelfTrained(corpus, "doc_id", "text",
      minCount = 2L)
    d.collect()
    val planStr = d.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"expected the vocabulary-sized LM joins to broadcast:\n$planStr")
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: e.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val names = exchanges(d.queryExecution.executedPlan)
      .flatMap(_.child.output.map(_.name))
    assert(!names.contains("text") && !names.exists(_.startsWith("__t")) &&
      !names.exists(_.startsWith("__bg")),
      s"text/token-array payloads leaked into an exchange: $names")
  }

  test("randomized cross-check vs a brute-force reference " +
      "implementation (40 corpora)") {
    val rng = new scala.util.Random(20260813L)
    val words = Array("a", "b", "c", "d", "e")
    for (trial <- 1 to 40) {
      val nDocs = 1 + rng.nextInt(6)
      val docs: Seq[(Long, String)] = (1L to nDocs.toLong).map { i =>
        val len = rng.nextInt(8)
        (i, Seq.fill(len)(words(rng.nextInt(words.length))).mkString(" "))
      }
      val minCount = 1L + rng.nextInt(3)
      // brute force: train on the full corpus, score each doc
      val toks = docs.map { case (id, tx) =>
        id -> tx.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val allTokens = docs.flatMap(d => toks(d._1))
      val cu = allTokens.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val n = allTokens.size.toLong
      val cb = docs.flatMap(d => toks(d._1).sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))))
        .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
        .filter(_._2 >= minCount)
      val expected = docs.map { case (id, _) =>
        val trans = toks(id).sliding(2).filter(_.size == 2).toSeq
        val sum = trans.map { p =>
          val key = (p(0), p(1))
          if (cb.contains(key)) 1000000L * cb(key) / cu(p(0))
          else 400000L * cu.getOrElse(p(1), 0L) / math.max(n, 1L)
        }.sum
        val nt = trans.size.toLong
        (id, nt, sum, if (nt == 0) 0L else sum / nt)
      }.sortBy(_._1)
      val out = TextAnalysis.lmScoreSelfTrained(
          docs.toDF("doc_id", "text"), "doc_id", "text", minCount)
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
      assert(out == expected,
        s"trial $trial (minCount=$minCount, docs=$docs)")
    }
  }

  test("unicode=true scores non-Latin text the ASCII tokenizer " +
      "would silently zero") {
    val ru = Seq(
      (java.lang.Long.valueOf(1L), "мир труд мир труд май"),
      (java.lang.Long.valueOf(2L), "мир труд"))
      .toDF("doc_id", "text")
    val ascii = TextAnalysis.lmScoreSelfTrained(ru, "doc_id", "text",
        minCount = 1L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(ascii.forall(_._2 == 0L), s"ASCII tokenizer saw tokens: $ascii")
    val out = TextAnalysis.lmScoreSelfTrained(ru, "doc_id", "text",
        minCount = 1L, unicode = true)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // unigrams: мир=3 труд=3 май=1, N=7
    // bigrams: "мир труд"=3, "труд мир"=1, "труд май"=1 (minCount=1)
    // p(мир труд)=1000000*3 div 3=1000000, p(труд мир)=333333,
    // p(труд май)=333333
    assert(out == Seq(
      (1L, 4L, 2666666L, 666666L),
      (2L, 1L, 1000000L, 1000000L)))
  }
}
