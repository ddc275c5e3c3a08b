package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "Hello  World"),
    (2L, "hello world"),   // dup of 1 after normalization
    (3L, "different text"),
    (4L, " HELLO\tWORLD "), // dup of 1
    (5L, "different text")) // dup of 3
    .toDF("doc_id", "text")

  test("exactByText keeps the smallest id per normalized fingerprint") {
    val kept = Dedup.exactByText(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("exactReport counts copies per fingerprint") {
    val rep = Dedup.exactReport(docs)
      .select("keep_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == Seq((1L, 3L), (3L, 2L)))
  }

  test("null-text docs are singletons, never collapsed into one " +
      "phantom cluster") {
    val docs = Seq((1L, "same text"), (2L, "same text"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept = Dedup.exactByText(docs).select("doc_id")
      .as[Long].collect().toSet
    // the two real dups collapse to id 1; BOTH null-text docs survive
    assert(kept == Set(1L, 3L, 4L))
    val report = Dedup.exactReport(docs)
    assert(report.count() == 3L)
    assert(report.filter(col("n_copies") === 2L).count() == 1L)
  }

  test("compactLatest: a NULL-evaluating tombstone predicate keeps " +
      "the key (null-safe), matching ones delete") {
    val log = Seq(
      (1L, "ok", 10L, 1L), (1L, null.asInstanceOf[String], 20L, 2L),
      (2L, "err", 10L, 1L), (3L, "ok", 10L, 1L))
      .toDF("k", "status", "ts", "seq")
    val out = Dedup.compactLatest(log, Seq("k"), col("ts"), col("seq"),
      Seq("status"), col("status") === "err")
      .select("k").as[Long].collect().toSet
    // k=1's winner has status NULL → predicate NULL → must be KEPT;
    // k=2's winner matches the tombstone → deleted
    assert(out == Set(1L, 3L))
  }

  test("exact() temp column does not clobber user columns named __graft_rn0") {
    val df = docs.withColumn("__graft_rn0", lit(99))
    val out = Dedup.exact(df, col("text"), col("doc_id"))
    assert(out.columns.contains("__graft_rn0"))
    assert(out.select("__graft_rn0").distinct().as[Int].collect().toSeq == Seq(99))
  }

  test("clusters finds transitive components with min-id labels") {
    // two components: chain 1-2-3-4 (transitive, never all directly
    // paired) and triangle 10-11-12; 7 appears only as a singleton
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L)).toDF("id_a", "id_b")
    val cc = Dedup.clusters(pairs).as[(Long, Long)].collect().sorted
    assert(cc.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("clusters converges on a long chain (pointer jumping)") {
    // a 64-link chain needs ~log2(64) rounds with jumping; maxIter=8
    // would be exceeded by plain O(diameter) propagation
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.clusters(pairs, maxIter = 8).as[(Long, Long)].collect()
    assert(cc.length == 64 && cc.forall(_._2 == 1L))
  }

  test("clusterAssignments covers singletons and flags survivors") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val out = Dedup.clusterAssignments(pairs, ids, "doc_id")
      .as[(Long, Long, Boolean)].collect().sorted
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)))
  }

  test("clusters result is invariant to input partitioning") {
    val pairs = Seq((5L, 9L), (9L, 2L), (7L, 8L)).toDF("id_a", "id_b")
    val a = Dedup.clusters(pairs).as[(Long, Long)].collect().sorted.toSeq
    val b = Dedup.clusters(pairs.repartition(7)).as[(Long, Long)]
      .collect().sorted.toSeq
    assert(a == b && a == Seq(2L -> 2L, 5L -> 2L, 7L -> 7L, 8L -> 7L, 9L -> 2L))
  }

  test("redact masks the PII shapes and counts them on the original") {
    val rows = Seq(
      (1L, "write to bob.smith+x@corp.example.org or call 555-867 5309 now"),
      (2L, "server at 10.0.42.7 leaked card 4111 1111 1111 1111 and ssn 078-05-1120"),
      (3L, "nothing sensitive here at all")).toDF("id", "text")
    val out = rows.select($"id",
        TextAnalysis.redact($"text").as("clean"),
        TextAnalysis.redactionCount($"text").as("n"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == "write to [EMAIL] or call [PHONE] now")
    assert(out(0)._3 == 2)
    assert(out(1)._2 == "server at [IP] leaked card [CARD] and ssn [SSN]")
    assert(out(1)._3 == 3)
    assert(out(2)._2 == "nothing sensitive here at all" && out(2)._3 == 0)
  }

  test("topTerms ranks by tf with corpus df attached, ties by term") {
    val docs = Seq(
      (1L, "apple banana apple cherry apple banana"),
      (2L, "banana cherry"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Long)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 1, "apple", 3L, 1L), (1L, 2, "banana", 2L, 2L),
      (2L, 1, "banana", 1L, 2L), (2L, 2, "cherry", 1L, 2L)))
  }

  test("contamination measures shingle containment in exact ppm") {
    val corpus = Seq(
      (1L, "a b c d"), // shingles: "a b c", "b c d"
      (2L, "x y z w"), // disjoint from the benchmark
      (3L, "a b c x")) // "a b c" contaminated, "b c x" clean
      .toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d")).toDF("doc_id", "text")
    val out = NearDedup.contamination(corpus, "doc_id", "text",
      bench, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 0L, 0L),
      (3L, 2L, 1L, 500000L)))
  }

  test("repetitionStats counts bigram multiplicity per doc") {
    val docs = Seq(
      (1L, "a b a b a"), // bigrams: ab, ba, ab, ba -> 4 total, 2 dup
      (2L, "x y z"), // xy, yz -> no dups
      (3L, "solo"), // < 2 tokens -> absent
      (4L, "w w w w")) // ww x3 -> 3 total, 2 dup, max_rep 3
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 4L, 2L, 2L, 500000L),
      (2L, 2L, 0L, 1L, 0L),
      (4L, 3L, 2L, 3L, 666666L)))
  }

  test("tokenCount / subwordCount / ratios on known strings") {
    val df = Seq("a b  c", "", "ab12!", "  ").map(Tuple1(_)).toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.subwordCount(col("text")),
      TextAnalysis.alphaRatio(col("text")),
      TextAnalysis.punctRatio(col("text"))).collect()
    assert(r(0).getInt(0) == 3 && r(0).getInt(1) == 3)
    assert(r(1).getInt(0) == 0 && r(1).getInt(1) == 0 && r(1).getDouble(2) == 0.0)
    assert(r(2).getInt(0) == 1 && r(2).getInt(1) == 3) // "ab","12","!"
    assert(r(2).getDouble(2) == 0.4) // 2 alpha / 5 chars
    assert(r(3).getInt(0) == 0)
  }

  test("stopwordRatio and meanTokenLen") {
    val df = Seq(Tuple1("the cat is on the mat")).toDF("text")
    val r = df.select(
      TextAnalysis.stopwordRatio(col("text")),
      TextAnalysis.meanTokenLen(col("text"))).collect()(0)
    // stopwords: the, is, on, the → 4 of 6 tokens
    assert(math.abs(r.getDouble(0) - 4.0 / 6.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 16.0 / 6.0) < 1e-12)
  }

  test("langId picks the max-marker language, und when none") {
    val df = Seq(
      "the cat and the dog is here with this",
      "der hund und die katze ist nicht hier mit",
      "le chat et la maison est une pour",
      "xyzzy qwerty 12345").map(Tuple1(_)).toDF("text")
    val r = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(r.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq("Hello  World", "hello world", " hello\tWORLD ").map(Tuple1(_))
      .toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("fingerprintNfc unifies precomposed and combining-mark " +
      "spellings that plain fingerprint splits") {
    // "café résumé": composed vs fully decomposed (e + U+0301)
    val composed = "Café Résumé"
    val decomposed = "Café Résumé"
    val df = Seq(composed, decomposed).map(Tuple1(_)).toDF("text")
    val plain = df.select(TextAnalysis.fingerprint(col("text")))
      .as[String].collect()
    assert(plain.distinct.length == 2,
      "plain fingerprint should split the spellings (the miss class)")
    val nfc = df.select(TextAnalysis.fingerprintNfc(col("text")))
      .as[String].collect()
    assert(nfc.distinct.length == 1)
    // still whitespace/case-insensitive like the plain one
    val ws = Seq(" café  résumé ").map(Tuple1(_)).toDF("text")
      .select(TextAnalysis.fingerprintNfc(col("text"))).as[String].head()
    assert(ws == nfc.head)
  }

  test("scriptProfile: exact per-script counts, dominant label, " +
      "tie-break in column order, none/null handling") {
    val rows = Seq(
      (1L, "abc привет мир"),       // cyrillic 9 > latin 3
      (2L, "hello 世界"),            // latin 5 > han 2
      (3L, "ab вг"),                // TIE latin 2 = cyrillic 2 → latin
      (4L, "12 .,!"),               // no letters → none
      (5L, null.asInstanceOf[String]), // null text → none
      (6L, "abc ﬁn"),               // U+FB01 ligature: Latin but also
                                    // counted in n_latin AND \p{L}
      (7L, "٠١٢"),   // Arabic-Indic DIGITS: script
                                    // Arabic but not letters — count
                                    // nothing (used to drive n_other
                                    // to -3 and route to 'arabic')
      (8L, "Ⅻ ab"))            // Ⅻ: Script=Latin, category Nl
                                    // (not a letter) → n_latin 2
    val out = TextAnalysis.scriptProfile(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    assert(out(0) == ((1L, 3L, 9L, 0L, 0L, 0L, 0L, "cyrillic")))
    assert(out(1) == ((2L, 5L, 0L, 2L, 0L, 0L, 0L, "latin")))
    assert(out(2) == ((3L, 2L, 2L, 0L, 0L, 0L, 0L, "latin"))) // tie
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L, 0L, 0L, "none")))
    assert(out(4) == ((5L, 0L, 0L, 0L, 0L, 0L, 0L, "none")))
    assert(out(5)._2 == 5L && out(5)._8 == "latin") // ﬁ is one Latin char
    assert(out(6) == ((7L, 0L, 0L, 0L, 0L, 0L, 0L, "none")))
    assert(out(7) == ((8L, 2L, 0L, 0L, 0L, 0L, 0L, "latin")))
    // every row: n_other is non-negative by construction
    assert(out.forall(_._7 >= 0L))
  }

  test("analyze attaches the full metric column set in one pass") {
    val df = Seq((1L, "The quick brown fox is near the old bridge tonight."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.analyze(df).collect()(0)
    val cols = TextAnalysis.analyze(df).columns.toSeq
    assert(cols == Seq("doc_id", "text", "n_tokens", "n_subwords",
      "alpha_ratio", "punct_ratio", "stopword_ratio", "quality",
      "fingerprint", "lang_pred"))
    assert(out.getAs[Int]("n_tokens") == 10)
    assert(out.getAs[String]("lang_pred") == "en")
    val q = out.getAs[Double]("quality")
    assert(q > 0.3 && q <= 1.0)
  }
}
