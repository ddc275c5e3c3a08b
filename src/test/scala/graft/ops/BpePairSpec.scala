package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** bpePairCounts: vocabulary weighting, adjacency, single-char and
  * repeated-char behavior, minCount gate.
  */
class BpePairSpec extends SparkSpec {
  import spark.implicits._

  private def run(minCount: Long, texts: String*) =
    TextAnalysis.bpePairCounts(texts.map(Tuple1(_)).toDF("text"),
        "text", minCount)
      .orderBy("pair").as[(String, Long)].collect().toSeq

  test("pairs weight by token occurrence count, not distinct tokens") {
    // "ab" x3, "ac" x1 -> (a b):3, (a c):1
    val out = run(1L, "ab ab ac", "ab")
    assert(out == Seq(("a b", 3L), ("a c", 1L)))
  }

  test("repeated chars inside one token count each adjacency") {
    // "aaa": pairs (a a) twice per occurrence
    val out = run(1L, "aaa aaa")
    assert(out == Seq(("a a", 4L)))
  }

  test("single-char tokens contribute nothing") {
    assert(run(1L, "a b c a").isEmpty)
  }

  test("minCount gates the tail") {
    val out = run(3L, "ab ab ab xy")
    assert(out == Seq(("a b", 3L)))
  }

  // ---- full BPE: train + apply ----

  /** Reference BPE (Sennrich et al. 2016) on a driver-side word-count
    * map: count adjacent pairs weighted by word frequency, merge the
    * (count desc, pair asc) argmax, repeat. */
  private def referenceBpe(wordCounts: Map[String, Long], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] =
      wordCounts.map { case (w, c) => (w.map(_.toString), c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (segs, c) =>
        segs.sliding(2).filter(_.length == 2).foreach { p =>
          val k = (p(0), p(1))
          counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) done = true
      else {
        val best = eligible.toSeq
          .sortBy { case ((l, r), c) => (-c, l + " " + r) }.head._1
        merges += best
        vocab = vocab.map { case (segs, c) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < segs.length) {
            if (i + 1 < segs.length && segs(i) == best._1 &&
                segs(i + 1) == best._2) { out += best._1 + best._2; i += 2 }
            else { out += segs(i); i += 1 }
          }
          (out.toSeq, c)
        }.groupBy(_._1).map { case (k, vs) => (k, vs.values.sum) }
      }
    }
    merges.toSeq
  }

  test("trainBpe matches the reference implementation, merge by merge") {
    val corpus = Seq.fill(8)("lower lower newest") ++
      Seq.fill(5)("newest widest") ++ Seq.fill(3)("low new")
    val df = corpus.map(Tuple1(_)).toDF("text")
    val words = corpus.flatMap(_.split(" "))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val want = referenceBpe(words, numMerges = 10, minCount = 2L)
    val got = TextAnalysis.trainBpe(df, "text", numMerges = 10,
      minCount = 2L)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("in-memory and distributed trainers produce identical merge " +
      "lists, ASCII and unicode") {
    val corpus = Seq.fill(8)("lower lower newest") ++
      Seq.fill(5)("newest widest") ++ Seq.fill(3)("low new") ++
      Seq.fill(4)("привет мир мирный привет широкий")
    val df = corpus.map(Tuple1(_)).toDF("text")
    // ASCII tokenizer: maxVocabRows=0 forces the distributed fallback
    val mem = TextAnalysis.trainBpe(df, "text", 12, minCount = 2L)
    val dist = TextAnalysis.trainBpe(df, "text", 12, minCount = 2L,
      maxVocabRows = 0L)
    assert(mem == dist && mem.nonEmpty)
    // unicode tokenizer: the Cyrillic vocabulary actually trains
    val memU = TextAnalysis.trainBpe(df, "text", 12, minCount = 2L,
      unicode = true)
    val distU = TextAnalysis.trainBpe(df, "text", 12, minCount = 2L,
      unicode = true, maxVocabRows = 0L)
    assert(memU == distU && memU.nonEmpty)
    assert(memU.exists { case (l, r) => (l + r).exists(_ > 'z') },
      s"expected non-Latin merges, got $memU")
  }

  test("in-memory incremental trainer equals the from-scratch " +
      "reference on a random vocabulary") {
    val rnd = new scala.util.Random(5)
    val words = Seq.fill(150)(
      Seq.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString)
      .groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong * (1 + rnd.nextInt(5))) }
    val want = referenceBpe(words, numMerges = 120, minCount = 2L)
    val got = TextAnalysis.trainBpeInMemory(words.toArray, 120, 2L)
    assert(got == want)
    assert(got.length > 20, s"degenerate fixture: ${got.length} merges")
  }

  test("in-memory trainer at real tokenizer scale: 32k merges over a " +
      "60k-word vocabulary") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq.fill(60000)(
      Seq.fill(5 + rnd.nextInt(10))(('a' + rnd.nextInt(8)).toChar).mkString)
      .groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong + 1L) } // weights ≥ 2
      .toArray
    val t0 = System.nanoTime()
    val merges = TextAnalysis.trainBpeInMemory(vocab, 32000, minCount = 2L)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 32000, s"only ${merges.length} merges")
    assert(merges.distinct.length == merges.length)
    assert(sec < 120.0, f"32k merges took $sec%.1fs")
    info(f"32k merges over ${vocab.length} words in $sec%.2fs")
  }

  test("in-memory trainer reaches real merge counts (1k+) in seconds") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq.fill(4000)(
      Seq.fill(5 + rnd.nextInt(8))(('a' + rnd.nextInt(6)).toChar).mkString)
      .groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong + 1L) } // every weight ≥ 2
      .toArray
    val t0 = System.nanoTime()
    val merges = TextAnalysis.trainBpeInMemory(vocab, 1500, minCount = 2L)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 1500, s"only ${merges.length} merges")
    assert(merges.distinct.length == 1500) // a pair never merges twice
    assert(sec < 30.0, f"in-memory trainer took $sec%.1fs for 1500 merges")
  }

  test("merge lists persist and reload in training order; a mangled " +
      "store is refused") {
    val corpus = Seq.fill(6)("lower lower newest widest").map(Tuple1(_))
      .toDF("text")
    val merges = TextAnalysis.trainBpe(corpus, "text", 8, minCount = 2L)
    assert(merges.nonEmpty)
    val dir = scratch("bpe-merges")
    TextAnalysis.mergesToDF(spark, merges)
      // scrambled write order: reload must restore TRAINING order
      .orderBy($"right").write.mode("overwrite").parquet(dir)
    assert(TextAnalysis.mergesFromDF(spark.read.parquet(dir)) == merges)
    intercept[IllegalArgumentException](TextAnalysis.mergesFromDF(
      spark.read.parquet(dir).filter($"merge_idx" =!= 1)))
  }

  test("trainBpe stops early when no pair reaches minCount") {
    val df = Seq.fill(2)(Tuple1("ab cd")).toDF("text")
    // every pair occurs exactly twice; minCount=3 admits nothing
    assert(TextAnalysis.trainBpe(df, "text", 5, minCount = 3L).isEmpty)
  }

  test("applyBpe: greedy leftmost per merge, in merge order, " +
      "symbols never re-examined within a pass") {
    val df = Seq(("aaaa"), ("aaa"), ("abc"), ("xabay")).map(Tuple1(_))
      .toDF("tok")
    def apply(merges: Seq[(String, String)]) =
      df.select(col("tok"),
        TextAnalysis.applyBpe(col("tok"), merges).as("segs"))
        .as[(String, Seq[String])].collect().toMap
    val m1 = apply(Seq(("a", "a")))
    assert(m1("aaaa") == Seq("aa", "aa")) // greedy pairs, not aa,a,a
    assert(m1("aaa") == Seq("aa", "a"))   // leftmost wins the odd one
    val m2 = apply(Seq(("a", "b"), ("ab", "c")))
    assert(m2("abc") == Seq("abc"))       // merges chain in order
    assert(m2("xabay") == Seq("x", "ab", "a", "y"))
    // conservation: concatenated symbols always rebuild the token
    m2.foreach { case (tok, segs) => assert(segs.mkString == tok) }
  }

  test("bpeTokenCounts: per-doc budgets reconcile with the corpus " +
      "symbol mass; token-less docs count 0; null ids drop") {
    val rows = Seq(
      (java.lang.Long.valueOf(1L), "the then there"),
      (java.lang.Long.valueOf(2L), "he the he"),
      (java.lang.Long.valueOf(3L), "12 !!"), // no alpha tokens
      (java.lang.Long.valueOf(4L), "then"),
      (null.asInstanceOf[java.lang.Long], "the the the")) // null id: dropped
    val df = rows.toDF("doc_id", "text")
    val dfKeyed = df.filter($"doc_id".isNotNull)
    val merges = TextAnalysis.trainBpe(dfKeyed, "text", 3, minCount = 2L)
    val perDoc = TextAnalysis.bpeTokenCounts(dfKeyed, "doc_id", "text",
        merges)
      .as[(Long, Long)].collect().toMap
    assert(perDoc.keySet == Set(1L, 2L, 3L, 4L))
    // a frame WITH the null-id row: dropped, not misreported as 0
    val withNull = TextAnalysis.bpeTokenCounts(df, "doc_id", "text", merges)
    assert(withNull.count() == 4 && withNull.filter($"doc_id".isNull).isEmpty)
    assert(perDoc(3L) == 0L)
    // conservation: per-doc budgets sum to the corpus symbol mass
    val corpusMass = TextAnalysis.bpeSegmentCounts(dfKeyed, "text", merges)
      .agg(sum($"cnt")).as[Long].head()
    assert(perDoc.values.sum == corpusMass)
    // direct cross-check on one doc: sum over its tokens of
    // applyBpe(token).size
    val want4 = Seq("then").map(t =>
      Seq(t).toDF("tok").select(TextAnalysis.applyBpe($"tok", merges))
        .as[Seq[String]].head().size.toLong).sum
    assert(perDoc(4L) == want4)
  }

  test("ApplyBpe kernel matches a naive greedy reference on random " +
      "tokens and merge lists") {
    def naive(tok: String, merges: Seq[(String, String)]): Seq[String] = {
      var segs: Seq[String] = tok.map(_.toString)
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < segs.length) {
          if (i + 1 < segs.length && segs(i) == l && segs(i + 1) == r) {
            out += l + r; i += 2
          } else { out += segs(i); i += 1 }
        }
        segs = out.toSeq
      }
      segs
    }
    val rnd = new scala.util.Random(13)
    (1 to 300).foreach { _ =>
      val tok = Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(3)).toChar)
        .mkString // small alphabet → merges actually fire
      val base = Seq("a", "b", "c", "ab", "aa", "bc", "abc", "ba")
      val merges = Seq.fill(1 + rnd.nextInt(4))(
        (base(rnd.nextInt(base.length)), base(rnd.nextInt(base.length))))
      val got = ApplyBpe(
        org.apache.spark.sql.catalyst.expressions.Literal(tok), merges)
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(tok))
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotSeq == naive(tok, merges), s"tok=$tok merges=$merges")
      assert(gotSeq.mkString == tok) // conservation always
    }
  }

  test("bpeEncode: symbol stream in token order, budgets agree with " +
      "bpeTokenCounts, concatenation rebuilds the token stream") {
    val rows = Seq(
      (java.lang.Long.valueOf(1L), "the then the"),
      (java.lang.Long.valueOf(2L), "!! 12"), // token-less
      (java.lang.Long.valueOf(3L), null.asInstanceOf[String]),
      (null.asInstanceOf[java.lang.Long], "the")) // null id drops
    val df = rows.toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(enc == Seq(
      (1L, 4L, "the the n the"), // 'then' → [the, n]
      (2L, 0L, ""), (3L, 0L, "")))
    // budgets equal the vocabulary-join spelling on every doc
    val viaCounts = TextAnalysis.bpeTokenCounts(df, "doc_id", "text",
      merges).as[(Long, Long)].collect().toMap
    assert(enc.map(e => e._1 -> e._2).toMap == viaCounts)
    // conservation: symbols concatenated == tokens concatenated
    assert(enc.head._3.replace(" ", "") == "thethenthe")
  }

  test("bpeSegmentCounts conserves total symbol mass") {
    val df = Seq.fill(4)(Tuple1("the then there he")).toDF("text")
    val merges = TextAnalysis.trainBpe(df, "text", 3, minCount = 2L)
    val counts = TextAnalysis.bpeSegmentCounts(df, "text", merges)
      .as[(String, Long)].collect().toMap
    // total chars across all token occurrences == sum over symbols of
    // cnt * len(symbol)
    val totalChars = 4L * "thethentherehe".length
    assert(counts.map { case (s, c) => c * s.length }.sum == totalChars)
    assert(counts.keySet.contains("the")) // 'the' is mergeable in 3 rounds
  }

  test("bpeFertility: exact chars-per-token by group") {
    val df = Seq(
      (0L, "en", "ab ab cd"), // 6 chars; 'ab'→1 sym ×2, 'cd'→2 → 4 bpe
      (1L, "de", "xyz"),      // 3 chars; no merge applies → 3 bpe
      (2L, "fr", ""))         // zero tokens → 0/0 → 0
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.bpeFertility(df, "lang", "doc_id", "text",
        Seq(("a", "b")))
      .orderBy("lang").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("de", 3L, 3L, 1000000L),
      ("en", 6L, 4L, 1500000L),
      ("fr", 0L, 0L, 0L)))
  }

  test("bpeFertility unicode opt-in sees non-Latin text") {
    val df = Seq((0L, "ru", "привет мир")).toDF("doc_id", "lang", "text")
    val ascii = TextAnalysis.bpeFertility(df, "lang", "doc_id", "text",
        Seq.empty).as[(String, Long, Long, Long)].collect().head
    assert(ascii == (("ru", 0L, 0L, 0L)))
    val uni = TextAnalysis.bpeFertility(df, "lang", "doc_id", "text",
        Seq.empty, unicode = true)
      .as[(String, Long, Long, Long)].collect().head
    assert(uni == (("ru", 9L, 9L, 1000000L))) // char segmentation
  }
}
