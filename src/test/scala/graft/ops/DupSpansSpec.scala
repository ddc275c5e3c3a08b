package graft.ops

import graft.SparkSpec

/** spanCoverage: cross-doc flagging, multiplicity, within-doc-only
  * repeats, short-doc omission, n=1, null ids, exact micros.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(java.lang.Long, String)], n: Int) =
    DupSpans.spanCoverage(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq

  test("cross-doc grams count with multiplicity on BOTH sides") {
    // doc 1: "a b a b" → 2-grams [a b, b a, a b]: "a b"×2 shared
    // doc 2: "a b c"   → [a b, b c]: "a b"×1 shared
    val out = run(Seq((1L, "a b a b"), (2L, "a b c")), n = 2)
    assert(out == Seq((1L, 3L, 2L, 666666L), (2L, 2L, 1L, 500000L)))
  }

  test("within-doc-only repeats are not duplicated spans") {
    // "x y x y x" repeats "x y" internally but no other doc has it
    val out = run(Seq((1L, "x y x y x"), (2L, "p q r")), n = 2)
    assert(out == Seq((1L, 4L, 0L, 0L), (2L, 2L, 0L, 0L)))
  }

  test("docs shorter than n emit no row; n-token docs emit one span") {
    val out = run(Seq((1L, "a b"), (2L, "a b c"), (3L, "")), n = 3)
    assert(out == Seq((2L, 1L, 0L, 0L)))
  }

  test("n=1: single shared token flags exactly its positions") {
    // token "t" appears in docs 1 (×2 of 3) and 2 (×1 of 2)
    val out = run(Seq((1L, "t u t"), (2L, "t v"), (3L, "w")), n = 1)
    assert(out == Seq(
      (1L, 3L, 2L, 666666L), (2L, 2L, 1L, 500000L), (3L, 1L, 0L, 0L)))
  }

  test("null-id rows are dropped, not folded or silently un-flagging") {
    // without the filter, the null-id copy of "a b" would make
    // min=max=1 over the gram window and doc 1 would stay unflagged
    val out = run(Seq((1L, "a b"), (null, "a b"), (null, "a b")), n = 2)
    assert(out == Seq((1L, 1L, 0L, 0L)))
  }

  test("ratio uses exact integer division (floored micros)") {
    // 1 dup of 3 spans → 333333, never a double-rounded 333334
    val out = run(Seq((1L, "s t u v"), (2L, "s t w")), n = 2)
    assert(out == Seq((1L, 3L, 1L, 333333L), (2L, 2L, 1L, 500000L)))
  }

  test("distributed input agrees with the sequential answer") {
    val rows: Seq[(java.lang.Long, String)] = (0L until 40L).map { i =>
      // digits vanish under alphaTokens: encode uniqueness in letters
      val tag = "q" + ("a" * (i.toInt + 1))
      (java.lang.Long.valueOf(i),
        if (i % 4 == 0) s"shared boiler plate line ${tag}"
        else s"${tag}w ${tag}x ${tag}y ${tag}z")
    }
    val df = rows.toDF("doc_id", "text").repartition(7)
    val out = DupSpans.spanCoverage(df, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 40)
    // "shared boiler plate" + "boiler plate line" cross all i%4==0 docs
    out.foreach { case (id, spans, dup, _) =>
      if (id % 4 == 0) assert(dup >= 2L, s"doc $id")
      else assert(dup == 0L, s"doc $id")
      assert(spans > 0L)
    }
  }

  test("guard: span width must be positive") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      DupSpans.spanCoverage(df, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      DupSpans.removeSpans(df, "doc_id", "text", 0))
  }

  // ---- removeSpans ----

  private def runRemove(rows: Seq[(java.lang.Long, String)], n: Int) =
    DupSpans.removeSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq

  test("removeSpans: overlapping dup spans merge; survivors splice") {
    // docs 1/2 share "a b c" (and its sub-2-grams); doc 1's 2-gram
    // spans at starts 0 ("a b") and 1 ("b c") overlap → positions
    // 0..2 covered once, not twice; "z" survives
    val out = runRemove(Seq((1L, "a b c z"), (2L, "a b c")), n = 2)
    assert(out == Seq(
      (1L, 4L, 3L, "z"),
      (2L, 3L, 3L, "")))
  }

  test("removeSpans: within-doc repeats keep their text; short docs " +
      "and span-free docs pass through unchanged") {
    val out = runRemove(Seq(
      (1L, "x y x y x"), // internal repeat only — nothing removed
      (2L, "p q"),       // shorter than n — no spans possible
      (3L, "p q r")      // no shared grams
    ), n = 3)
    assert(out == Seq(
      (1L, 5L, 0L, "x y x y x"),
      (2L, 2L, 0L, "p q"),
      (3L, 3L, 0L, "p q r")))
  }

  test("removeSpans: disjoint covered regions splice independently") {
    // doc 1 shares "a b" with doc 2 and "y z" with doc 3; middle
    // tokens survive between the two removed regions
    val out = runRemove(Seq(
      (1L, "a b m n y z"), (2L, "a b"), (3L, "y z")), n = 2)
    assert(out.head == ((1L, 6L, 4L, "m n")))
  }

  test("splice kernel matches a naive per-position reference on " +
      "random inputs") {
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val len = rnd.nextInt(30)
      val toks = Seq.tabulate(len)(i => s"t$i")
      val n = 1 + rnd.nextInt(5)
      val starts = (0 until len).filter(_ => rnd.nextBoolean()).map(_.toLong)
      val want = toks.zipWithIndex.collect {
        case (t, i) if !starts.exists(s => s <= i && i < s + n) => t
      }
      val got = DupSpans.splice(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          starts.toArray),
        n)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotSeq == want, s"len=$len n=$n starts=$starts")
    }
  }

  // ---- removeRepeatedSpans (intra-doc) ----

  private def runIntra(rows: Seq[(java.lang.Long, String)], n: Int) =
    DupSpans.removeRepeatedSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq

  test("removeRepeatedSpans: first occurrence survives, repeats go; " +
      "other docs never matter") {
    val out = runIntra(Seq(
      (1L, "x y z p q x y z"), // "x y z" repeats at start 5
      (2L, "x y z")            // same gram in ANOTHER doc: untouched
    ), n = 3)
    assert(out == Seq(
      (1L, 8L, 3L, "x y z p q"),
      (2L, 3L, 0L, "x y z")))
  }

  test("removeRepeatedSpans: overlapping repeat runs merge (n=2 over " +
      "an all-equal token run)") {
    // "a a a a": 2-gram starts 1,2 repeat → covers positions 1..3
    val out = runIntra(Seq((1L, "a a a a")), n = 2)
    assert(out == Seq((1L, 4L, 3L, "a")))
  }

  test("removeRepeatedSpans: short docs, empty and null text pass " +
      "through; repeatedStarts matches a naive reference on random " +
      "inputs") {
    val out = runIntra(Seq(
      (1L, "p q"), (2L, ""), (3L, null)), n = 3)
    assert(out == Seq((1L, 2L, 0L, "p q"), (2L, 0L, 0L, ""),
      (3L, 0L, 0L, "")))
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val len = rnd.nextInt(20)
      val toks = Seq.fill(len)(("t" + rnd.nextInt(3)))
      val n = 1 + rnd.nextInt(4)
      val grams = (0 to len - n).map(s => toks.slice(s, s + n).mkString(" "))
      val want = grams.zipWithIndex.collect {
        case (g, s) if grams.take(s).contains(g) => s.toLong
      }
      val got = DupSpans.repeatedStarts(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
        n)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      assert(gotSeq == want, s"toks=$toks n=$n")
    }
  }

  test("removeRepeatedSpans plans ZERO exchanges — pure scan work") {
    // spark.range source (a local Seq would constant-fold the plan)
    val df = spark.range(50).selectExpr("id AS doc_id",
      "'a b c a b c' AS text")
    val plan = DupSpans.removeRepeatedSpans(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("unicode opt-in: non-Latin spans actually remove; the ASCII " +
      "default silently no-ops (the failure the opt-in fixes)") {
    val rows: Seq[(java.lang.Long, String)] = Seq(
      (1L, "привет мир хорошо привет мир конец"),
      (2L, "привет мир плюс"))
    val df = rows.toDF("doc_id", "text")
    // default tokenizer: zero tokens, zero removals — the silent no-op
    val ascii = DupSpans.removeSpans(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(ascii == Seq((1L, 0L, 0L, ""), (2L, 0L, 0L, "")))
    // unicode: docs share the 2-gram "привет мир" → removed from both
    val uni = DupSpans.removeSpans(df, "doc_id", "text", 2, unicode = true)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(uni == Seq(
      (1L, 6L, 4L, "хорошо конец"), // both "привет мир" spans covered
      (2L, 3L, 2L, "плюс")))
    // intra-doc variant: repeated "мир" goes, first stays
    val intra = DupSpans.removeRepeatedSpans(
      Seq((java.lang.Long.valueOf(1L), "мир большой мир")).toDF("doc_id", "text"),
      "doc_id", "text", 1, unicode = true)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(intra == Seq((1L, 3L, 1L, "мир большой")))
  }

  test("persistTokens: identical result, text column read ONCE " +
      "instead of once per stage") {
    import org.apache.spark.sql.functions.{col, udf}
    val rows: Seq[(Long, String)] = (1L to 20L).map { i =>
      val t = "" + ('a' + i % 7).toChar + ('a' + i % 5).toChar
      (i, if (i % 3 == 0) s"shared boiler plate $t" else s"u$t v$t w$t")
    }
    def run(level: Option[org.apache.spark.storage.StorageLevel]) = {
      val acc = spark.sparkContext.longAccumulator("text-scan-probe")
      val probe = udf((s: String) => { acc.add(1L); s }).asNondeterministic()
      val df = rows.toDF("doc_id", "text0")
        .select(col("doc_id"), probe(col("text0")).as("text"))
      val out = DupSpans.removeSpans(df, "doc_id", "text", 2,
          persistTokens = level)
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
      (out, acc.value)
    }
    val (plain, plainScans) = run(None)
    val (pinned, pinnedScans) = run(
      Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    spark.catalog.clearCache()
    assert(pinned == plain)
    assert(pinnedScans == rows.length.toLong,
      s"expected one tokenize scan, counted $pinnedScans")
    assert(plainScans >= 2L * rows.length,
      s"expected multiple scans without the knob, counted $plainScans")
  }

  test("removeSharedSpans: only reference-shared spans splice; " +
      "corpus-internal duplication is untouched; empty reference " +
      "is a no-op") {
    val corpus = Seq(
      (java.lang.Long.valueOf(1L), "a b c z a b c"), // internal repeat only
      (java.lang.Long.valueOf(2L), "p q r s t"),     // p q r leaked from ref
      (java.lang.Long.valueOf(3L), "x y"))           // shorter than n
      .toDF("doc_id", "text")
    val ref = Seq(Tuple1("p q r other words")).toDF("text")
    val out = DupSpans.removeSharedSpans(corpus, "doc_id", "text",
        ref, "text", n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 7L, 0L, "a b c z a b c"), // cross-DOC dup is not the unit here
      (2L, 5L, 3L, "s t"),           // "p q r" span (start 0) covers 0..2
      (3L, 2L, 0L, "x y")))
    // empty reference: nothing to share, everything passes through
    val noop = DupSpans.removeSharedSpans(corpus, "doc_id", "text",
        ref.filter(org.apache.spark.sql.functions.lit(false)), "text", n = 3)
      .agg(org.apache.spark.sql.functions.sum($"n_removed")).as[Long].head()
    assert(noop == 0L)
  }

  test("removeSpans accounting reconciles with spanCoverage") {
    val rows: Seq[(java.lang.Long, String)] = (1L to 30L).map { i =>
      // letter-only tags: alphaTokens is [a-z]+, so a digit suffix
      // would collapse every "u$i" to the same token "u"
      val t = "" + ('a' + i / 10).toChar + ('a' + i % 10).toChar
      (java.lang.Long.valueOf(i),
        if (i % 3 == 0) s"shared boiler plate line $t tail"
        else s"u$t v$t w$t x$t")
    }
    val df = rows.toDF("doc_id", "text").repartition(5)
    val removed = DupSpans.removeSpans(df, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(removed.length == 30)
    removed.foreach { case (id, nTok, nRem, clean) =>
      assert(clean.split(" ").filter(_.nonEmpty).length == nTok - nRem)
      if (id % 3 == 0) assert(nRem > 0, s"doc $id")
      else assert(nRem == 0, s"doc $id")
    }
  }
}
