package graft.codecs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextAnalysis

/** Winnowing fingerprint semantics (Schleimer et al. 2003): the
  * match guarantee, locality under distant edits, and the edge
  * cases (short text, fewer grams than the window). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fp(texts: String*): Seq[Seq[Long]] =
    texts.toSeq.toDF("text")
      .select(TextAnalysis.winnowFingerprints($"text", k = 8, w = 4))
      .as[Seq[Long]].collect().toSeq

  test("deterministic, sorted, distinct") {
    val Seq(a, b) = fp("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog")
    assert(a == b)
    assert(a == a.sorted && a.distinct == a)
    assert(a.nonEmpty)
  }

  test("match guarantee: shared substring >= w+k-1 chars yields a common fingerprint") {
    // w+k-1 = 11; the 30-char shared core appears in both docs at
    // different offsets surrounded by unrelated text
    val core = "abcdefghijklmnopqrstuvwxyz0123"
    val Seq(a, b) = fp(s"XXXX$core", s"totally different prefix $core and suffix")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("locality: an edit far from a region keeps its fingerprints") {
    val base = "a" * 40 + "the target region stays put here" + "b" * 40
    val edited = "c" * 40 + "the target region stays put here" + "b" * 40
    val Seq(a, b) = fp(base, edited)
    // the unchanged right half keeps its selected hashes
    assert(a.toSet.intersect(b.toSet).size >= 3)
    // one whole-document hash (the exact-dup fingerprint) has no
    // overlap at all under the same edit — the property winnowing adds
    assert(a != b)
  }

  test("short-text edges: under k chars → one whole-text gram; under w grams → one window") {
    val Seq(tiny) = fp("hi")
    assert(tiny.length == 1) // single whole-text gram
    val Seq(short) = fp("abcdefghij") // 10 chars → 3 grams < w=4 → 1 min
    assert(short.length == 1)
    val Seq(empty) = fp("")
    assert(empty.length == 1) // md5("") gram — defined, not a crash
  }

  test("grams count codepoints, not UTF-16 units (non-BMP safe)") {
    // U+1F600 is a surrogate pair in UTF-16 but ONE character to a
    // SQL engine's substr/length — gram boundaries must agree
    val emoji = new String(Character.toChars(0x1F600))
    val text = s"abc${emoji}defghijklm"
    val Seq(a) = fp(text)
    assert(a.nonEmpty)
    // 14 codepoints → 7 grams → 4 windows; UTF-16 indexing would
    // see 15 units and build a different (possibly split-surrogate) set
    val codepoints = text.codePointCount(0, text.length)
    assert(codepoints == 14 && text.length == 15)
  }

  test("case-normalized and SQL-registered") {
    val Seq(a, b) = fp("Mixed CASE Document Text Here", "mixed case document text here")
    assert(a == b)
    graft.functions.GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT graft_winnow_fingerprints(lower('Mixed CASE Document Text Here'), 8, 4)")
      .as[Seq[Long]].collect()(0)
    assert(viaSql == a)
  }
}
