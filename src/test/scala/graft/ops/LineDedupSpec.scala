package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def cleaned(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"n_lines", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toList

  test("corpus-duplicated line keeps only its first occurrence; " +
      "unique lines untouched byte-for-byte") {
    val d = docs(
      1L -> "BOILER\nalpha text one\nBOILER TWO",
      2L -> "BOILER\nbeta text two",
      3L -> "gamma text three\nBOILER")
    val r = cleaned(LineDedup.dedupLines(d, "doc_id", "text"))
    assert(r == List(
      (1L, 3L, 0L, "BOILER\nalpha text one\nBOILER TWO"),
      (2L, 2L, 1L, "beta text two"),
      (3L, 2L, 1L, "gamma text three")))
  }

  test("keepFirst=false removes every occurrence of an " +
      "over-threshold line") {
    val d = docs(1L -> "DUP\nkeep a", 2L -> "DUP\nkeep b")
    val r = cleaned(
      LineDedup.dedupLines(d, "doc_id", "text", keepFirst = false))
    assert(r == List((1L, 2L, 1L, "keep a"), (2L, 2L, 1L, "keep b")))
  }

  test("maxOccurrences threshold: a line at exactly the cap " +
      "survives everywhere; one past the cap dedups") {
    val d = docs(1L -> "twice", 2L -> "twice",
      3L -> "thrice", 4L -> "thrice", 5L -> "thrice")
    val r = cleaned(
      LineDedup.dedupLines(d, "doc_id", "text", maxOccurrences = 2L))
    assert(r == List((1L, 1L, 0L, "twice"), (2L, 1L, 0L, "twice"),
      (3L, 1L, 0L, "thrice"), (4L, 1L, 1L, ""), (5L, 1L, 1L, "")))
  }

  test("minLineChars exempts short lines: empty separator lines and " +
      "short tokens never dedup, and empty lines are preserved in " +
      "reconstruction") {
    val d = docs(
      1L -> "para one\n\nok\n\nSHARED FOOTER LINE",
      2L -> "para two\n\nok\n\nSHARED FOOTER LINE")
    val r = cleaned(LineDedup.dedupLines(d, "doc_id", "text",
      minLineChars = 3))
    assert(r == List(
      (1L, 5L, 0L, "para one\n\nok\n\nSHARED FOOTER LINE"),
      (2L, 5L, 1L, "para two\n\nok\n")))
  }

  test("first occurrence is the corpus-wide (id, pos) minimum, " +
      "including within one document") {
    val d = docs(
      5L -> "later doc\nREPEAT",
      2L -> "REPEAT\nmiddle\nREPEAT")
    val r = cleaned(LineDedup.dedupLines(d, "doc_id", "text"))
    // doc 2 pos 1 is the keeper; doc 2 pos 3 and doc 5 pos 2 go
    assert(r == List(
      (2L, 3L, 1L, "REPEAT\nmiddle"),
      (5L, 2L, 1L, "later doc")))
  }

  test("null text reads as empty; null ids are dropped") {
    val d = Seq((java.lang.Long.valueOf(1L), "line a"),
        (java.lang.Long.valueOf(2L), null: String),
        (null: java.lang.Long, "line a"))
      .toDF("doc_id", "text")
    val r = cleaned(LineDedup.dedupLines(d, "doc_id", "text"))
    assert(r == List((1L, 1L, 0L, "line a"), (2L, 1L, 0L, "")))
  }

  test("duplicatedLines reports over-threshold lines with corpus " +
      "count, length and first doc; under-threshold and exempt " +
      "lines absent") {
    val d = docs(
      3L -> "FOOTER LINE\nunique a\nxy",
      1L -> "FOOTER LINE\nunique b\nxy",
      2L -> "FOOTER LINE")
    val r = LineDedup
      .duplicatedLines(d, "doc_id", "text", minLineChars = 3)
      .as[(String, Long, Long, Long)].collect().toList
    assert(r == List(("FOOTER LINE", 3L, 11L, 1L)))
  }

  test("dedupLines refuses maxOccurrences = 0 with a corrective " +
      "message") {
    val e = intercept[IllegalArgumentException] {
      LineDedup.dedupLines(docs(1L -> "a line here"), "doc_id",
        "text", maxOccurrences = 0L)
    }
    assert(e.getMessage.contains("maxOccurrences"))
  }
}
