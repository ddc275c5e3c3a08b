package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StripMarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.stripMarkup($"t").as("c"))
      .as[String].collect().head

  test("tags are stripped, text content preserved") {
    assert(strip("<p>Hello <b>bold</b> world.</p>") ==
      "Hello bold world.")
  }

  test("script and style bodies are removed wholesale, including " +
      "bare '<' inside them") {
    assert(strip("<script>var x = 1 < 2 && y;</script>keep" +
      "<style type=\"text/css\">body { color: red; }</style>me") ==
      "keep me")
  }

  test("comments vanish, even when they contain tags") {
    assert(strip("a<!-- hidden <p>tag</p> -->b") == "a b")
  }

  test("block closers and <br> become line breaks; inline tags " +
      "become spaces") {
    assert(strip("<h1>Title</h1><p>one</p><p>two</p>line<br/>break") ==
      "Title\none\ntwo\nline\nbreak")
  }

  test("entities decode in the safe order: angle brackets after tag " +
      "stripping, ampersand last") {
    assert(strip("1 &lt; 2 &amp; 3 &gt; 2") == "1 < 2 & 3 > 2")
    // &amp;lt; is the LITERAL text "&lt;" — must not become '<'
    assert(strip("write &amp;lt; for a literal") ==
      "write &lt; for a literal")
    assert(strip("&quot;q&quot; &#39;a&#39; &apos;b&apos;&nbsp;end") ==
      "\"q\" 'a' 'b' end")
  }

  test("whitespace normalizes: runs collapse, spaces trim around " +
      "breaks, blank runs cap at one empty line, ends trim") {
    assert(strip("  a\t\tb  ") == "a b")
    assert(strip("<p>a</p>   <p>b</p>") == "a\nb")
    assert(strip("<p>a</p><p></p><p></p><p></p><p>b</p>") == "a\n\nb")
  }

  test("null propagates; plain text passes through") {
    val r = Seq((1L, "no markup at all"), (2L, null: String))
      .toDF("id", "t")
      .select($"id", TextAnalysis.stripMarkup($"t").as("c"))
      .as[(Long, Option[String])].collect().sortBy(_._1).toList
    assert(r == List((1L, Some("no markup at all")), (2L, None)))
  }

  test("case-insensitive tags: <SCRIPT>, </DIV>, <BR> all handled") {
    assert(strip("<SCRIPT>x</SCRIPT><DIV>a</DIV>b<BR>c") == "a\nb\nc")
  }
}
