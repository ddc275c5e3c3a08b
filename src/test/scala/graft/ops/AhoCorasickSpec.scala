package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.codecs.AhoCorasick

/** Automaton semantics (replace-count convention, overlap and
  * nesting edges) plus end-to-end parity of tagKeywordsFast with the
  * contains-join tagKeywords on adversarial corpora. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String, pats: String*): Seq[Long] =
    new AhoCorasick.Automaton(pats.toArray).counts(text).toSeq

  test("automaton: basic multi-pattern counting") {
    assert(counts("the cat and the dog", "the", "cat", "dog", "bird")
      == Seq(2L, 1L, 1L, 0L))
  }

  test("automaton: self-overlapping pattern uses replace semantics") {
    // replace('aaaa','aa','') removes two: greedy non-overlapping
    assert(counts("aaaa", "aa") == Seq(2L))
    assert(counts("aaaaa", "aa") == Seq(2L))
    assert(counts("abababa", "aba") == Seq(2L))
  }

  test("automaton: nested and shared-prefix patterns count independently") {
    assert(counts("ababc", "ab", "abc", "babc", "c")
      == Seq(2L, 1L, 1L, 1L))
    assert(counts("she sells seashells", "she", "he", "hells")
      == Seq(2L, 2L, 1L))
  }

  test("automaton: matches crossing fail transitions") {
    // 'abda' matches at 0 and 3 — overlapping, so greedy keeps 1,
    // exactly what replace('abdabdab','abda','') removes
    assert(counts("abdabdab", "abda", "bdab") == Seq(1L, 1L))
    assert(counts("abdbdab", "abd", "bdab") == Seq(1L, 1L))
  }

  test("automaton: non-ascii patterns take the overflow path") {
    assert(counts("héllo héllo wörld", "héllo", "wörld", "llo")
      == Seq(2L, 1L, 2L))
    assert(counts("ααβ ααβ", "ααβ", "αβ") == Seq(2L, 2L))
  }

  test("tagKeywordsFast equals tagKeywords on an adversarial corpus") {
    val docs = Seq(
      (1L, "batch batch stream table scan"),
      (2L, "JOIN join MERGE merge scan"),
      (3L, "tabletable streamstream"),   // adjacent repeats
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "unrelated text entirely"),
      (7L, "sstreams tablesscan joinjoinjoin"))
      .toDF("doc_id", "text")
    val dict = Seq(("data", "batch"), ("data", "stream"),
      ("data", "table"), ("exec", "join"), ("exec", "merge"),
      ("exec", "scan"), ("exec", "Scan")).toDF("tag", "kw")
    val slow = TextAnalysis.tagKeywords(docs, "doc_id", "text",
        dict, "tag", "kw")
      .as[(Long, String, String, Long)].collect().toSet
    val fast = TextAnalysis.tagKeywordsFast(docs, "doc_id", "text",
        dict, "tag", "kw")
      .as[(Long, String, String, Long)].collect().toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }

  test("tagKeywordsFast plans as a projection, no join before tags") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val dict = Seq(("t", "a")).toDF("tag", "kw")
    val plan = TextAnalysis.tagKeywordsFast(docs, "doc_id", "text",
      dict, "tag", "kw").queryExecution.executedPlan.toString
    // exactly one join (the dict-sized tag attachment), broadcast
    assert(plan.split("Join", -1).length - 1 <= 2,
      s"unexpected joins in:\n$plan")
    assert(plan.contains("ac_counts") || plan.contains("AcMatchCounts")
      || plan.contains("posexplode") || plan.contains("Generate"))
  }

  test("graft_ac_counts SQL function registers and runs") {
    graft.functions.GraftExtensions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_ac_counts('aa bb aa', 'aa,bb,cc') AS c")
      .as[Seq[Long]].head()
    assert(got == Seq(2L, 1L, 0L))
  }

  test("scan-speed evidence: one pass beats the contains-join on a wide dict") {
    // 2000 docs x ~100 words, 200-keyword dictionary — the regime
    // the automaton exists for. Numbers land in the AhoCorasick
    // scaladoc; the assertion is only directional (>=1x) to stay
    // robust on a loaded machine.
    val vocab = (0 until 400).map(i => s"w$i")
    val docs = (0 until 2000).map { d =>
      (d.toLong, (0 until 100).map(i => vocab((d * 31 + i * 7) % 400))
        .mkString(" "))
    }.toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = (0 until 200).map(i => ("t", s"w${i * 2}")).toDF("tag", "kw")
    def time(f: => Long): (Long, Long) = {
      f // warmup
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1000000, n)
    }
    val (tSlow, nSlow) =
      time(TextAnalysis.tagKeywords(docs, "doc_id", "text",
        dict, "tag", "kw").count())
    val (tFast, nFast) =
      time(TextAnalysis.tagKeywordsFast(docs, "doc_id", "text",
        dict, "tag", "kw").count())
    info(s"contains-join ${tSlow}ms vs automaton ${tFast}ms " +
      f"(${tSlow.toDouble / tFast}%.1fx) on 2000 docs x 200 keywords")
    assert(nSlow == nFast && nFast > 0)
    assert(tFast <= tSlow * 2, s"automaton unexpectedly slow: $tFast vs $tSlow")
    docs.unpersist()
  }

  test("maxKeywords guard refuses an oversized dictionary") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val dict = (1 to 20).map(i => ("t", s"kw$i")).toDF("tag", "kw")
    intercept[IllegalArgumentException] {
      TextAnalysis.tagKeywordsFast(docs, "doc_id", "text", dict,
        "tag", "kw", maxKeywords = 10)
    }
  }
}
