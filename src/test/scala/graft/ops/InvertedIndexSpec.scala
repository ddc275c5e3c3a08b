package graft.ops

import graft.SparkSpec

/** invertedIndex: posting order (tf desc, id asc), topK bound,
  * minDf gate, df/cf exactness.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple apple banana"),
    (2L, "apple banana banana"),
    (3L, "apple cherry"),
    (4L, "date")
  ).toDF("doc_id", "text")

  private def run(topK: Int, minDf: Long) =
    TextAnalysis.invertedIndex(docs, "doc_id", "text", topK, minDf)
      .orderBy("term").as[(String, Long, Long, String)].collect().toSeq

  test("df/cf exact; postings ordered tf desc then id asc") {
    assert(run(topK = 5, minDf = 1) == Seq(
      ("apple", 3L, 5L, "1:3,2:1,3:1"),
      ("banana", 2L, 3L, "2:2,1:1"),
      ("cherry", 1L, 1L, "3:1"),
      ("date", 1L, 1L, "4:1")))
  }

  test("topK truncates the posting list but not df/cf") {
    assert(run(topK = 1, minDf = 1).take(2) == Seq(
      ("apple", 3L, 5L, "1:3"),
      ("banana", 2L, 3L, "2:2")))
  }

  test("minDf gates which terms are indexed") {
    assert(run(topK = 5, minDf = 2).map(_._1) == Seq("apple", "banana"))
  }

  test("tf ties break toward the smaller doc id") {
    val tie = Seq((9L, "zed"), (5L, "zed")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(tie, "doc_id", "text", 2, 1L)
      .as[(String, Long, Long, String)].collect().head
    assert(out == (("zed", 2L, 2L, "5:1,9:1")))
  }
}
