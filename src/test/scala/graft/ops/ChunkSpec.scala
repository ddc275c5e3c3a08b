package graft.ops

import graft.SparkSpec

/** chunkTokens: boundaries, overlap, tails, empty docs, guards. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  // letter-only tokens: alphaTokens is [a-z]+, digits would vanish
  private def tok(i: Int): String = s"w${('a' + i).toChar}"
  private def toks(n: Int): String = (0 until n).map(tok).mkString(" ")

  test("chunks tile the document with the declared overlap") {
    val df = Seq((1L, toks(10))).toDF("doc_id", "text")
    val out = Chunk.chunkTokens(df, "doc_id", "text", chunkSize = 4,
      overlap = 1).orderBy("chunk_idx")
      .as[(Long, Int, Int, String)].collect().toSeq
    // stride 3: starts 0,3,6,9 → [0..3][3..6][6..9][9]
    assert(out == Seq(
      (1L, 0, 4, Seq(0, 1, 2, 3).map(tok).mkString(" ")),
      (1L, 1, 4, Seq(3, 4, 5, 6).map(tok).mkString(" ")),
      (1L, 2, 4, Seq(6, 7, 8, 9).map(tok).mkString(" ")),
      (1L, 3, 1, tok(9))))
    // consecutive chunks share exactly `overlap` tokens
    out.sliding(2).foreach { case Seq(a, b) =>
      val (ta, tb) = (a._4.split(" ").toSeq, b._4.split(" ").toSeq)
      assert(ta.takeRight(1) == tb.take(1))
    case _ => ()
    }
  }

  test("no overlap = disjoint tiling; exact multiple has no tail") {
    val df = Seq((1L, toks(8))).toDF("doc_id", "text")
    val out = Chunk.chunkTokens(df, "doc_id", "text", chunkSize = 4)
      .orderBy("chunk_idx").as[(Long, Int, Int, String)].collect().toSeq
    assert(out.map(_._3) == Seq(4, 4))
    assert(out.flatMap(_._4.split(" ")) == (0 until 8).map(tok))
  }

  test("zero-token documents emit no chunks; chunking is distributed") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "only three words here"))
      .toDF("doc_id", "text")
    val out = Chunk.chunkTokens(df.repartition(5), "doc_id", "text", 10)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq((3L, 0, 4, "only three words here")))
  }

  test("unicode opt-in: non-Latin docs chunk instead of vanishing") {
    val df = Seq((1L, "привет мир хорошо конец файл")).toDF("doc_id", "text")
    // default tokenizer: zero tokens → no chunks (the silent no-op)
    assert(Chunk.chunkTokens(df, "doc_id", "text", 2).isEmpty)
    val out = Chunk.chunkTokens(df, "doc_id", "text", 2, unicode = true)
      .orderBy("chunk_idx").as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 2, "привет мир"), (1L, 1, 2, "хорошо конец"),
      (1L, 2, 1, "файл")))
  }

  test("lengthHistogram: power-of-two ceilings, waste math, empties out") {
    import spark.implicits._
    // lengths: 1, 2, 3, 4, 5, 0 -> buckets 1, 2, 4, 4, 8; empty dropped
    val docs = Seq("a", "a b", "a b c", "a b c d", "a b c d e", "??? 123")
      .toDF("text")
    val got = Packing.lengthHistogram(docs, "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 8L))
    assert(got(1L) == ((1L, 1L, 1L, 1L, 0L)))
    assert(got(2L) == ((2L, 1L, 2L, 2L, 0L)))
    // bucket 4: lengths 3+4=7 real, 8 padded -> waste 125000
    assert(got(4L) == ((4L, 2L, 7L, 8L, 125000L)))
    // bucket 8: 5 real, 8 padded -> 375000
    assert(got(8L) == ((8L, 1L, 5L, 8L, 375000L)))
  }

  test("guards: chunkSize positive, overlap within [0, chunkSize)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunk.chunkTokens(df, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      Chunk.chunkTokens(df, "doc_id", "text", 4, overlap = 4))
    intercept[IllegalArgumentException](
      Chunk.chunkTokens(df, "doc_id", "text", 4, overlap = -1))
  }
}
