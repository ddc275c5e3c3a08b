package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 batch seven: suffix-array machinery (prefix doubling +
  * LRS), Bradley–Terry preference aggregation, B-cubed cluster
  * eval, split-conformal calibration, Kneser–Ney LM training. */
class SuffixPrefSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus over a tiny alphabet so
  // repeats and cross-doc shared suffixes actually occur
  private def synthDocs(n: Int, maxLen: Int): Seq[(Long, String)] = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state
    }
    (0 until n).map { i =>
      val len = 1 + math.floorMod(next(), maxLen).toInt
      val s = new StringBuilder
      (0 until len).foreach(_ =>
        s.append(if (math.floorMod(next(), 2L) == 0L) 'a' else 'b'))
      (i.toLong, s.toString)
    }
  }

  /** Brute-force dense suffix ranks: sort ALL (doc-confined)
    * suffixes lexicographically, equal strings share a rank. */
  private def bruteRanks(docs: Seq[(Long, String)], maxLen: Int)
      : Set[(Long, Long, Long)] = {
    val sufs = docs.flatMap { case (id, t0) =>
      val t = t0.take(maxLen)
      (1 to t.length).map(p => (id, p.toLong, t.substring(p - 1)))
    }
    val rankOf = sufs.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => (s, i + 1L) }.toMap
    sufs.map { case (id, p, s) => (id, p, rankOf(s)) }.toSet
  }

  test("prefix-doubling suffix ranks == brute-force dense suffix sort") {
    val docs = synthDocs(30, 40) :+ (1000L, "") :+ (1001L, "a")
    val df = docs.toDF("doc_id", "text")
    val got = SuffixArray.suffixRanks(df, "doc_id", "text", maxLen = 32)
      .select(col("doc_id"), col("pos"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteRanks(docs, 32))
  }

  test("identical docs share every suffix rank; truncation respects maxLen") {
    val docs = Seq((1L, "abab"), (2L, "abab"), (3L, "abababab"))
    val got = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen = 4)
      .as[(Long, Long, Long)].collect()
    val byDoc = got.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(byDoc(1L) == byDoc(2L))     // same text, same ranks
    assert(byDoc(3L) == byDoc(1L))     // truncated to the same 4 chars
    assert(got.toSet == bruteRanks(docs, 4))
  }

  test("suffixRanks plan has no window and no single-partition exchange") {
    val df = synthDocs(5, 10).toDF("doc_id", "text")
    val plan = SuffixArray.suffixRanks(df, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "prefix doubling must not fall back to a window rank")
  }

  test("longestRepeat finds the exact LRS; zero when nothing repeats") {
    val docs = Seq(
      (1L, "abcabc"),    // "abc" repeats -> 3
      (2L, "aaaa"),      // "aaa" at pos 1 and 2 -> 3
      (3L, "abcdefgh"),  // all distinct chars -> 0
      (4L, "xy"),        // minimal doc, no repeat -> 0
      (5L, "banana"))    // "ana" -> 3
    val got = SuffixArray.longestRepeat(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen = 100)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 0L, 4L -> 0L, 5L -> 3L))
  }

  test("common_prefix_len counts code points, not UTF-16 units") {
    val rows = Seq(("abc", "abd"), ("", "x"), ("same", "same"),
      ("𝄞a", "𝄞b"), ("a", "ab"))
      .toDF("a", "b")
      .select(SuffixArray.commonPrefixLen(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(rows == Seq(2L, 0L, 4L, 1L, 1L))
  }

  test("bradleyTerry: 2-item closed form is exact in integer arithmetic") {
    // a beats b 3-1 -> strengths 3:1 -> ratings 750000 / 250000
    val wins = Seq(("a", "b", 3L), ("b", "a", 1L)).toDF("w", "l", "n")
    val got = Stats.bradleyTerry(wins, "w", "l", "n")
      .select(col("item"), col("games"), col("wins"), col("rating"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 4L, 3L, 750000L), ("b", 4L, 1L, 250000L)))
  }

  test("bradleyTerry tracks the float MM fixed point") {
    val wins = Seq(("a", "b", 8L), ("b", "c", 6L), ("c", "a", 2L),
      ("a", "c", 5L), ("b", "a", 3L)).toDF("w", "l", "n")
    val got = Stats.bradleyTerry(wins, "w", "l", "n", iters = 8)
      .select(col("item"), col("rating")).as[(String, Long)]
      .collect().toMap
    // independent float reference, same update, same rounds
    val items = Seq("a", "b", "c")
    val nij = Map(("a", "b") -> 11.0, ("b", "a") -> 11.0,
      ("a", "c") -> 7.0, ("c", "a") -> 7.0,
      ("b", "c") -> 6.0, ("c", "b") -> 6.0)
    val w = Map("a" -> 13.0, "b" -> 9.0, "c" -> 2.0)
    var p = items.map(_ -> 1.0).toMap
    (1 to 8).foreach { _ =>
      p = items.map { i =>
        val den = items.filter(_ != i).flatMap(j =>
          nij.get((i, j)).map(_ / (p(i) + p(j)))).sum
        i -> w(i) / den
      }.toMap
    }
    val tot = items.map(p).sum
    items.foreach { i =>
      val want = math.floor(1e6 * p(i) / tot).toLong
      assert(math.abs(got(i) - want) <= 3L,
        s"$i: got ${got(i)}, float reference $want")
    }
    assert(got.values.sum <= 1000000L && got.values.sum >= 999997L)
  }

  test("bradleyTerry rejects win counts that would overflow the fixed point") {
    val wins = Seq(("a", "b", 100000000L)).toDF("w", "l", "n")
    val e = intercept[IllegalArgumentException] {
      Stats.bradleyTerry(wins, "w", "l", "n").collect()
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("bcubed: hand-computed confusion and the perfect-clustering identity") {
    val items = Seq(("c1", "L1"), ("c1", "L1"), ("c1", "L2"), ("c2", "L2"))
      .toDF("c", "l")
    val got = Dedup.bcubed(items, col("c"), col("l"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("L1", 2L, 1333332L, 2000000L),
      ("L2", 2L, 1333333L, 1000000L)))
    // clustering == labels -> every per-item p and r is exactly 1e6
    val perfect = Dedup.bcubed(items, col("l"), col("l"))
      .as[(String, Long, Long, Long)].collect()
    perfect.foreach { case (_, n, sp, sr) =>
      assert(sp == n * 1000000L && sr == n * 1000000L)
    }
  }

  test("conformal: threshold is the exact order statistic, coverage holds") {
    val rows = (1 to 1000).map(i => (i.toLong, i.toLong))
    val df = rows.toDF("id", "score")
    val got = Stats.conformal(df, "score", pmod(col("id"), lit(2)) === 0,
      alphaPpm = 100000L).as[(Long, Long, Option[Long], Long, Long)]
      .head()
    val calib = rows.filter(_._1 % 2 == 0).map(_._2).sorted
    val k = ((calib.size + 1) * 900000L + 999999L) / 1000000L
    assert(got._1 == calib.size && got._2 == k)
    assert(got._3.contains(calib(k.toInt - 1)))
    // scores are iid-exchangeable here, so realized coverage ~ 90%
    assert(got._5 >= 850000L && got._5 <= 950000L)
    // alpha so small the quantile falls off the calib slice -> +inf
    val inf = Stats.conformal(df, "score", pmod(col("id"), lit(2)) === 0,
      alphaPpm = 1L).as[(Long, Long, Option[Long], Long, Long)].head()
    assert(inf._3.isEmpty && inf._5 == 1000000L)
  }

  test("trainKneserNey matches the hand formula on a tiny corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("id", "text")
    val got = TextAnalysis.trainKneserNey(docs, "text")
      .select(col("w1"), col("w2"), col("c"), col("p_kn_e9"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // bigrams: (a,b)x2 (b,a)x1 (b,c)x1; fw(a)=1 fw(b)=2;
    // bw(a)=1 bw(b)=1 bw(c)=1; N1+(..)=3; same double eval order
    def p(c: Long, cw1: Long, fw: Long, bw: Long): Long =
      math.floor(1e9 * ((math.max(c - 0.75, 0.0)
        + 0.75 * fw * (bw.toDouble / 3.0)) / cw1)).toLong
    assert(got(("a", "b")) == ((2L, p(2, 2, 1, 1))))
    assert(got(("b", "a")) == ((1L, p(1, 2, 2, 1))))
    assert(got(("b", "c")) == ((1L, p(1, 2, 2, 1))))
    // each context's kept probability mass stays under 1e9
    assert(p(2, 2, 1, 1) <= 1000000000L)
  }

  test("knScore: coverage stats and the empty-doc contract") {
    val train = Seq((1L, "x y x y"), (2L, "y z")).toDF("id", "text")
    val model = TextAnalysis.trainKneserNey(train, "text")
    val held = Seq((10L, "x y q"), (11L, "q"), (12L, "")).toDF("id", "text")
    val got = TextAnalysis.knScore(held, "id", "text", model)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "x y q": bigrams (x,y) seen, (y,q) unseen
    assert(got(10L)._2 == 2L && got(10L)._3 == 1L && got(10L)._4 > 0L)
    // one-token and empty docs: zero bigrams, still one row each
    assert(got(11L) == ((11L, 0L, 0L, 0L)))
    assert(got(12L) == ((12L, 0L, 0L, 0L)))
  }
}
