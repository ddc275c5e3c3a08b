package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interval-overlap join exactly-once semantics vs a brute-force
  * reference, and SymSpell fuzzy-join completeness vs the naive
  * quadratic answer. */
class OverlapFuzzySpec extends SparkSpec {
  import spark.implicits._

  private def overlapRun(a: Seq[(String, Long, Long)],
      b: Seq[(String, Long, Long)], bin: Long)
      : Seq[(String, String)] =
    RangeJoin.overlapByBins(
        a.toDF("aid", "alo", "ahi"), "alo", "ahi",
        b.toDF("bid", "blo", "bhi"), "blo", "bhi", bin)
      .select(col("aid"), col("bid")).as[(String, String)]
      .collect().toSeq.sorted

  private def overlapRef(a: Seq[(String, Long, Long)],
      b: Seq[(String, Long, Long)]): Seq[(String, String)] =
    (for {
      (ai, alo, ahi) <- a; (bi, blo, bhi) <- b
      if alo <= ahi && blo <= bhi && alo <= bhi && blo <= ahi
    } yield (ai, bi)).sorted

  test("overlap join: exactly-once across shared bins") {
    // long intervals spanning many bins must pair exactly once
    val a = Seq(("a1", 0L, 100L), ("a2", 50L, 60L), ("a3", 200L, 210L))
    val b = Seq(("b1", 90L, 150L), ("b2", 0L, 300L), ("b3", 400L, 410L))
    Seq(1L, 7L, 64L, 1000L).foreach { bin =>
      assert(overlapRun(a, b, bin) == overlapRef(a, b),
        s"diverged at binSize $bin")
    }
  }

  test("overlap join: touching endpoints count, empty intervals drop") {
    val a = Seq(("a", 10L, 20L), ("bad", 30L, 25L))
    val b = Seq(("b", 20L, 40L), ("c", 21L, 40L))
    assert(overlapRun(a, b, 16L) == Seq(("a", "b")))
  }

  test("overlap join: negative coordinates use floor bins") {
    val a = Seq(("a", -25L, -5L))
    val b = Seq(("b", -10L, 3L), ("c", -100L, -26L))
    assert(overlapRun(a, b, 10L) == Seq(("a", "b")))
  }

  private def fuzzyRun(words: Seq[String], minLen: Int = 3,
      maxBucket: Int = 1000): Set[(String, String, Int)] =
    FuzzyJoin.typoPairs(words.toDF("w"), "w", minLen = minLen,
        maxBucket = maxBucket)
      .as[(String, String, Int)].collect().toSet

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy join: complete vs naive quadratic on a messy vocabulary") {
    val words = Seq("graft", "graff", "grft", "grafts", "spark",
      "spork", "spam", "sparky", "park", "bark", "dark", "data",
      "date", "gate", "gaze", "maze")
    val ref = (for {
      a <- words; b <- words
      if a < b && lev(a, b) <= 1
    } yield (a, b, lev(a, b))).toSet
    assert(fuzzyRun(words) == ref)
  }

  test("fuzzy join: substitution, insertion, deletion all captured") {
    assert(fuzzyRun(Seq("abcd", "abxd")).nonEmpty)   // substitution
    assert(fuzzyRun(Seq("abcd", "abcde")).nonEmpty)  // insertion
    assert(fuzzyRun(Seq("abcd", "abd"), minLen = 3).nonEmpty) // deletion
  }

  test("fuzzy join: distance-2 metathesis pairs are filtered out") {
    // "abcd"/"bacd" share deletion variants but distance is 2
    assert(fuzzyRun(Seq("abcd", "bacd")).isEmpty)
  }

  test("fuzzy join: hub variant buckets above the cap are dropped") {
    // ten words differing only in the last char: all 45 pairs are
    // distance 1 and meet ONLY in the shared variant "abc"
    val ws = ('d' to 'm').map(c => s"abc$c")
    assert(fuzzyRun(ws).size == 45)
    assert(fuzzyRun(ws, maxBucket = 5).isEmpty)
  }

  test("sortedNeighborPairs: window bounds candidates, verify filters") {
    import spark.implicits._
    val v = Seq("cat", "cap", "car", "dog", "doh", "zebra").toDF("w")
    // window 5 covers every candidate; verify keeps distance-1 pairs
    val got = FuzzyJoin.sortedNeighborPairs(v, "w", window = 5)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("cap", "car", 1), ("cap", "cat", 1),
      ("car", "cat", 1), ("dog", "doh", 1)))
    // window 1 only sees rank-adjacent pairs: cap-car, car-cat, dog-doh
    val w1 = FuzzyJoin.sortedNeighborPairs(v, "w", window = 1)
      .as[(String, String, Int)].collect().toSet
    assert(w1 == Set(("cap", "car", 1), ("car", "cat", 1),
      ("dog", "doh", 1)))
  }
}
