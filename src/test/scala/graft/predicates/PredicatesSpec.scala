package graft.predicates

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate-algebra semantics (reference: predicates.py:27-182,
  * tests/test_predicates.py). */
class PredicatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, "a", Seq("x", "y")),
    (2, "b", Seq("y", "z")),
    (3, "c", Seq[String]()),
    (4, "a", Seq("w"))).toDF("id", "cat", "tags")

  private def ids(p: RowPredicate): Seq[Int] =
    df.filter(p.toColumn).select("id").as[Int].collect().sorted.toSeq

  test("InSet membership") {
    assert(ids(InSet("cat", Seq("a"))) == Seq(1, 4))
  }

  test("InIntersection: array field overlaps value set") {
    assert(ids(InIntersection("tags", Seq("y"))) == Seq(1, 2))
    assert(ids(InIntersection("tags", Seq("q"))) == Seq())
  }

  test("negation and AND/OR reduction") {
    assert(ids(!InSet("cat", Seq("a"))) == Seq(2, 3))
    assert(ids(InSet("cat", Seq("a")) && InExpr(Set("id"), col("id") > 1)) == Seq(4))
    assert(ids(InSet("cat", Seq("b")) || InSet("cat", Seq("c"))) == Seq(2, 3))
    assert(ids(ReduceAnd(Seq(InExpr(Set("id"), col("id") > 1),
      InExpr(Set("id"), col("id") < 4)))) == Seq(2, 3))
  }

  test("fields() unions over the tree (reference get_fields)") {
    val p = (InSet("cat", Seq("a")) && InExpr(Set("id"), col("id") > 0)) ||
      InIntersection("tags", Seq("x"))
    assert(p.fields == Set("cat", "id", "tags"))
  }

  test("InLambda: true Scala closures compose through the algebra (in_lambda parity)") {
    // a closure Catalyst cannot express declaratively
    val oddLetter = InLambda[String]("cat", s => s.exists(c => (c - 'a') % 2 == 1))
    assert(ids(oddLetter) == Seq(2)) // only 'b' has an odd letter offset
    assert(oddLetter.fields == Set("cat"))
    // composes with the declarative members and negation
    assert(ids(!oddLetter && InExpr(Set("id"), col("id") < 3)) == Seq(1))
    // two-field closure
    val both = InLambda2[Int, String]("id", "cat", (i, s) => i % 2 == 0 && s == "a")
    assert(ids(both) == Seq(4))
    assert(both.fields == Set("id", "cat"))
    // closure over an ARRAY field (the case InExpr cannot cover when
    // the logic needs real Scala)
    val hasPair = InLambda[Seq[String]]("tags", t => t.sliding(2).exists(
      p => p.length == 2 && p(0) < p(1)))
    assert(ids(hasPair) == Seq(1, 2))
  }

  test("PseudorandomSplit buckets partition the data deterministically") {
    val big = spark.range(1000).toDF("k")
    val parts = (0 until 3).map(i =>
      big.filter(PseudorandomSplit("k", Seq(0.6, 0.2, 0.2), i).toColumn).count())
    assert(parts.sum == 1000)
    // deterministic: same split twice is identical
    val again = big.filter(PseudorandomSplit("k", Seq(0.6, 0.2, 0.2), 0).toColumn).count()
    assert(again == parts(0))
    // roughly proportional (md5 is uniform; 1000 keys → loose bounds)
    assert(parts(0) > 500 && parts(0) < 700)
  }

  test("PseudorandomSplit validates ratios and keep index") {
    intercept[IllegalArgumentException](PseudorandomSplit("k", Seq(), 0))
    intercept[IllegalArgumentException](PseudorandomSplit("k", Seq(-1.0, 2.0), 0))
    intercept[IllegalArgumentException](PseudorandomSplit("k", Seq(0.0, 0.0), 0))
    intercept[IllegalArgumentException](PseudorandomSplit("k", Seq(0.5, 0.5), 2))
  }
}
