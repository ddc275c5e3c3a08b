package graft.ops

import graft.SparkSpec

/** tokenBudgetMixture: brute-force cross-check of the hash-ordered
  * prefix selection, budget maximality, unbudgeted-group drop, and
  * the zero-budget / zero-token edge.
  */
class TokenMixtureSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // docs: i%7 "tok"s each, three groups; g2 is deliberately unbudgeted
  private val rows: Seq[(Long, String, String)] = (1L to 40L).map { i =>
    (i, s"g${i % 3}", ("tok " * (i % 7).toInt).trim)
  }

  private def bruteForce(seed: Long,
      budgets: Map[String, Long]): Seq[(Long, String, Long, Long)] =
    rows.filter(r => budgets.contains(r._2)).groupBy(_._2).toSeq
      .flatMap { case (g, docs) =>
        val ordered = docs.sortBy(d => (md5hex(s"$seed:mix:$g:${d._1}"), d._1))
        var cum = 0L
        ordered.flatMap { d =>
          val nt = d._3.split(" ").count(_.nonEmpty).toLong
          cum += nt
          if (cum <= budgets(g)) Some((d._1, g, nt, cum)) else None
        }
      }.sortBy(_._1)

  test("kept set equals the brute-force hash-ordered prefix per group; " +
      "unbudgeted groups are dropped") {
    val budgets = Map("g0" -> 20L, "g1" -> 9L)
    val out = Sampling.tokenBudgetMixture(rows.toDF("doc_id", "grp", "text"),
        "doc_id", "grp", "text", budgets, seed = 7)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    val expected = bruteForce(7, budgets)
    assert(out == expected)
    assert(out.nonEmpty && out.forall(_._2 != "g2"))
    // maximality: each group's kept tokens + the next doc would overflow
    budgets.foreach { case (g, b) =>
      assert(out.filter(_._2 == g).map(_._3).sum <= b)
    }
  }

  test("seed changes the prefix; each seed still matches brute force") {
    val budgets = Map("g0" -> 20L, "g1" -> 9L)
    val a = bruteForce(7, budgets)
    val b = bruteForce(8, budgets)
    assert(a != b, "distinct seeds produced identical mixes (suspicious)")
    val out = Sampling.tokenBudgetMixture(rows.toDF("doc_id", "grp", "text"),
        "doc_id", "grp", "text", budgets, seed = 8)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == b)
  }

  test("zero budget keeps only the zero-token docs preceding the " +
      "first counted token") {
    val budgets = Map("g0" -> 0L)
    val out = Sampling.tokenBudgetMixture(rows.toDF("doc_id", "grp", "text"),
        "doc_id", "grp", "text", budgets, seed = 7)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == bruteForce(7, budgets))
    assert(out.forall(r => r._3 == 0L && r._4 == 0L))
  }

  test("plan shape: no Window operator — the per-group cumsum rides " +
      "the distributed prefix scan") {
    val d = Sampling.tokenBudgetMixture(rows.toDF("doc_id", "grp", "text"),
      "doc_id", "grp", "text", Map("g0" -> 20L, "g1" -> 9L))
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-group cumsum fell back to a window operator:\n$plan")
  }

  test("null ids and null text follow the id/token contracts") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), "g", null.asInstanceOf[String]),
      (null.asInstanceOf[java.lang.Long], "g", "tok tok"))
      .toDF("doc_id", "grp", "text")
    val out = Sampling.tokenBudgetMixture(df, "doc_id", "grp", "text",
        Map("g" -> 5L))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "g", 0L, 0L)))
  }
}
