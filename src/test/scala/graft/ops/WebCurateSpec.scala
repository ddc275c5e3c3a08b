package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL curation layer: host/registrable-domain extraction,
  * normalization (dedup-key semantics), per-domain caps
  * (WindowGroupLimit plan), domain blocklist. */
class WebCurateSpec extends SparkSpec {
  import spark.implicits._

  private def host1(u: String): String =
    Seq(u).toDF("u").select(WebCurate.urlHost(col("u"))).head().getString(0)
  private def dom1(u: String): String =
    Seq(u).toDF("u").select(
      WebCurate.registrableDomain(WebCurate.urlHost(col("u"))))
      .head().getString(0)
  private def norm1(u: String): String =
    Seq(u).toDF("u").select(WebCurate.normalizeUrl(col("u")))
      .head().getString(0)

  test("urlHost: scheme, userinfo, port, case") {
    assert(host1("https://WWW.Example.COM/path") == "www.example.com")
    assert(host1("http://user:pw@a.b.co.uk:8080/x?q=1") == "a.b.co.uk")
    assert(host1("ftp://files.example.org") == "files.example.org")
    assert(host1("not a url") == "")
    assert(host1(null) == "")
  }

  test("registrableDomain: two-level suffixes, short hosts") {
    assert(dom1("https://www.example.com/") == "example.com")
    assert(dom1("https://a.b.c.example.com/") == "example.com")
    assert(dom1("https://news.bbc.co.uk/") == "bbc.co.uk")
    assert(dom1("https://deep.sub.shop.com.au/") == "shop.com.au")
    assert(dom1("https://example.com/") == "example.com")
    assert(dom1("https://localhost/") == "localhost")
  }

  test("normalizeUrl: case, default ports, fragment, bare query") {
    assert(norm1("HTTPS://WWW.Ex.COM:443/Path?Q=Mixed#frag") ==
      "https://www.ex.com/Path?Q=Mixed")
    assert(norm1("http://a.com:80/x") == "http://a.com/x")
    assert(norm1("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(norm1("https://a.com:80/x") == "https://a.com:80/x")
    assert(norm1("http://U:P@A.com/x?") == "http://a.com/x")
    assert(norm1("plain text #note") == "plain text ")
    // normalization is a stable dedup key: idempotent
    assert(norm1(norm1("HTTPS://A.com:443/p#f")) ==
      norm1("HTTPS://A.com:443/p#f"))
  }

  test("domainStats: integer share over registrable domains") {
    val df = Seq(
      "https://a.ex.com/1", "https://b.ex.com/2", "https://ex.com/3",
      "https://other.org/1").toDF("url")
    val got = WebCurate.domainStats(df, "url")
      .as[(String, Long, Long)].collect()
      .map { case (d, n, s) => d -> ((n, s)) }.toMap
    assert(got("ex.com") == ((3L, 750000L)))
    assert(got("other.org") == ((1L, 250000L)))
  }

  test("domainCap: at most cap per domain, deterministic, " +
      "WindowGroupLimit plan") {
    val df = (1 to 100).map(i =>
      (i.toLong, s"https://www.hot.com/p/$i")) ++
      (101 to 105).map(i => (i.toLong, s"https://cold.org/p/$i"))
    val d = df.toDF("id", "url")
    val a = WebCurate.domainCap(d, "url", "id", cap = 10)
    assert(a.filter(col("url").contains("hot.com")).count() == 10L)
    assert(a.filter(col("url").contains("cold.org")).count() == 5L)
    val b = WebCurate.domainCap(d.repartition(7), "url", "id", cap = 10)
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq)
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-domain cap must plan as bounded group limit:\n$plan")
  }

  test("blocklistFilter drops blocked registrable domains only") {
    val docs = Seq(
      (1L, "https://spam.site.com/x"), (2L, "https://ok.org/y"),
      (3L, "https://sub.site.com/z")).toDF("id", "url")
    val blocked = Seq("site.com").toDF("domain")
    val kept = WebCurate.blocklistFilter(docs, "url", blocked)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
    val plan = WebCurate.blocklistFilter(docs, "url", blocked)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
