package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation — the URL layer of a C4-style cleaning
  * pipeline (beyond the reference, same mandate as the PII/quality
  * families): host extraction, URL normalization for exact URL-level
  * dedup, registrable-domain grouping, per-domain caps and domain
  * blocklists. Everything is built from `regexp_*`/`split` column
  * functions (codegen'd, scan speed, oracle-replayable in SQL) — no
  * UDF, no java.net.URI (whose parsing both diverges from RFC 3986
  * on real-world URLs and is unavailable to a SQL oracle).
  *
  * Registrable domain uses the LAST-TWO-LABELS heuristic plus an
  * embedded table of common two-level public suffixes (`co.uk`,
  * `com.au`, …). This is deliberately NOT the full Mozilla Public
  * Suffix List: the PSL is versioned external data that belongs in a
  * maintained table joined at runtime ([[blocklistFilter]] shows the
  * join shape); the embedded subset keeps the zero-dependency
  * operator deterministic and covers the overwhelming share of web
  * corpora. Unknown multi-level suffixes degrade to last-two-labels
  * — a GROUPING key approximation, never a correctness hazard.
  *
  * Scale shape: per-row column expressions throughout;
  * [[domainStats]] is one hash agg plus a broadcast one-row total;
  * [[domainCap]] ranks inside each domain by a seeded md5 permutation
  * (filter directly on `row_number` → Spark plans WindowGroupLimit:
  * per-partition bounded heaps, no full per-domain sort);
  * [[blocklistFilter]] broadcast-anti-joins a domain-count-sized
  * list. */
object WebCurate {

  /** Lowercased host of `url` (scheme-qualified URLs; userinfo
    * skipped, port excluded). Null/invalid → empty string. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(coalesce(url, lit("")),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Two-level public suffixes recognized by [[registrableDomain]]
    * (common subset; see object doc for the full-PSL stance). */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.sg", "com.tr", "co.za", "com.ar", "co.nz")

  /** Registrable domain of a (lowercased) host: last two labels, or
    * last three when the trailing two are a known two-level suffix.
    * Hosts with ≤ 2 labels pass through. */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val lastTwo = concat_ws(".",
      element_at(parts, -2), element_at(parts, -1))
    when(size(parts) <= 2, host)
      .when(lastTwo.isin(twoLevelSuffixes: _*),
        concat_ws(".", element_at(parts, -3), lastTwo))
      .otherwise(lastTwo)
  }

  /** Canonical URL for exact URL-level dedup: lowercase scheme and
    * host, drop userinfo, strip the scheme's default port (:80 for
    * http, :443 for https), drop the fragment, drop a bare trailing
    * `?`. Path and query are preserved byte-for-byte (case matters
    * there). Non-URL strings normalize to themselves minus fragment
    * — garbage in, stable garbage out (a dedup key, not a
    * validator). */
  def normalizeUrl(url: Column): Column = {
    val u0 = regexp_replace(coalesce(url, lit("")), "#.*$", "")
    val u = regexp_replace(u0, "\\?$", "")
    val scheme = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val hostPort = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]*)", 1)
    val rest = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*(.*)$", 1)
    val hp = lower(hostPort)
    val hpStripped =
      when(lower(scheme) === "http", regexp_replace(hp, ":80$", ""))
        .when(lower(scheme) === "https", regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    when(scheme === "", u)
      .otherwise(concat(lower(scheme), lit("://"), hpStripped, rest))
  }

  /** Per-registrable-domain corpus stats: document count and corpus
    * share in ppm (integer-exact: `n·10⁶ div total`). One hash agg;
    * the total rides a broadcast one-row cross join. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val dom = df.select(
      registrableDomain(urlHost(col(urlCol))).as("domain"))
    val counts = dom.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(
      coalesce(sum(col("n_docs")), lit(0L)).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"),
        expr("(n_docs * 1000000) div __total").as("share_ppm"))
  }

  /** Keep at most `cap` documents per registrable domain, chosen by
    * a seeded md5 permutation (deterministic, engine-reproducible —
    * the C4-style anti-monoculture cap). Ties cannot occur: the id
    * rides the hash AND the order. Plans as WindowGroupLimit (filter
    * directly on row_number), so no domain — however hot — funnels
    * through a full sort. */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
      cap: Int, seed: Long = 0): DataFrame = {
    require(cap > 0, s"cap must be positive (got $cap)")
    val dom = registrableDomain(urlHost(col(urlCol)))
    val rank = substring(md5(concat(lit(s"$seed:cap:"), dom, lit(":"),
      col(idCol).cast("string"))), 1, 16)
    df.withColumn("__dom", dom)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__dom"))
          .orderBy(rank, col(idCol))))
      .filter(col("__rk") <= cap)
      .drop("__dom", "__rk")
  }

  /** Drop documents whose registrable domain appears in `blocked`
    * (one `domain` column — a maintained blocklist/PSL-style table).
    * Broadcast anti-join: the blocklist is domain-count-sized. */
  def blocklistFilter(df: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val b = broadcast(blocked.select(col("domain").as("__bd")).distinct())
    df.join(b,
        registrableDomain(urlHost(col(urlCol))) === col("__bd"),
        "left_anti")
  }
}
