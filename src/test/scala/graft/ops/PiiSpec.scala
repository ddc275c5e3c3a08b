package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII detection/redaction: detector precision on crafted texts,
  * Luhn verification (valid/invalid/malformed), redaction leaves no
  * residual matches, null passthrough, SQL surface. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "mail a.b+c@ex-1.com and X@Y.ORG, ip 10.0.0.1 " +
      "but not 999.1.1.1, ssn 123-45-6789"),
    (2L, "card 4111 1111 1111 1111 ok, 4111 1111 1111 1112 bad, " +
      "call +1 650-555-0100"),
    (3L, "clean text, just numbers 123456 and v1.2.3"),
    (4L, null.asInstanceOf[String]))

  test("piiCounts: per-class counts with Luhn-verified cards") {
    val got = Pii.piiCounts(texts.toDF("id", "text"), "id", "text")
      .orderBy(col("id"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got(0) == ((1L, 2L, 1L, 1L, 0L, 0L, 0L)), s"${got(0)}")
    // doc 2: two card candidates, ONE Luhn-valid; one +phone
    assert(got(1) == ((2L, 0L, 0L, 0L, 1L, 2L, 1L)), s"${got(1)}")
    assert(got(2) == ((3L, 0L, 0L, 0L, 0L, 0L, 0L)), s"${got(2)}")
    assert(got(3) == ((4L, 0L, 0L, 0L, 0L, 0L, 0L)), s"${got(3)}")
  }

  test("luhnCheck: valid, off-by-one invalid, malformed, lengths") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(Pii.luhnCheck(u("4111111111111111")))
    assert(Pii.luhnCheck(u("4111 1111 1111 1111")))
    assert(Pii.luhnCheck(u("4111-1111-1111-1111")))
    assert(!Pii.luhnCheck(u("4111111111111112")))
    assert(!Pii.luhnCheck(u("4111x11111111111")))  // stray char
    assert(!Pii.luhnCheck(u("22")))                // too short
    assert(!Pii.luhnCheck(u("")))
  }

  test("redact: no residual detector matches, placeholders present, " +
      "null stays null") {
    val red = texts.toDF("id", "text")
      .select(col("id"), Pii.redact(col("text")).as("r"))
      .orderBy(col("id")).as[(Long, Option[String])].collect()
    val r1 = red(0)._2.get
    assert(r1.contains("<EMAIL>") && r1.contains("<IP>") &&
      r1.contains("<SSN>"))
    assert(!r1.contains("@") && !r1.contains("123-45-6789"))
    assert(r1.contains("999.1.1.1"), "non-PII must survive")
    val r2 = red(1)._2.get
    assert(r2.contains("<CARD>") && r2.contains("<PHONE>"))
    assert(red(3)._2.isEmpty, "null text stays null")
    // residual scan: re-running the detectors on redacted text finds 0
    val residual = Pii.piiCounts(
        texts.toDF("id", "text")
          .select(col("id"), Pii.redact(col("text")).as("text")),
        "id", "text")
      .agg(sum(col("n_email") + col("n_ipv4") + col("n_ssn") +
        col("n_phone") + col("n_card_cand"))).head().getLong(0)
    assert(residual == 0L, s"redaction left $residual matches")
  }

  test("piiProfile rolls up the ship/no-ship summary") {
    val p = Pii.piiProfile(texts.toDF("id", "text"), "id", "text").head()
    assert(p.getLong(0) == 4L)     // n_docs
    assert(p.getLong(1) == 1L)     // docs_email
    assert(p.getLong(2) == 2L)     // total_email
    assert(p.getLong(7) == 1L)     // docs_card (Luhn-verified)
  }

  test("graft_luhn_valid SQL function") {
    graft.functions.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_luhn_valid('4111 1111 1111 1111'), " +
        "graft_luhn_valid('4111 1111 1111 1112')").head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
