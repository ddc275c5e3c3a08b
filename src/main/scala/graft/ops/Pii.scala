package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass every
  * training-data pipeline runs before a corpus ships (beyond the
  * reference, which stops at columnar scan/filter: the same mandate
  * as the quality/dedup families).
  *
  * Detectors are CONSERVATIVE REGEXES chosen for cross-engine
  * equality (identical semantics under Java regex and RE2, so the
  * DuckDB oracles run the same patterns verbatim): explicit `[0-9]`
  * classes, no lookarounds, no lazy quantifiers, `\b` anchors only.
  * Precision notes per class are on [[Patterns]]; a production
  * deployment tunes patterns per corpus — the OPERATOR contract here
  * is (a) detection at scan speed inside whole-stage codegen (plain
  * `regexp_*` functions — no UDF), (b) candidate verification where
  * a checksum exists (card numbers: the Luhn mod-10 test as a
  * codegen'd [[LuhnValid]] expression), (c) redaction as a pure
  * column transform whose output provably contains no residual
  * matches (spec + oracle).
  *
  * Scale shape: one pass over the text column per call — counts are
  * `size(regexp_extract_all(...))` projections (no explode, no
  * shuffle); redaction is a `regexp_replace` chain; the Luhn
  * verification explodes ONLY card-candidate matches (rare by
  * construction), so the exchange is candidate-sized, never
  * corpus-text-sized. */
object Pii {

  /** Luhn mod-10 over a candidate string (separators ` `/`-`
    * ignored): doubled-alternate digit sum divisible by 10. Static,
    * codegen-callable ([[LuhnValid]]). Returns false for anything
    * that is not 12-19 digits after stripping — a validator, not a
    * parser, so malformed candidates are simply invalid. */
  def luhnCheck(s: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val str = s.toString
    var sum = 0
    var alt = false
    var digits = 0
    var i = str.length - 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
        digits += 1
      } else if (c != ' ' && c != '-') return false
      i -= 1
    }
    digits >= 12 && digits <= 19 && sum % 10 == 0
  }

  /** Detector regexes (Java ∩ RE2 semantics, oracle-verbatim). */
  object Patterns {
    /** user@host.tld — the practical transport form; does not chase
      * RFC 5322 edge cases (quoted locals, IP literals). */
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    /** Dotted-quad IPv4 with exact 0-255 octets, word-bounded. */
    val ipv4 = "\\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(?:\\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b"
    /** US-SSN shape ddd-dd-dddd (shape only — no area validation). */
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    /** 13-19 digits with optional single space/dash separators — a
      * CANDIDATE only; [[LuhnValid]] verifies. Overlaps SSN/IP shapes
      * are impossible (those contain non-card separators). */
    val cardCandidate = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"
    /** International-ish phone: +CC then 8-14 digits with separators.
      * Deliberately requires the leading + (bare digit runs are too
      * ambiguous against ids/quantities to count as PII here). */
    val phone = "\\+[0-9]{1,3}[ -]?[0-9](?:[ -]?[0-9]){6,12}\\b"
  }

  /** Per-document PII counts, one scan: emails, IPv4s, SSN-shaped
    * ids, +international phones, card candidates, and Luhn-VERIFIED
    * cards. Output: (idCol, n_email, n_ipv4, n_ssn, n_phone,
    * n_card_cand, n_card_luhn). */
  def piiCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    // group 0 = whole match (the default group 1 would error on the
    // non-capturing detector patterns)
    def n(p: String): Column =
      size(regexp_extract_all(t, lit(p), lit(0))).cast("long")
    val cands = regexp_extract_all(t, lit(Patterns.cardCandidate), lit(0))
    df.select(col(idCol),
      n(Patterns.email).as("n_email"),
      n(Patterns.ipv4).as("n_ipv4"),
      n(Patterns.ssn).as("n_ssn"),
      n(Patterns.phone).as("n_phone"),
      size(cands).cast("long").as("n_card_cand"),
      size(filter(cands, c =>
        graft.functions.GraftFunctions.luhnValid(c)))
        .cast("long").as("n_card_luhn"))
  }

  /** Redact every detector match with its class placeholder —
    * `<EMAIL>`, `<IP>`, `<SSN>`, `<PHONE>`, `<CARD>` — longest/most
    * specific classes first so a card number is never half-eaten by
    * the phone pattern. Card candidates redact WITHOUT the Luhn test
    * (redaction errs on the safe side; counting is where precision
    * matters). Null text stays null. */
  def redact(text: Column): Column = {
    val steps = Seq(
      Patterns.email -> "<EMAIL>",
      Patterns.cardCandidate -> "<CARD>",
      Patterns.ssn -> "<SSN>",
      Patterns.ipv4 -> "<IP>",
      Patterns.phone -> "<PHONE>")
    steps.foldLeft(text) { case (c, (p, tag)) =>
      regexp_replace(c, lit(p), lit(tag)) }
  }

  /** Corpus rollup: documents carrying each PII class, total
    * occurrences — the ship/no-ship compliance summary. */
  // (LuhnValid the Expression lives below Pii so the object stays
  // the single import surface)
  def piiProfile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    piiCounts(df, idCol, textCol).agg(
      count(lit(1)).as("n_docs"),
      sum((col("n_email") > 0).cast("long")).as("docs_email"),
      sum(col("n_email")).as("total_email"),
      sum((col("n_ipv4") > 0).cast("long")).as("docs_ipv4"),
      sum(col("n_ipv4")).as("total_ipv4"),
      sum((col("n_ssn") > 0).cast("long")).as("docs_ssn"),
      sum((col("n_phone") > 0).cast("long")).as("docs_phone"),
      sum((col("n_card_luhn") > 0).cast("long")).as("docs_card"))
}

/** `luhn_valid(str)` → boolean: Luhn mod-10 card-number check with
  * ` `/`-` separators tolerated (see [[Pii.luhnCheck]]). Codegen'd
  * static call — stays inside whole-stage codegen next to the
  * `regexp_extract_all` it filters. */
case class LuhnValid(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BooleanType, DataType}
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    Pii.luhnCheck(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.Pii.luhnCheck($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "luhn_valid"
}
