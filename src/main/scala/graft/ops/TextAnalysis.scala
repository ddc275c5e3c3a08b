package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All of these are single-pass, narrow (no shuffle), codegen'd
  * column expressions — at 100 TB they run at scan speed and the
  * only cost is the parquet read of the `text` column. None of them
  * require a UDF.
  */
object TextAnalysis {

  /** Whitespace-token count. `\S+` match count (not split) so that
    * leading/trailing whitespace and the empty string behave
    * identically in every engine. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: runs of letters, runs of digits, or a
    * single non-space symbol — a cheap deterministic proxy for a
    * real tokenizer's token count. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      lit(0)))

  /** Ratio of alphabetic chars to total length (0 for empty). */
  def alphaRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0)
      .otherwise(size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0)))
        .cast("double") / len)
  }

  /** Ratio of punctuation chars to total length (0 for empty). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0)
      .otherwise(size(regexp_extract_all(text,
        lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0))).cast("double") / len)
  }

  private val StopwordsEn = Seq("the", "of", "and", "to", "in", "is",
    "that", "it", "was", "for", "on", "with", "as", "at", "by")

  /** Fraction of tokens that are common English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    val stops = filter(toks, t => t.isin(StopwordsEn: _*))
    when(size(toks) === 0, 0.0)
      .otherwise(size(stops).cast("double") / size(toks))
  }

  /** Mean token length (0 for empty text). */
  def meanTokenLen(text: Column): Column = {
    val toks = regexp_extract_all(text, lit("\\S+"), lit(0))
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L),
        (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite document-quality score in [0,1] — the C4/Gopher-style
    * heuristic family: favor mid-length docs with high alpha ratio,
    * some stopwords, sane mean word length, low punctuation excess.
    * Weights are fixed so the score is a stable, comparable quantity
    * across runs. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Unrounded quality score. The exact IEEE-754 evaluation order is
    * part of the contract (left-assoc sum of the four weighted
    * terms), so any engine that evaluates the same expression over
    * the same doubles reproduces it bit-for-bit — this is what the
    * DuckDB oracle for q17 relies on. */
  def qualityScoreRaw(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / lit(50.0), lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 4.0, lit(1.0))
    val mtl = meanTokenLen(text)
    val wordShape = when(mtl >= 3.0 && mtl <= 10.0, 1.0).otherwise(0.5)
    lengthScore * 0.3 + alpha * 0.3 + stop * 0.2 + wordShape * 0.2
  }

  /** Stable 128-bit document fingerprint over normalized text
    * (lowercase, whitespace collapsed) — exact-dup key that survives
    * trivial reformatting. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "was", "that", "with", "this", "have"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "para"),
    "it" -> Seq("il", "di", "che", "per", "una", "sono", "con", "non"))

  /** Heuristic language ID: score each language by its marker-word
    * hit count over the document's tokens; ties break by language
    * order (en first). Emits "und" when nothing matches.
    *
    * Pure expression tree (array intersect over a lowercased token
    * array) — no shuffle, no UDF; scan-speed at 100 TB.
    */
  def langId(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-zà-ÿ]+"), lit(0))
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // reduce to the max-hits language, first-listed wins ties
    val best = scored.reduce((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") <= 0, "und").otherwise(best.getField("lang"))
  }

  /** Attach the full analysis column set. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("alpha_ratio", round(alphaRatio(t), 6))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("lang_pred", langId(t))
  }
}
