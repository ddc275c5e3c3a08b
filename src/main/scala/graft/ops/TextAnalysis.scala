package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All of these are single-pass, narrow (no shuffle) column
  * expressions — at 100 TB they run at scan speed and the only cost
  * is the parquet read of the `text` column. None of them require a
  * UDF.
  *
  * Performance doctrine (the r2 lesson, measured 6.5×): Spark's
  * higher-order array functions (`filter`/`aggregate`/`transform`
  * with lambdas) are interpreted — no codegen, no common-
  * subexpression elimination — so (a) counts are computed with
  * codegen'd `regexp_count`/`regexp_replace` length arithmetic
  * instead of materializing char/token arrays, and (b) where a token
  * *array* is genuinely needed (stopword filter, langid scoring) it
  * is materialized once behind a projection boundary and every
  * consumer references the materialized column.
  */
object TextAnalysis {

  /** Whitespace-token count. Match count (not split) so that
    * leading/trailing whitespace and the empty string behave
    * identically in every engine. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** BPE-ish subword count: runs of letters, runs of digits, or a
    * single non-space symbol — a cheap deterministic proxy for a
    * real tokenizer's token count. */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Count of chars matching a single-char regex class, via length
    * difference (no per-char array materialization). */
  private def charClassCount(text: Column, cls: String): Column =
    length(text) - length(regexp_replace(text, cls, ""))

  /** Ratio of alphabetic chars to total length (0 for empty). */
  def alphaRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0)
      .otherwise(charClassCount(text, "[A-Za-z]").cast("double") / len)
  }

  /** Ratio of punctuation chars to total length (0 for empty). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0)
      .otherwise(charClassCount(text, "[.,;:!?'\"()\\[\\]{}-]")
        .cast("double") / len)
  }

  private val StopwordsEn = Seq("the", "of", "and", "to", "in", "is",
    "that", "it", "was", "for", "on", "with", "as", "at", "by")

  /** Lowercase alpha-token array (stopword tokenization). */
  def alphaTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Tokenizer selector for the BPE / span-removal / chunk family —
    * the same opt-in contract as [[graft.ops.NearDedup.tokens]]:
    * `false` keeps the historical ASCII `[a-z]+` tokenizer, `true`
    * switches to [[unicodeTokens]] (`[\p{L}\p{N}]+` over
    * [[simpleLower]]), without which CJK/Cyrillic/Arabic text
    * tokenizes to NOTHING and tokenizer training, token budgets,
    * span removal and chunking silently no-op on it (the q97
    * failure mode, r8 verdict #1). Only the token alphabet changes;
    * every downstream kernel is alphabet-agnostic. */
  def alphaTokens(text: Column, unicode: Boolean): Column =
    if (unicode) unicodeTokens(text) else alphaTokens(text)

  /** Codepoint-wise Unicode SIMPLE lowercase ([[SimpleLower]],
    * codegen'd) — NOT Spark's `lower()`: Java's `String.toLowerCase`
    * applies the FULL case mapping (word-final Σ→ς, İ→i+combining
    * dot) while DuckDB's utf8proc applies the simple per-codepoint
    * map (Σ→σ, İ→i), so `lower()` silently breaks cross-engine
    * tokenization parity on Greek or Turkish text; the simple map
    * (`Character.toLowerCase` per codepoint, locale-free) matches
    * utf8proc exactly — verified on final-sigma, İ, ß, titlecase ǅ
    * and iota-subscript ᾈ. */
  def simpleLower(text: Column): Column =
    graft.functions.GraftFunctions.column(SimpleLower(
      graft.functions.GraftFunctions.expr(text)))

  /** Lowercase UNICODE letter/number token array — the multilingual
    * tokenizer: `[a-z0-9]+`-class tokenizers silently tokenize
    * CJK/Cyrillic/Arabic/Greek text to NOTHING, so token stats,
    * shingles, dedup and familiarity no-op on the majority of a real
    * multilingual crawl (r7 advice). Runs of Unicode letters+digits
    * (`\p{L}\p{N}` categories) form one token; this is character-
    * CLASS tokenization, not word segmentation — an unspaced CJK
    * sentence is one token (shingle/dedup semantics stay valid, the
    * unit is just coarser; plug a segmenter upstream when CJK word
    * granularity matters).
    *
    * Cross-engine parity (the oracle contract): Java regex and
    * DuckDB's RE2 both support the `[\p{L}\p{N}]+` class — write it
    * in a DuckDB STANDARD string (no backslash processing:
    * '[\p{L}\p{N}]+') — and case normalization is [[simpleLower]],
    * the per-codepoint simple map both engines agree on (Spark's
    * `lower()` does NOT — see [[simpleLower]]). Proven by the q97
    * oracle row over injected Cyrillic/CJK/Arabic/Greek text
    * including the final-sigma and dotted-İ divergence cases. */
  def unicodeTokens(text: Column): Column =
    regexp_extract_all(simpleLower(text), lit("[\\p{L}\\p{N}]+"), lit(0))

  /** Stopword fraction (with multiplicity) from a *materialized*
    * alpha-token array — see class doc on HOF materialization. */
  def stopwordRatioOfTokens(ltoks: Column): Column = {
    val stops = filter(ltoks, t => t.isin(StopwordsEn: _*))
    when(size(ltoks) === 0, 0.0)
      .otherwise(size(stops).cast("double") / size(ltoks))
  }

  /** Fraction of tokens that are common English stopwords.
    * Column-expression form — fine standalone; inside a larger
    * expression prefer [[qualityDF]] (tokenizes once). */
  def stopwordRatio(text: Column): Column =
    stopwordRatioOfTokens(alphaTokens(text))

  /** Sum of whitespace-token lengths == count of non-whitespace
    * chars — computed by length difference, no token array. */
  def tokenLenSum(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** Mean token length (0 for empty text). */
  def meanTokenLen(text: Column): Column = {
    val nTok = tokenCount(text)
    when(nTok === 0, 0.0)
      .otherwise(tokenLenSum(text).cast("double") / nTok)
  }

  /** Composite document-quality score in [0,1] — the C4/Gopher-style
    * heuristic family: favor mid-length docs with high alpha ratio,
    * some stopwords, sane mean word length, low punctuation excess.
    * Weights are fixed so the score is a stable, comparable quantity
    * across runs. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Final quality combine from already-computed metric columns. The
    * exact IEEE-754 evaluation order is part of the contract
    * (left-assoc sum of the four weighted terms), so any engine that
    * evaluates the same expression over the same doubles reproduces
    * it bit-for-bit — this is what the DuckDB oracle for q17 relies
    * on. */
  def qualityCombine(nTok: Column, alpha: Column, stopRatio: Column,
      mtl: Column): Column = {
    val lengthScore = least(nTok.cast("double") / lit(50.0), lit(1.0))
    val stop = least(stopRatio * 4.0, lit(1.0))
    val wordShape = when(mtl >= 3.0 && mtl <= 10.0, 1.0).otherwise(0.5)
    lengthScore * 0.3 + alpha * 0.3 + stop * 0.2 + wordShape * 0.2
  }

  /** Unrounded quality score as one Column expression; on DataFrames
    * prefer [[qualityDF]] (stopword token array materialized once). */
  def qualityScoreRaw(text: Column): Column =
    qualityCombine(tokenCount(text), alphaRatio(text), stopwordRatio(text),
      meanTokenLen(text))

  /** Scale-safe quality scoring: scalar metrics are codegen'd count
    * expressions; the one genuine array (stopword tokens) is
    * materialized behind a projection boundary and its filter runs
    * once. Adds `qualityCol` (unrounded double) and `stopCol`. */
  def qualityDF(df: DataFrame, textCol: String,
      qualityCol: String = "quality_raw",
      stopCol: String = "stopword_ratio"): DataFrame = {
    val keep = df.columns.map(col).toSeq
    val t = col(textCol)
    val staged = df.select(keep ++ Seq(
      alphaTokens(t).as("__ltoks"),
      tokenCount(t).as("__ntok"),
      alphaRatio(t).as("__alpha"),
      tokenLenSum(t).as("__sumlen")): _*)
    val metrics = staged.select(keep ++ Seq(
      col("__ntok"),
      col("__alpha"),
      stopwordRatioOfTokens(col("__ltoks")).as("__stop"),
      when(col("__ntok") === 0, 0.0)
        .otherwise(col("__sumlen").cast("double") / col("__ntok"))
        .as("__mtl")): _*)
    metrics.select(keep ++ Seq(
      qualityCombine(col("__ntok"), col("__alpha"), col("__stop"),
        col("__mtl")).as(qualityCol),
      col("__stop").as(stopCol)): _*)
  }

  /** Stable 128-bit document fingerprint over normalized text
    * (lowercase, whitespace collapsed) — exact-dup key that survives
    * trivial reformatting. */
  /** Built-in scrub patterns for the usual PII shapes in crawled
    * text. Pure regex heuristics (the honest contract of regex PII
    * scrubbing — a recall/precision trade, not a guarantee); each is
    * RE2-compatible so the DuckDB oracle and any other engine apply
    * the identical automaton. Order matters: specific before general
    * (credit-card before phone — both are digit runs). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // email
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
    // ipv4
    ("""\b(?:\d{1,3}\.){3}\d{1,3}\b""", "[IP]"),
    // 13-16 digit card-ish runs (with optional space/dash groups)
    ("""\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b""", "[CARD]"),
    // ssn-shaped
    ("""\b\d{3}-\d{2}-\d{4}\b""", "[SSN]"),
    // phone-ish: 7+ digits with separators/parens, optional +cc
    ("""(?:\+\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}[ .-]?\d{0,4}\b""",
      "[PHONE]"))

  /** Apply `patterns` (regex → replacement) in order — scan-speed
    * masking for PII scrubbing or domain token suppression. All
    * occurrences replaced (Spark regexp_replace semantics; the
    * DuckDB mirror needs the 'g' flag). */
  def redact(text: Column, patterns: Seq[(String, String)] = PiiPatterns): Column =
    patterns.foldLeft(text) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Number of masks [[redact]] inserts — each pattern counted on
    * the text AFTER the preceding patterns applied, exactly like the
    * sequential replacement (counting every pattern on the original
    * would double-count shapes that overlap, e.g. a card number's
    * digit runs also look phone-ish). */
  def redactionCount(text: Column,
      patterns: Seq[(String, String)] = PiiPatterns): Column =
    patterns.foldLeft((lit(0): Column, text)) {
      case ((n, t), (re, repl)) =>
        (n + regexp_count(t, lit(re)), regexp_replace(t, re, repl))
    }._1

  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Unicode NFC (canonical composition) — see [[NfcNormalize]]. */
  def nfcNormalize(text: Column): Column =
    graft.functions.GraftFunctions.column(NfcNormalize(
      graft.functions.GraftFunctions.expr(text)))

  /** NFC-aware exact-dedup fingerprint: canonical composition, then
    * SIMPLE lowercase (the [[simpleLower]] cross-engine parity map —
    * plain `lower` would diverge from DuckDB on ς/İ), then the
    * [[fingerprint]] whitespace collapse. Use over [[fingerprint]]
    * when the corpus mixes precomposed and combining-mark spellings
    * (any real multilingual crawl): those spell the same text and
    * must land in the same dedup group. Kept separate from
    * [[fingerprint]] so existing ASCII-fixture oracles (q09/q10)
    * stay byte-stable. */
  def fingerprintNfc(text: Column): Column =
    md5(regexp_replace(trim(simpleLower(nfcNormalize(text))), "\\s+", " "))

  /** Winnowing rolling-hash fingerprint SET (sorted distinct longs):
    * robust copy detection — any shared substring of length ≥
    * w + k − 1 between two documents guarantees a common
    * fingerprint, and edits far from a region leave its fingerprints
    * unchanged (one whole-doc hash has neither property). Codegen'd
    * one-pass [[graft.codecs.WinnowFingerprint]] (monotonic-deque
    * sliding minimum); md5-derived gram hashes, so the oracle
    * reproduces the set exactly. Input is lowercased here. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.GraftFunctions.column(graft.codecs.WinnowFingerprint(
      graft.functions.GraftFunctions.expr(lower(text)), k, w))

  // ---- corpus term statistics (TF / DF / top terms) ----

  /** (id, term, tf): per-document alpha-token frequencies. The token
    * array is materialized behind a projection boundary and exploded
    * as a plain column reference (a Generate over the building
    * expression would re-evaluate it per output element — the r3
    * lesson), then one hash agg on (id, term) with map-side partial
    * combine. */
  def termCounts(df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame =
    df.select(col(idCol), alphaTokens(col(textCol), unicode).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** (term, df): corpus document frequency — in how many documents
    * each distinct term appears. [[termCounts]] rows are already
    * distinct per (doc, term), so this is one shuffle agg on term. */
  def docFrequency(tc: DataFrame): DataFrame =
    tc.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Unigram-LM (SentencePiece-style) document encode — every token
    * Viterbi-segmented under the integer-cost vocabulary
    * ([[UnigramSegmentTokens]] semantics and tie-breaks), pieces in
    * token order plus the exact piece budget. The BPE family's
    * sibling: same one-codegen-pass scale shape as
    * [[bpeEncode]] (zero joins/shuffles — encode output is
    * piece-stream-sized however organized).
    *
    * Output: (idCol, pieces array<string>, n_pieces). */
  def unigramEncode(df: DataFrame, idCol: String, textCol: String,
      pieces: Seq[(String, Long)], unkCost: Long,
      unicode: Boolean = false): DataFrame = {
    val kernel = graft.functions.GraftFunctions.column(
      UnigramSegmentTokens(
        graft.functions.GraftFunctions.expr(
          alphaTokens(coalesce(col(textCol), lit("")), unicode)),
        pieces, unkCost))
    df.select(col(idCol), kernel.as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }

  /** Load a persisted unigram vocabulary (piece, cost) into the
    * literal form [[unigramEncode]] bakes into the kernel — the
    * [[mergesFromDF]] counterpart for the unigram family. Bounded
    * by `maxPieces` (vocabularies are bounded by construction; the
    * guard catches a mis-joined frame). */
  def unigramVocabFromDF(vocab: DataFrame, pieceCol: String,
      costCol: String, maxPieces: Int = 2000000): Seq[(String, Long)] = {
    val rows = vocab
      .select(col(pieceCol).cast("string"), col(costCol).cast("long"))
      .filter(col(pieceCol).isNotNull && col(costCol).isNotNull)
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"vocabulary exceeds maxPieces=$maxPieces")
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Per-term burstiness moments — the keyword-spam / topicality
    * screen: for every term (above a document-frequency floor) the
    * moments of its per-document counts (df, Σtf, Σtf²), from which
    * the Fano factor var/mean — ~1 for Poisson-scattered function
    * words, ≫1 for bursty topical terms, extreme for SEO keyword
    * stuffing — is one float division away (moments, not floats,
    * cross the oracle: the q165 doctrine). Church & Gale 1995's
    * burstiness, as shard-addable integers.
    *
    * `max_tf` rides along: a single document repeating one term
    * thousands of times is the stuffing signature even when the
    * corpus-wide moments look tame.
    *
    * Scale shape: one token explode → (term, doc) tf agg (the
    * termCounts exchange floor), then a term-keyed moment rollup;
    * `minDf` prunes the hapax tail BEFORE the output (the exchange
    * already happened — the floor of any exact per-term statistic).
    * Output: (term, df, sum_tf, sum_tf_sq, max_tf). */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, unicode: Boolean = false): DataFrame =
    termCounts(df, idCol, textCol, unicode)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("sum_tf"),
        expr("CAST(sum(CAST(tf AS DECIMAL(38,0)) * tf) AS BIGINT)")
          .as("sum_tf_sq"),
        max(col("tf")).as("max_tf"))
      .filter(col("df") >= minDf)

  /** Mixed-script (homoglyph) token audit — the spoofing screen a
    * crawl pipeline runs before trusting URLs, brand mentions or
    * dedup keys: a single token mixing Latin with Cyrillic/Greek
    * letters ("pаypаl" with U+0430) is the confusable-attack
    * signature (Unicode TR#39 skeleton class), and it also breaks
    * exact dedup by splitting visually-identical strings. Per doc:
    * token count, Latin∩Cyrillic mixed tokens (the classic spoof
    * pair), and tokens mixing any two of Latin/Cyrillic/Greek.
    *
    * Scale shape: ZERO shuffles — the token array is filtered
    * per-row with script-class regex flags (Java `\p{IsXxx}` == RE2
    * `\p{Xxx}`, the q106 parity), one scan, output one row per doc.
    * Counts are of token OCCURRENCES (a repeated spoof counts each
    * time — it is a per-document risk mass, not a vocabulary). */
  def mixedScriptTokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lat = "\\\\p{IsLatin}"
    val cyr = "\\\\p{IsCyrillic}"
    val grk = "\\\\p{IsGreek}"
    df.select(col(idCol),
        unicodeTokens(coalesce(col(textCol), lit(""))).as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        expr(s"CAST(size(filter(__toks, t -> t RLIKE '$lat'" +
          s" AND t RLIKE '$cyr')) AS BIGINT)").as("n_lat_cyr"),
        expr("CAST(size(filter(__toks, t ->" +
          s" (CASE WHEN t RLIKE '$lat' THEN 1 ELSE 0 END)" +
          s" + (CASE WHEN t RLIKE '$cyr' THEN 1 ELSE 0 END)" +
          s" + (CASE WHEN t RLIKE '$grk' THEN 1 ELSE 0 END) >= 2))" +
          " AS BIGINT)").as("n_mixed_any"))
  }

  /** Zipf rank-frequency profile by frequency OCTAVE — the corpus
    * health curve read before trusting token statistics: how many
    * word types and how much token mass sit at each power-of-two
    * frequency band. A natural corpus shows type counts decaying
    * smoothly across octaves (Zipf); boilerplate-heavy or
    * template-generated corpora spike in high octaves, OCR noise
    * fattens octave 0 (hapax legomena). This is the log-log Zipf
    * slope read without logs: octave = floor(log2(freq)) computed
    * integer-exactly via the bin()-length trick (the q176/HLL
    * parity), so the table reproduces bit-for-bit on any engine.
    *
    * Scale shape: one token explode → term-keyed count (map-side
    * combined, vocabulary-sized exchange — the exchange floor of any
    * exact frequency profile), then a ≤ ~40-row octave rollup.
    *
    * Output: (octave, freq_lo, n_types, sum_tokens, type_share_ppm,
    * token_share_ppm), octave ascending. */
  def zipfOctaves(df: DataFrame, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val freqs = df
      .select(explode(alphaTokens(col(textCol), unicode)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("__n"))
    val oct = freqs
      .withColumn("octave", (length(bin(col("__n"))) - 1).cast("long"))
      .groupBy(col("octave"))
      .agg(count(lit(1)).as("n_types"), sum(col("__n")).as("sum_tokens"))
    oct.crossJoin(broadcast(oct.agg(
        sum(col("n_types")).as("__tt"), sum(col("sum_tokens")).as("__tk"))))
      .select(col("octave"),
        expr("shiftleft(1L, CAST(octave AS INT))").as("freq_lo"),
        col("n_types"), col("sum_tokens"),
        expr("(n_types * 1000000) div __tt").as("type_share_ppm"),
        expr("(sum_tokens * 1000000) div __tk").as("token_share_ppm"))
  }

  /** Term-keyed inverted index: per term its document frequency,
    * corpus frequency, and a bounded posting list — the top-`topK`
    * documents by term frequency as an "id:tf,id:tf" string (tf
    * desc, id asc; a STRING so the row is hash-comparable across
    * engines). `minDf` bounds the output to terms worth indexing.
    *
    * Scale shape: one (term, doc) hash agg off the token explode,
    * then posting selection through [[AnnSearch.rankTopK]]'s
    * two-phase bounded heaps — a stopword's million-document posting
    * set never funnels through a single per-term sort task, the
    * failure mode of the naive `row_number() OVER (PARTITION BY
    * term)` spelling. df/cf aggregate the same exchange
    * (ReusedExchange) and join the postings term-on-term. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 5, minDf: Long = 1L, unicode: Boolean = false): DataFrame = {
    require(topK > 0, s"topK must be positive (got $topK)")
    val tc = termCounts(df, idCol, textCol, unicode)
    val stats = tc.groupBy(col("term")).agg(
      count(lit(1)).as("df_docs"), sum(col("tf")).as("cf"))
      .filter(col("df_docs") >= minDf)
    val post = AnnSearch.rankTopK(
      tc.select(col("term").as("qid"), col(idCol).as("cid"),
        col("tf").as("cos_m")), topK)
      .groupBy(col("qid")).agg(
        array_sort(collect_list(struct(col("rank"), col("cid"), col("cos_m"))))
          .as("__p"))
      .select(col("qid").as("term"),
        concat_ws(",", transform(col("__p"),
          x => concat(x.getField("cid").cast("string"), lit(":"),
            x.getField("cos_m").cast("string")))).as("postings"))
    stats.join(post, Seq("term"))
      .select(col("term"), col("df_docs"), col("cf"), col("postings"))
  }

  /** Per-document top-`k` terms by raw frequency, with each term's
    * corpus document frequency attached — the integer-exact core of
    * TF-IDF keyword ranking. The float idf multiply (ln(N/df)) is
    * deliberately left to the caller: `ln` is libm-dependent and
    * would break cross-engine reproducibility, while (tf, df) carry
    * the same information exactly.
    *
    * Scale shape: explode → two hash aggs (map-side combine) → join
    * on term (the df table is vocabulary-sized — AQE broadcasts it
    * when small enough, else hash join) → per-doc top-k ranking that
    * Spark plans as WindowGroupLimit: each task keeps a local top-k
    * per doc before the shuffle, so the window never materializes a
    * full per-doc sort of the corpus. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, unicode: Boolean = false): DataFrame = {
    require(k > 0)
    val tc = termCounts(df, idCol, textCol, unicode)
    val dfq = docFrequency(tc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tf").desc, col("term"))
    tc.join(dfq, Seq("term"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }

  /** Space-joined adjacent-pair array of an array<string> column
    * (empty below two elements) — the ONE definition of an adjacent
    * pair, shared by [[repetitionStats]], [[bigramFamiliarity]] and
    * [[bpePairCounts]] so the three can never disagree on what a
    * pair is. */
  private def bigramsOfTokens(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))

  /** Within-document n-gram repetition — the Gopher-family
    * repetitiveness quality signal: how much of a document is
    * repeated phrasing. Counts token BIGRAMS with multiplicity and
    * reports, per doc: total bigram occurrences, occurrences beyond
    * each bigram's first (`n_dup`), the max single-bigram repeat, and
    * the duplicate fraction in exact ppm (integer div). Docs with
    * fewer than two alpha tokens have no bigrams and are absent from
    * the output (join back to the corpus if completeness matters).
    *
    * Scale shape: the bigram array is built in one interpreted pass
    * per row (zip_with over the materialized token array, behind a
    * projection boundary), exploded through the typed flatMap (a
    * Generate over a HOF-built array re-evaluates it per output
    * element — the measured 23× trap), then two hash aggs with
    * map-side combine. Scan-dominated at 100 TB. */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String, unicode: Boolean = false): DataFrame = {
    val staged = df.select(col(idCol),
        alphaTokens(col(textCol), unicode).as("__toks"))
      .select(col(idCol), bigramsOfTokens(col("__toks")).as("__bg"))
    NearDedup.explodeStrings(staged, idCol, "__bg", "__b")
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("n_bigrams"),
        sum(col("__c") - 1).as("n_dup"),
        max(col("__c")).as("max_rep"))
      .withColumn("dup_ppm",
        expr("n_dup * 1000000 div greatest(n_bigrams, 1)"))
  }

  // ---------------------------------------------------------------
  //  Corpus-LM document scoring (CCNet-family quality signal)
  // ---------------------------------------------------------------

  /** Bigram language-model tables from a training corpus:
    * `(uni(w, cu), bi(w1, w2, cb))`. The CCNet recipe (Wenzek et
    * al. 2019) trains an LM on a trusted corpus and keeps crawl
    * documents the model finds unsurprising; this is the count
    * layer of that recipe, persistable like a BPE merge list
    * ([[mergesToDF]] pattern) so one training pays for every
    * scoring pass.
    *
    * `uni` is the FULL vocabulary — backoff scoring needs every
    * unigram, and a vocabulary is bounded regardless of corpus
    * size. `bi` keeps bigrams with `cb >= minCount`: pruning is
    * what makes the LM broadcastable at scale, and [[lmScore]]'s
    * backoff makes pruned bigrams score as unseen (the stupid-
    * backoff contract, Brants et al. 2007).
    *
    * Scale shape: the corpus is touched ONCE; both tables are one
    * hash agg with map-side combine (the bigram array is staged
    * behind a projection boundary and exploded through the typed
    * flatMap — the measured 23× Generate-over-HOF trap). */
  def lmTables(train: DataFrame, textCol: String, minCount: Long = 2L,
      unicode: Boolean = false): (DataFrame, DataFrame) = {
    require(minCount >= 1, s"minCount must be positive (got $minCount)")
    val toks = train.select(alphaTokens(col(textCol), unicode).as("__t"))
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val staged = toks.select(lit(0L).as("__z"),
      bigramsOfTokens(col("__t")).as("__bg"))
    val bi = NearDedup.explodeStrings(staged, "__z", "__bg", "__g")
      .groupBy(col("__g")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
      .select(split(col("__g"), " ").getItem(0).as("w1"),
        split(col("__g"), " ").getItem(1).as("w2"), col("cb"))
    (uni, bi)
  }

  /** Score each document by the mean probability its token
    * transitions get under a bigram LM (from [[lmTables]]) — the
    * quality signal CCNet uses to rank crawl text against a
    * trusted corpus, here with stupid backoff: a kept bigram
    * scores `p(w2|w1) = cb/cu(w1)`, anything else backs off to
    * `0.4 · cu(w2)/N`. Repeated boilerplate scores high, text
    * unlike the training corpus scores low.
    *
    * All arithmetic is EXACT integer ppm — `1000000·cb div cu1`
    * and `400000·cu2 div N` (0.4 scales to exactly 400000/10⁶) —
    * so the score is engine-independent and DuckDB-replayable; no
    * float log-prob whose summation order could flip a hash check.
    * Counts must stay below ~9.2e12 for the ppm products to fit a
    * long (the [[repetitionStats]] convention). Output: one row
    * per DISTINCT non-null id (the [[Dedup]]/[[DupSpans]] id
    * contract): `(idCol, n_trans, score_sum, mean_ppm)`; docs with
    * fewer than two tokens score 0 over 0 transitions.
    *
    * Scale shape: the corpus reduces to distinct (doc, transition)
    * pairs with multiplicity — the exchange floor — then joins the
    * LM tables on token keys (AQE broadcasts the pruned `bi` and
    * vocabulary-sized `uni` when they fit; the hash join on token
    * keys is the honest floor when they don't). `N` rides a
    * broadcast cross join of a one-row aggregate. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame, unicode: Boolean = false): DataFrame = {
    val tot = broadcast(uni.agg(sum(col("cu")).as("__N")))
    val nonNull = df.filter(col(idCol).isNotNull)
    val staged = nonNull
      .select(col(idCol), alphaTokens(col(textCol), unicode).as("__t"))
      .select(col(idCol), bigramsOfTokens(col("__t")).as("__bg"))
    val m = NearDedup.explodeStrings(staged, idCol, "__bg", "__g")
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__m"))
      .select(col(idCol),
        split(col("__g"), " ").getItem(0).as("w1"),
        split(col("__g"), " ").getItem(1).as("w2"), col("__m"))
    val scored = m
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("cu").as("__cu1")),
        Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("__cu2")),
        Seq("w2"), "left")
      .crossJoin(tot)
      .withColumn("__p", expr(
        "CASE WHEN cb IS NOT NULL" +
        " THEN 1000000 * cb div greatest(coalesce(__cu1, 1), 1)" +
        " ELSE 400000 * coalesce(__cu2, 0) div greatest(__N, 1) END"))
      .groupBy(col(idCol)).agg(
        sum(col("__m")).as("__nt"),
        sum(col("__m") * col("__p")).as("__sc"))
    nonNull.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nt"), lit(0L)).as("n_trans"),
        coalesce(col("__sc"), lit(0L)).as("score_sum"))
      .withColumn("mean_ppm", expr("score_sum div greatest(n_trans, 1)"))
  }

  /** Self-trained convenience: LM trained on the scored corpus
    * itself — the "how typical of this corpus is each document"
    * reading (outlier detection rather than CCNet's cross-corpus
    * ranking).
    *
    * Scale note: the LM tables are LAZY here, so the corpus backs
    * several aggregations in one job (token counts, bigram counts,
    * transitions, the id universe — Spark's exchange reuse merges
    * only the identical ones). Fine into the TB range; at 100 TB
    * materialize [[lmTables]] once (parquet or cache) and call
    * [[lmScore]] — which is the production CCNet shape regardless,
    * since a trusted LM is trained once and reused across scoring
    * runs. */
  def lmScoreSelfTrained(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L, unicode: Boolean = false): DataFrame = {
    val (uni, bi) = lmTables(df, textCol, minCount, unicode)
    lmScore(df, idCol, textCol, uni, bi, unicode)
  }

  /** Interpolated Kneser–Ney bigram model trained from a corpus —
    * the smoothing the KenLM models in the CCNet recipe actually
    * use (Kneser & Ney 1995; Chen & Goodman 1998 eq. 4.28), vs
    * [[lmScore]]'s stupid backoff:
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + D·N₁₊(w1·)/c(w1·) · N₁₊(·w2)/N₁₊(··)
    *
    * with absolute discount D and continuation counts N₁₊ (how many
    * DISTINCT partners a word has — "Francisco" is frequent but only
    * ever follows "San", so its continuation weight is tiny).
    *
    * Every input to the formula is an exact integer aggregate
    * (bigram counts, distinct-partner counts); the only floats are
    * the final fixed expression over one row's integers — no
    * float SUM whose reduction order could differ between engines —
    * so `p_kn_e9 = floor(1e9·P)` is engine-exact and DuckDB can
    * replay the model bit-for-bit from the same parquet.
    *
    * Scale shape: one corpus pass to bigram counts (map-side
    * combined; the bigram explode rides the typed flatMap, the
    * measured Generate-over-HOF fix), then three vocabulary-bounded
    * aggregations off that table and key joins back onto it — the
    * corpus is never touched again, and the model size is the
    * distinct-bigram count, broadcastable after `minCount` pruning
    * exactly like [[lmTables]]. Output: (w1, w2, c, p_kn_e9).
    * Rows with `c >= minCount` only; the discounted mass shifted to
    * pruned bigrams is the standard backoff regime (callers score
    * unseen pairs by the continuation term alone). */
  def trainKneserNey(train: DataFrame, textCol: String,
      discount: Double = 0.75, minCount: Long = 1L,
      unicode: Boolean = false): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must sit in (0,1), got $discount")
    require(minCount >= 1, s"minCount must be positive (got $minCount)")
    val toks = train.select(alphaTokens(col(textCol), unicode).as("__t"))
    val staged = toks.select(lit(0L).as("__z"),
      bigramsOfTokens(col("__t")).as("__bg"))
    // IMPORTANT: continuation counts are computed BEFORE pruning —
    // they are properties of the full distribution, not of the kept
    // rows.
    val bi = NearDedup.explodeStrings(staged, "__z", "__bg", "__g")
      .groupBy(col("__g")).agg(count(lit(1)).as("c"))
      .select(split(col("__g"), " ").getItem(0).as("w1"),
        split(col("__g"), " ").getItem(1).as("w2"), col("c"))
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("c")).as("__cw1"), count(lit(1)).as("__fw"))
    val bwd = bi.groupBy(col("w2")).agg(count(lit(1)).as("__bw"))
    val tot = bi.agg(count(lit(1)).as("__all"))
    bi.filter(col("c") >= minCount)
      .join(ctx, Seq("w1")).join(bwd, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c"),
        floor(lit(1e9) * ((greatest(col("c") - lit(discount), lit(0.0))
          + lit(discount) * col("__fw") * (col("__bw") / col("__all")))
          / col("__cw1"))).cast("long").as("p_kn_e9"))
  }

  /** Greedy decode under a trained Kneser–Ney model
    * ([[trainKneserNey]] output) — the determinism smoke test every
    * n-gram LM gets: from the heaviest context (max Σc, ties to the
    * lexicographically first word), repeatedly take the argmax
    * transition (ties to the first w2) for `steps` steps. Word-soup
    * models cycle quickly — that IS the expected greedy behaviour.
    *
    * Decoding is inherently sequential, so this is a bounded driver
    * loop (`steps` actions) over the CACHED vocabulary-sized model —
    * each step is one filtered TakeOrdered(1) against the cache,
    * never a corpus touch. Output: (step, w1, w2, p_kn_e9), ending
    * early if a context has no outgoing transition. */
  def knGreedyDecode(model: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 1000,
      s"steps must sit in [1, 1000] (got $steps)")
    val spark = model.sparkSession
    // ONE distributed pass reduces the model to its greedy policy —
    // per context, the argmax transition (min_by over (−p, w2): p
    // desc, then w2 asc — deterministic) plus the context weight.
    // That table is vocabulary-bounded by construction (one row per
    // w1), so collecting it is the same bounded-driver contract as
    // k-means centroids; the walk itself is then pure driver map
    // lookups (greedy decoding is inherently sequential). The old
    // shape paid one cluster action per STEP.
    val policy = model
      .groupBy(col("w1"))
      .agg(sum(col("c")).as("__cw"),
        min_by(struct(col("w2"), col("p_kn_e9")),
          struct((-col("p_kn_e9")).as("a"), col("w2").as("b")))
          .as("__best"))
      .select(col("w1"), col("__cw"), col("__best.w2").as("__w2"),
        col("__best.p_kn_e9").as("__p"))
      .collect()
    val out = scala.collection.mutable.ArrayBuffer[(Long, String,
      String, Long)]()
    if (policy.nonEmpty) {
      val best = policy.map(r =>
        r.getString(0) -> ((r.getString(2), r.getLong(3)))).toMap
      var cur = policy.minBy(r => (-r.getLong(1), r.getString(0)))
        .getString(0)
      var step = 0L
      var dead = false
      while (step < steps && !dead) {
        best.get(cur) match {
          case None => dead = true
          case Some((w2, p)) =>
            out += ((step, cur, w2, p))
            cur = w2
            step += 1
        }
      }
    }
    import spark.implicits._
    out.toSeq.toDF("step", "w1", "w2", "p_kn_e9")
  }

  /** Score documents under a trained Kneser–Ney model
    * ([[trainKneserNey]] output): per doc, the bigram occurrence
    * count, how many of those occurrences the model covers, and the
    * exact integer sum of their `p_kn_e9` — the sufficient
    * statistics for held-out fit (callers derive mean transition
    * probability; an exact-integer alternative to float perplexity,
    * whose `log` differs across libm implementations). Output: one
    * row per distinct non-null id: (idCol, n_bi, n_seen, sum_p_e9).
    *
    * Scale: docs reduce to exploded bigrams (the exchange floor),
    * one key join against the model (broadcast when pruned), one
    * agg back to ids. */
  def knScore(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, unicode: Boolean = false): DataFrame = {
    val staged = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        bigramsOfTokens(alphaTokens(col(textCol), unicode)).as("__bg"))
    val grams = NearDedup.explodeStrings(staged, "__id", "__bg", "__g")
      .select(col("__id"), split(col("__g"), " ").getItem(0).as("w1"),
        split(col("__g"), " ").getItem(1).as("w2"))
    val scored = grams.join(model.select(col("w1"), col("w2"),
        col("p_kn_e9")), Seq("w1", "w2"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bi"),
        sum(when(col("p_kn_e9").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        sum(coalesce(col("p_kn_e9"), lit(0L))).as("sum_p_e9"))
    df.filter(col(idCol).isNotNull).select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        coalesce(col("sum_p_e9"), lit(0L)).as("sum_p_e9"))
  }

  /** Readability component sums per group — the integer sufficient
    * statistics behind Flesch-style scores: sentence count
    * (terminal-punctuation runs `[.!?]+`), word count (`\S+` runs)
    * and syllable surrogate (vowel-group runs `[aeiouy]+`, the
    * standard cheap estimator), summed per group with the two
    * ratios in exact ppm (words/sentence and syllables/word —
    * Flesch is an affine combination of exactly these two, applied
    * caller-side in floats). Groups with zero sentences/words get
    * null ratios rather than a division blow-up. One scan, all
    * codegen'd regexp counting. */
  def readabilityStats(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    df.select(col(groupCol).as("g"),
        regexp_count(t0, lit("[.!?]+")).cast("long").as("__sent"),
        regexp_count(t0, lit("\\S+")).cast("long").as("__w"),
        regexp_count(lower(t0), lit("[aeiouy]+")).cast("long").as("__syl"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__sent")).as("n_sentences"),
        sum(col("__w")).as("n_words"), sum(col("__syl")).as("n_syllables"))
      .withColumn("wps_ppm", expr("CASE WHEN n_sentences > 0 THEN" +
        " (n_words * 1000000) div n_sentences END"))
      .withColumn("spw_ppm", expr("CASE WHEN n_words > 0 THEN" +
        " (n_syllables * 1000000) div n_words END"))
  }

  /** RAKE stopword list (Rose et al. 2010 use a full SMART list;
    * this is the deterministic core subset — callers pass their
    * own for production lexicons). */
  val RakeStopwords: Seq[String] = Seq("the", "a", "an", "and", "or",
    "of", "to", "in", "on", "for", "with", "is", "are", "was", "were",
    "be", "as", "at", "by", "it", "this", "that")

  /** RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010):
    * candidate phrases are the maximal runs between stopwords /
    * non-letter characters; each word scores `deg/freq` where freq
    * counts the word's occurrences inside candidates and deg weights
    * each occurrence by its phrase length (words in longer phrases
    * score higher — the paper's co-occurrence degree); a phrase
    * scores the sum of its member words. All in integer ppm
    * (`1e6·deg div freq`), one flooring point per word, so both
    * engines rank identically with no float in sight.
    *
    * Scale shape: the corpus is tokenized into phrases ONCE and
    * immediately reduced to the distinct-phrase count table
    * (vocabulary-sized — the BPE count-over-the-vocabulary move);
    * word statistics and phrase scores are both derived from that
    * persisted table, so the corpus is never rescanned. Output:
    * (phrase, n_occurrences, n_words, score_ppm), `minCount`
    * pruning on occurrences BEFORE the score join. */
  def rakeKeyphrases(df: DataFrame, textCol: String, minCount: Long = 1L,
      stopwords: Seq[String] = RakeStopwords): DataFrame = {
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z]+")),
      "stopwords must be non-empty lowercase words")
    val stopPat = "\\b(" + stopwords.mkString("|") + ")\\b|[^a-z ]"
    val norm = trim(regexp_replace(col("__p"), " +", " "))
    val pc = df
      .select(explode(split(
        regexp_replace(lower(coalesce(col(textCol), lit(""))),
          stopPat, "|"), "\\|")).as("__p"))
      .select(norm.as("phrase"))
      .filter(col("phrase") =!= "")
      .groupBy(col("phrase")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = pc.select(col("phrase"), col("cnt"),
        size(split(col("phrase"), " ")).cast("long").as("plen"),
        explode(split(col("phrase"), " ")).as("word"))
    val scores = words.groupBy(col("word"))
      .agg(sum(col("cnt")).as("freq"),
        sum(col("cnt") * col("plen")).as("deg"))
      .select(col("word"),
        expr("(deg * 1000000) div freq").as("__wscore"))
    words.filter(col("cnt") >= minCount)
      .join(scores, "word")
      .groupBy(col("phrase"))
      .agg(min(col("cnt")).as("n_occurrences"),
        min(col("plen")).as("n_words"),
        sum(col("__wscore")).as("score_ppm"))
  }

  /** Cross-group vocabulary overlap matrix — for every unordered
    * group pair (corpus slices: languages, sources, snapshots), the
    * exact vocabulary Jaccard in ppm: `1e6·|A∩B| div |A∪B|` with
    * |A∪B| = n_a + n_b − n_common. The corpus-comparison report
    * behind contamination triage ("which crawl sources share
    * vocabulary?") and merge decisions; zero-overlap pairs are kept
    * (the size cross join completes the grid), because "these two
    * slices share NOTHING" is exactly the finding that matters.
    *
    * Scale shape: one tokenize scan reduced to the distinct (group,
    * token) table (vocabulary-sized, persisted across its three
    * uses); the intersection self-join keys on token — a token in g
    * groups fans out g², bounded by the group count squared, never
    * by corpus size — and the final grid is C(groups, 2) rows. */
  def vocabOverlap(df: DataFrame, groupCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val vocab = df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = vocab.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = vocab.select(col("g").as("ga"), col("tok"))
      .join(vocab.select(col("g").as("gb"), col("tok")), "tok")
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("c"))
    sizes.select(col("g").as("lang_a"), col("n").as("n_a"))
      .crossJoin(sizes.select(col("g").as("lang_b"), col("n").as("n_b")))
      .filter(col("lang_a") < col("lang_b"))
      .join(inter, col("lang_a") === col("ga") &&
        col("lang_b") === col("gb"), "left")
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        coalesce(col("c"), lit(0L)).as("n_common"))
      .withColumn("jaccard_ppm",
        expr("(n_common * 1000000) div (n_a + n_b - n_common)"))
  }

  /** Frequency-weighted vocabulary overlap — [[vocabOverlap]]'s
    * weighted sibling (Ioffe 2010's weighted-Jaccard target, exact):
    * `wJ = Σ_t min(cntA(t), cntB(t)) / Σ_t max(cntA(t), cntB(t))`
    * over token COUNT vectors, in exact ppm. Binary Jaccard calls
    * two slices similar when they share a long tail of hapaxes;
    * the weighted form notices that one says "the" a million times
    * and the other doesn't — the distribution-aware corpus
    * similarity. Zero-overlap pairs kept.
    *
    * Scale shape: one tokenize into per-group token counts
    * (vocab-sized, persisted); pair expansion against the broadcast
    * group list; one agg per pair over the union vocabulary —
    * min/max of the two counts computed cell-wise with absent
    * tokens as 0. */
  def vocabOverlapWeighted(df: DataFrame, groupCol: String,
      textCol: String, unicode: Boolean = false): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .groupBy(col("__g"), col("tok")).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = broadcast(counts.select(col("__g").as("__g2")).distinct())
    counts.join(groups, col("__g") =!= col("__g2"))
      .select(least(col("__g"), col("__g2")).as("lang_a"),
        greatest(col("__g"), col("__g2")).as("lang_b"),
        col("__g").as("__side"), col("tok"), col("__n"))
      .groupBy(col("lang_a"), col("lang_b"), col("tok"))
      .agg(sum(when(col("__side") === col("lang_a"), col("__n"))
          .otherwise(lit(0L))).as("__ca"),
        sum(when(col("__side") === col("lang_b"), col("__n"))
          .otherwise(lit(0L))).as("__cb"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(sum(least(col("__ca"), col("__cb"))).as("inter_w"),
        sum(greatest(col("__ca"), col("__cb"))).as("union_w"))
      .withColumn("wjaccard_ppm",
        expr("(inter_w * 1000000) div union_w"))
  }

  /** Dictionary keyword tagging — the broadcast contains-join that
    * labels every document with every matching (tag, keyword) from a
    * curated dictionary (topic lexicons, blocklists, PII term lists):
    * the Aho-Corasick role, expressed as Spark's broadcast
    * nested-loop over a dictionary that is small BY CONTRACT (a
    * curated list — same contract as pageRankInt's seed set). Output:
    * (id, tag, keyword, n_hits) for hits only, where n_hits counts
    * non-overlapping case-insensitive SUBSTRING occurrences via the
    * replace-length identity `(len(t) − len(replace(t, kw))) div
    * len(kw)` — pure codegen'd string arithmetic, no regex
    * compilation per keyword, identical semantics in any SQL engine.
    * Word-boundary matching is [[redactionCount]]'s regex territory;
    * substring semantics is the standard dictionary-tagger contract
    * (it finds "key" inside "keys").
    *
    * Scale shape: the corpus is scanned once; each row is checked
    * against the broadcast dictionary in-task (no shuffle of the
    * corpus at all), and only hit rows — ≤ dict-size per doc,
    * typically ≪ 1 — survive to the output. */
  def tagKeywords(df: DataFrame, idCol: String, textCol: String,
      dict: DataFrame, tagCol: String, kwCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      lower(coalesce(col(textCol), lit(""))).as("__lt"))
    val d = broadcast(dict
      .select(col(tagCol).as("tag"), lower(col(kwCol)).as("keyword"))
      .filter(col("keyword").isNotNull && length(col("keyword")) > 0)
      .distinct())
    docs.crossJoin(d)
      .filter(expr("instr(__lt, keyword) > 0"))
      .select(col("id"), col("tag"), col("keyword"),
        expr("(length(__lt) - length(replace(__lt, keyword, ''))) div" +
          " length(keyword)").as("n_hits"))
  }

  /** [[tagKeywords]] at scan speed: the whole dictionary is compiled
    * into ONE Aho–Corasick automaton ([[graft.codecs.AcMatchCounts]])
    * and every document is scanned ONCE — O(text) per row instead of
    * the contains-join's O(text · dict) instr+replace scans, the
    * difference that keeps a 10k-phrase lexicon viable at 100 TB.
    * Identical output contract and replace-count semantics (byte-
    * for-byte — the q234 oracle is the q173 contains-join SQL).
    *
    * Scale shape: the dictionary collects to the driver (bounded by
    * contract — it was broadcast-sized already) and ships inside the
    * expression; the scan is a pure projection with ZERO joins — the
    * keyword index maps back through an array literal, and only the
    * tag attachment joins a dict-sized broadcast. `maxKeywords`
    * guards the driver collect the same way BM25 guards its query
    * side. */
  def tagKeywordsFast(df: DataFrame, idCol: String, textCol: String,
      dict: DataFrame, tagCol: String, kwCol: String,
      maxKeywords: Int = 1000000): DataFrame = {
    val dRows = dict
      .select(col(tagCol).cast("string").as("tag"),
        lower(col(kwCol)).as("keyword"))
      .filter(col("keyword").isNotNull && length(col("keyword")) > 0)
      .distinct()
      .limit(maxKeywords + 1)
      .collect()
    require(dRows.length <= maxKeywords,
      s"dictionary exceeds maxKeywords=$maxKeywords")
    val kws: Array[String] =
      dRows.map(_.getString(1)).distinct.sorted
    require(kws.nonEmpty, "empty dictionary")
    val spark = df.sparkSession
    import spark.implicits._
    val kwArr = array(kws.map(lit).toIndexedSeq: _*)
    val counts = graft.functions.GraftFunctions.column(
      graft.codecs.AcMatchCounts(
        graft.functions.GraftFunctions.expr(
          lower(coalesce(col(textCol), lit("")))), kws.toSeq))
    val hits = df.select(col(idCol).as("id"), counts.as("__c"))
      .select(col("id"), posexplode(col("__c")).as(Seq("__ki", "n_hits")))
      .filter(col("n_hits") > 0L)
      .select(col("id"),
        element_at(kwArr, col("__ki") + 1).as("keyword"), col("n_hits"))
    val tags = broadcast(
      dRows.map(r => (r.getString(0), r.getString(1)))
        .toSeq.toDF("tag", "keyword"))
    hits.join(tags, Seq("keyword"))
      .select(col("id"), col("tag"), col("keyword"), col("n_hits"))
  }

  /** Adjacent-symbol pair counts for BPE tokenizer training — the
    * counting step of the first merge round (Sennrich et al. 2016),
    * at corpus scale. The scale insight: count over the VOCABULARY,
    * not the corpus — first reduce the corpus to (distinct token,
    * count) [one hash agg, map-side combined], then explode each
    * DISTINCT token's adjacent char pairs weighted by its count. On
    * natural text the vocabulary is orders of magnitude smaller than
    * the token stream, so the pair explode (the wide part) runs on
    * the small side; the corpus is touched exactly once. Iterating
    * merges re-runs this on a re-segmented vocabulary — each round
    * costs vocabulary work, never corpus work.
    *
    * Output: (pair "x y", cnt) for pairs with cnt ≥ `minCount`,
    * single-char tokens contribute nothing. */
  def bpePairCounts(df: DataFrame, textCol: String,
      minCount: Long = 1L, unicode: Boolean = false): DataFrame = {
    val vocab = df
      .select(explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__tc"))
    val chars = vocab
      .withColumn("__cs", split(col("tok"), ""))
    val pairs = chars.select(col("__tc"),
      explode(bigramsOfTokens(col("__cs"))).as("pair"))
    pairs.groupBy(col("pair")).agg(sum(col("__tc")).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Collocation extraction — corpus-wide word-bigram association
    * strength, the phrase-mining signal ("new york", "machine
    * learning") a tokenizer-vocabulary or stop-phrase pipeline runs
    * before training. For each adjacent word pair (within-document,
    * order-preserving): `assoc_ppm = ((n_ab·1e6) div n_a · N) div
    * n_b` — the integer-ppm surrogate of pointwise mutual
    * information's rational argument `P(ab)/(P(a)P(b))` (no log: the
    * no-libm doctrine of q52/q108; log is monotone, so rankings
    * agree). Flooring points are fixed (÷n_a first, then ÷n_b) so
    * DuckDB's `//` replays them bit-for-bit. Overflow bound:
    * `(n_ab·1e6 div n_a) ≤ 1e6` (a bigram can't outnumber its own
    * first word), so the product with N stays in Long up to ~9e12
    * total corpus tokens; chunk the corpus or raise to ppb-free
    * scale beyond that.
    *
    * Scale shape: ONE corpus scan — the unigram and bigram streams
    * ride a single tagged-union explode into one map-side-combined
    * agg (separate uni/bi aggs would each rescan and re-tokenize the
    * corpus: 2× the dominant cost). The combined count table is
    * vocabulary-sized; it is persisted and materialized because three
    * small downstream reads (unigram side ×2 joins, corpus total)
    * branch from it — without the pin each branch would replay the
    * corpus pass. `minCount` prunes the bigram tail BEFORE the two
    * vocab-keyed joins; N rides a one-row broadcast cross join.
    *
    * Output: (pair "w1 w2", n_ab, assoc_ppm), pairs with
    * n_ab ≥ `minCount`. */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      unicode: Boolean = false): DataFrame = {
    require(minCount > 0, s"minCount must be positive (got $minCount)")
    val toks = df.select(alphaTokens(col(textCol), unicode).as("__t"))
    val stage = toks.select(explode(concat(
        transform(col("__t"),
          x => struct(lit("u").as("k"), x.as("v"))),
        transform(bigramsOfTokens(col("__t")),
          x => struct(lit("b").as("k"), x.as("v"))))).as("e"))
      .select(col("e.k").as("k"), col("e.v").as("v"))
    val counts = stage.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count() // materialize: downstream branches reuse the pin
    val uni = counts.filter(col("k") === "u")
      .select(col("v").as("w"), col("n").as("n_w"))
    val total = uni.agg(coalesce(sum(col("n_w")), lit(0L)).as("nn"))
    val bi = counts.filter(col("k") === "b")
      .filter(col("n") >= minCount)
      .select(col("v").as("pair"), col("n").as("n_ab"))
      .withColumn("__w1", split(col("pair"), " ").getItem(0))
      .withColumn("__w2", split(col("pair"), " ").getItem(1))
    bi.join(uni.select(col("w").as("__w1"), col("n_w").as("__na")), "__w1")
      .join(uni.select(col("w").as("__w2"), col("n_w").as("__nb")), "__w2")
      .crossJoin(broadcast(total))
      .select(col("pair"), col("n_ab"),
        expr("(((n_ab * 1000000) div __na) * nn) div __nb").as("assoc_ppm"))
  }

  /** Word co-occurrence pairs within a token window — the
    * word2vec/SGNS positive-pair generator over TEXT (the sibling of
    * [[Graph.skipGramPairs]] over walks): for every document, every
    * ordered pair (t[i], t[i+k]) with 1 ≤ k ≤ `window`, counted
    * corpus-wide. Left-to-right pairs only — SGNS symmetrizes in the
    * loss, and emitting one direction halves the exchange; union
    * with the swapped columns downstream if both are needed.
    *
    * ONE corpus scan, ZERO joins: the per-k shifted zips are built
    * array-level (`slice`+`zip_with`, codegen) and exploded once;
    * the pair agg map-side-combines. Token-pair volume is
    * `window × corpus_tokens` rows into the combiner — the inherent
    * word2vec cost, linear in both. `minCount` prunes the output
    * vocabulary tail. */
  def cooccurrencePairs(df: DataFrame, textCol: String, window: Int,
      minCount: Long, unicode: Boolean = false): DataFrame = {
    require(window > 0 && window <= 64,
      s"window must be in [1, 64] (got $window)")
    require(minCount > 0, s"minCount must be positive (got $minCount)")
    val toks = df.select(alphaTokens(col(textCol), unicode).as("__t"))
    val shifted = (1 to window).map { k =>
      when(size(col("__t")) <= k, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - k),
          slice(col("__t"), lit(k + 1), size(col("__t")) - k),
          (a, b) => concat(a, lit(" "), b)))
    }
    toks.select(explode(concat(shifted: _*)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Deterministic SGNS negative sampling — the third leg of the
    * skip-gram training-data path (positives: [[cooccurrencePairs]] /
    * [[Graph.skipGramPairs]]): for every key row, `k` negatives drawn
    * from the unigram distribution ∝ count, by landing the md5 draw
    * `H(seed, key, j) mod N` in the word's cumulative-count interval
    * over the word-sorted vocabulary. α=1 frequency weighting — the
    * integer-exact surrogate of word2vec's f^0.75 smoothing (a
    * fractional power needs libm and breaks cross-engine
    * bit-parity); callers wanting the 0.75 tilt can pre-transform the
    * count column with any monotone integer map.
    *
    * Scale shape: the cumulative intervals ride
    * [[Ranking.withRunningTotal]]'s distributed prefix scan (the
    * classic `sum().over(Window.orderBy)` spelling is a
    * single-partition scale-killer), and the draw→interval lookup is
    * the binned range equi-join ([[RangeJoin.byBins]]) — never a
    * broadcast nested loop over a million-word vocabulary. One md5
    * per draw; draws-per-key explode before the join, so the
    * exchange is draws-sized (k × keys).
    *
    * Output: (key, draw, neg) — `k` rows per input key. */
  def negativeSamples(keys: DataFrame, keyCol: String, vocab: DataFrame,
      wordCol: String, countCol: String, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0 && k <= 1024, s"k must be in [1, 1024] (got $k)")
    val v0 = vocab.select(col(wordCol).cast("string").as("__w"),
        col(countCol).cast("long").as("__n"))
      .filter(col("__n") > 0)
    val iv = Ranking.withRunningTotal(v0, Seq(col("__w")), "__n", "__lo")
      .withColumn("__hi", col("__lo") + col("__n") - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = iv.agg(coalesce(sum(col("__n")), lit(0L)))
      .head().getLong(0)
    require(total > 0, "negativeSamples needs a non-empty vocabulary")
    // bin near the mean interval length: ~1 replica per interval,
    // bucket width ~1 vocab word per bin
    val binSize = math.max(total / math.max(iv.count(), 1L), 1L)
    val draws = keys.select(col(keyCol).cast("string").as("key"))
      .select(col("key"),
        explode(sequence(lit(0L), lit(k - 1L))).as("draw"))
      .withColumn("__r", conv(substring(md5(concat(
        lit(s"$seed:neg:"), col("key"), lit(":"),
        col("draw").cast("string"))), 1, 15), 16, 10)
        .cast("long") % total)
    RangeJoin.byBins(draws, "__r", iv, "__lo", "__hi", binSize)
      .select(col("key"), col("draw"), col("__w").as("neg"))
  }

  /** Vocabulary-growth (Heaps-law) curve — how fast the distinct
    * vocabulary grows as the corpus is consumed in `idCol` order,
    * sampled at `bucketSize`-document checkpoints. The sublinear
    * growth exponent is the standard corpus-health signal: a curve
    * that keeps growing linearly means boilerplate/UUID pollution
    * (tokenizer-vocab poison); one that flattens too early means the
    * corpus is repetitive (Heaps 1978; Baeza-Yates & Ribeiro-Neto).
    *
    * Per bucket: token count, newly-first-seen term count, and the
    * INCLUSIVE cumulative token/vocab totals up to that bucket.
    * A term's first sighting is `min(bucket)` over its occurrences —
    * order-free, so the result is engine/partitioning-independent.
    *
    * Scale shape: one tokenize pass; the first-sighting agg is
    * map-side combined down to the vocabulary; per-bucket rollups are
    * bucket-count-sized; the cumulative totals ride
    * [[Ranking.withRunningTotal]]'s range-shuffle prefix scan — no
    * single-partition window anywhere. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      bucketSize: Long, unicode: Boolean = false): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive (got $bucketSize)")
    val tok = df.select(expr(s"$idCol div ${bucketSize}L").as("bucket"),
      explode(alphaTokens(col(textCol), unicode)).as("w"))
    val firsts = tok.groupBy(col("w")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
    val per = tok.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
      .join(firsts, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
    val a = Ranking.withRunningTotal(per, Seq(col("bucket")),
      "n_tokens", "__ct")
    val b = Ranking.withRunningTotal(a, Seq(col("bucket")),
      "new_terms", "__cv")
    b.select(col("bucket"), col("n_tokens"), col("new_terms"),
      (col("__ct") + col("n_tokens")).as("cum_tokens"),
      (col("__cv") + col("new_terms")).as("cum_vocab"))
  }

  /** BPE symbol segmentation of a token under an ORDERED merge list
    * — the apply half of a trained tokenizer: split to characters,
    * then for each merge `(l, r)` in order run one greedy
    * left-to-right pass replacing adjacent `(l, r)` with `l+r`
    * (Sennrich et al. 2016 apply semantics; the produced symbol is
    * never re-examined within its own pass). Codegen'd
    * [[graft.ops.ApplyBpe]] with the merge list baked in — one tight
    * loop per row, no HOFs. Oracle-replayable: greedy leftmost per
    * merge equals a SQL `replace()` over the `(sym)(sym)` delimited
    * encoding, which DuckDB folds over the merge list (q98). */
  def applyBpe(tok: Column, merges: Seq[(String, String)]): Column =
    graft.functions.GraftFunctions.column(ApplyBpe(
      graft.functions.GraftFunctions.expr(tok), merges.toIndexedSeq))

  /** TRUE iterative BPE training (Sennrich et al. 2016): `numMerges`
    * rounds of count-all-adjacent-pairs → merge the most frequent.
    * Returns the ORDERED merge list (ties broken by pair value in
    * UTF-8 byte order — Spark's binary string ordering — so the list
    * is deterministic on any engine/partitioning).
    *
    * Scale shape — the q89 insight, iterated: the corpus is reduced
    * to its (distinct token, count) VOCABULARY once (one hash agg,
    * persisted). The vocabulary is the bounded object, so when it
    * fits the driver (≤ `maxVocabRows` distinct tokens — checked by
    * an exact count, never trusted) the merge loop runs IN MEMORY
    * with incremental pair-count maintenance (only words containing
    * the merged pair are touched per round — the classic trainer),
    * reaching real tokenizer merge counts (32k+) in seconds instead
    * of one Spark job per merge (the r8 verdict's top scale gap).
    * Over the cap, the loop falls back to the distributed form:
    * every round re-segments the vocabulary under the merges so far
    * (codegen'd [[applyBpe]], O(r·|vocab|) work in round r —
    * vocabulary work, never corpus work) and collects exactly ONE
    * row (the argmax pair) — unbounded in vocabulary size, linear in
    * merges. The two paths produce IDENTICAL merge lists
    * (spec-enforced in BpePairSpec): the in-memory state after round
    * m equals [[applyBpe]] re-segmentation under merges[0..m] by
    * induction, since both perform the same single greedy pass per
    * round. Rounds end early when no pair reaches `minCount`.
    * Driver state is the merge list + the capped vocabulary (like
    * [[SemanticDedup]] pinning k centroids), never corpus data. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, unicode: Boolean = false,
      maxVocabRows: Long = 4000000L): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive (got $numMerges)")
    require(minCount > 0, s"minCount must be positive (got $minCount)")
    val vocab = df
      .select(explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__tc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (vocab.count() <= maxVocabRows) {
        import df.sparkSession.implicits._
        trainBpeInMemory(
          vocab.as[(String, Long)].collect(), numMerges, minCount)
      } else trainBpeDistributed(vocab, numMerges, minCount)
    } finally vocab.unpersist()
  }

  /** The over-cap fallback loop of [[trainBpe]]: one Spark job per
    * merge round over the persisted vocabulary. */
  private def trainBpeDistributed(vocab: DataFrame, numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    while (!exhausted && merges.length < numMerges) {
      val staged = vocab
        .select(col("__tc"), applyBpe(col("tok"), merges.toSeq).as("__segs"))
        .select(col("__tc"), bigramsOfTokens(col("__segs")).as("__bg"))
      val best = NearDedup.explodeStrings(staged, "__tc", "__bg", "pair")
        .groupBy(col("pair")).agg(sum(col("__tc")).as("cnt"))
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val p = best.head.getString(0).split(" ", 2)
        merges += ((p(0), p(1)))
      }
    }
    merges.toSeq
  }

  /** UTF-8 byte-order comparison — Spark orders strings by unsigned
    * UTF-8 bytes (UTF8String.compareTo), NOT Java's UTF-16 code-unit
    * compare; the two diverge on supplementary-plane letters, so the
    * in-memory trainer must tie-break in byte order to stay
    * merge-for-merge equal to the distributed `orderBy(pair)`. */
  private def utf8Less(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-side incremental BPE merge loop over a collected
    * weighted vocabulary (Sennrich et al. 2016 learn_bpe shape):
    * maintain adjacent-pair counts, a pair→words occurrence index,
    * and a lazy-deletion max-heap of (count, pair); each round
    * merges the argmax pair (count desc, pair UTF-8-byte asc) with
    * ONE greedy left-to-right pass over only the words that contain
    * it, updating pair counts by the old-pairs/new-pairs delta and
    * pushing the changed counts (stale heap entries are skipped at
    * pop time by comparing against the live count). The delta is
    * WHOLE-WORD (subtract every old pair, add every new pair) — for
    * pairs far from the merge site the two cancel, costing dead
    * heap entries; the merge-site-local delta would cut that
    * constant but its cascade/boundary cases (overlapping sites,
    * shared neighbors) are exactly where reference implementations
    * historically miscounted, and natural-language words are short
    * — the chosen trade is simplicity that cannot miscount. O(touched
    * symbols · log heap) per round after an O(total symbols) build —
    * 32k merges over a large vocabulary is seconds of driver work.
    * Exposed package-private so BpePairSpec can cross-check it
    * against the distributed loop on the same vocabulary. */
  private[ops] def trainBpeInMemory(vocab: Array[(String, Long)],
      numMerges: Int, minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    // word → symbol array (split by CODEPOINT — surrogate pairs must
    // never be cut, the ApplyBpe contract) + weight
    val segs: Array[Array[String]] = vocab.map { case (tok, _) =>
      tok.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }
    val wc: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair → word indices: an append-only int builder, NOT a BitSet —
    // a BitSet is dense in the LARGEST index it holds, so one rare
    // pair occurring only near the end of a multi-million-word
    // vocabulary would allocate hundreds of KB (and millions of rare
    // pairs, hundreds of GB). The builder is 4 bytes per occurrence;
    // it may hold duplicates (same word re-added by delta updates) —
    // consumers sort+distinct, which also preserves the ascending
    // iteration order a BitSet gave
    val where = mutable.HashMap.empty[(String, String), mutable.ArrayBuilder.ofInt]
    // max-heap: higher count wins; ties — UTF-8-byte-SMALLER "l r"
    // key wins (the distributed orderBy(cnt desc, pair) tie-break)
    val heapOrd = new Ordering[(Long, String, (String, String))] {
      def compare(a: (Long, String, (String, String)),
          b: (Long, String, (String, String))): Int =
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else if (a._2 == b._2) 0
        else if (utf8Less(a._2, b._2)) 1
        else -1
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, (String, String))](heapOrd)
    def addPair(p: (String, String), w: Long, wi: Int,
        push: Boolean): Unit = {
      val c = counts.getOrElse(p, 0L) + w
      if (c == 0L) counts.remove(p)
      else {
        counts(p) = c
        if (push && c >= minCount) heap.enqueue((c, p._1 + " " + p._2, p))
      }
      where.getOrElseUpdate(p, new mutable.ArrayBuilder.ofInt) += wi
    }
    var wi = 0
    while (wi < segs.length) {
      val s = segs(wi)
      var i = 0
      while (i + 1 < s.length) {
        addPair((s(i), s(i + 1)), wc(wi), wi, push = false)
        i += 1
      }
      wi += 1
    }
    counts.foreach { case (p, c) =>
      if (c >= minCount) heap.enqueue((c, p._1 + " " + p._2, p))
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (!exhausted && merges.length < numMerges) {
      // pop to the first LIVE entry (count matches the current map —
      // every live pair ≥ minCount has a heap entry at its current
      // count, pushed when it last changed)
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, _, p) = heap.dequeue()
        if (counts.getOrElse(p, 0L) == c) best = p
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val (l, r) = best
        // touch only words indexed under the pair (stale entries —
        // words whose occurrence was merged away earlier — no-op via
        // the length check); sorted+distinct restores the BitSet's
        // deterministic ascending one-visit-per-word iteration
        where.remove(best).map(_.result().sorted.distinct)
          .foreach(_.foreach { w =>
          val old = segs(w)
          val out = new Array[String](old.length)
          var o = 0
          var i = 0
          while (i < old.length) {
            if (i + 1 < old.length && old(i) == l && old(i + 1) == r) {
              out(o) = l + r; o += 1; i += 2
            } else { out(o) = old(i); o += 1; i += 1 }
          }
          if (o < old.length) {
            val next = java.util.Arrays.copyOf(out, o)
            var j = 0
            while (j + 1 < old.length) {
              addPair((old(j), old(j + 1)), -wc(w), w, push = true); j += 1
            }
            j = 0
            while (j + 1 < next.length) {
              addPair((next(j), next(j + 1)), wc(w), w, push = true); j += 1
            }
            segs(w) = next
          }
        })
        counts.remove(best)
      }
    }
    merges.toSeq
  }

  /** Unigram-LM tokenizer training — the SentencePiece EM loop (Kudo
    * 2018: seed a large substring vocabulary, iterate
    * expectation-maximization over the segmentation lattice, prune to
    * the target size), producing the integer-cost (piece, cost) table
    * [[unigramEncode]] / [[UnigramSegmentTokens]] apply. The BPE
    * family's other half: [[trainBpe]] trains the merge tokenizer;
    * this trains the probabilistic one.
    *
    * Determinism doctrine (the repo's engine-exactness rule applied
    * to EM): every per-token expected count from the
    * forward-backward pass is QUANTIZED to fixed-point
    * (floor(e · 2^20)) BEFORE summation, so accumulation is integer
    * and associative — the in-memory and distributed E-steps produce
    * bit-identical count tables on any partitioning (spec-pinned,
    * the [[trainBpe]] merge-for-merge guarantee). All transcendental
    * steps use StrictMath, bit-exact across JVMs. Final costs are
    * round(-ln(p) · 10⁶) with Laplace(+1) smoothing over the
    * quantized counts — non-negative integers by construction
    * (guarded), ready for the integer-cost Viterbi encode.
    *
    * Loop shape: seed = every single codepoint (mandatory — total
    * coverage needs them, and they are never pruned) plus the top
    * `seedSize` multi-codepoint substrings by (count·len desc, piece
    * UTF-8 asc) with count ≥ `minCount`; then rounds of `emIters`
    * EM passes followed by a prune to 3/4 size (keeping singles +
    * top pieces by expected count, ties by piece) until the target
    * `vocabSize` is reached; one final EM refresh prices the
    * surviving vocabulary.
    *
    * Scale shape — the [[trainBpe]] reduction, unchanged: the corpus
    * collapses to its (distinct token, count) vocabulary in ONE hash
    * agg; seeding explodes substrings of DISTINCT tokens only
    * (vocabulary·maxPieceCp work, never corpus work). Under
    * `maxVocabRows` (exact count, never trusted) the EM loop runs on
    * the driver; over it, each E-step is one Spark job over the
    * persisted vocabulary with the piece table broadcast, reduced by
    * integer sum. Driver state is the piece table (≤ seed size),
    * never corpus data. */
  def trainUnigram(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceCp: Int = 8, seedSize: Int = 20000, minCount: Long = 2L,
      emIters: Int = 2, unicode: Boolean = false,
      maxVocabRows: Long = 4000000L): Seq[(String, Long)] = {
    require(vocabSize > 0, s"vocabSize must be positive (got $vocabSize)")
    require(maxPieceCp >= 1, s"maxPieceCp must be >= 1 (got $maxPieceCp)")
    require(seedSize >= 0 && minCount > 0 && emIters >= 1,
      s"bad trainUnigram params: seedSize=$seedSize minCount=$minCount " +
        s"emIters=$emIters")
    val vocab = df
      .select(explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__tc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      import df.sparkSession.implicits._
      if (vocab.count() <= maxVocabRows) {
        trainUnigramCore(vocab.as[(String, Long)].collect(), vocabSize,
          maxPieceCp, seedSize, minCount, emIters, eStep = null)
      } else {
        val ds = vocab.as[(String, Long)]
        trainUnigramCore(
          // seeding still needs the token vocabulary driver-side; an
          // over-cap vocabulary seeds DISTRIBUTED (top-k collect) and
          // runs E-steps as Spark jobs
          Array.empty, vocabSize, maxPieceCp, seedSize, minCount,
          emIters,
          eStep = pieces => distributedEStep(ds, pieces, maxPieceCp),
          seedOverride = Some(distributedSeed(ds, maxPieceCp, seedSize,
            minCount)))
      }
    } finally vocab.unpersist()
  }

  /** Distributed seed: substring counts over the (token, count)
    * vocabulary, top `seedSize` multi-cp by (count·len desc, piece
    * UTF-8 asc) ≥ minCount, plus ALL single codepoints. Bounded
    * collect: seedSize + distinct-codepoint count rows. */
  private def distributedSeed(vocab: org.apache.spark.sql.Dataset[(String, Long)],
      maxPieceCp: Int, seedSize: Int, minCount: Long): Array[(String, Long)] = {
    import vocab.sparkSession.implicits._
    val subs = vocab.flatMap { case (tok, w) =>
      val cps = tok.codePoints().toArray
      for {
        i <- cps.indices
        l <- 1 to math.min(maxPieceCp, cps.length - i)
      } yield (new String(cps, i, l), w)
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
      .toDF("piece", "cnt")
    val singles = subs
      .filter(length(col("piece")) <= 2) // cp may be 2 UTF-16 units
      .as[(String, Long)].collect()
      .filter { case (p, _) => p.codePointCount(0, p.length) == 1 }
    val multis = subs
      .filter(col("cnt") >= minCount)
      .as[(String, Long)].collect()
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .sortWith { case ((pa, ca), (pb, cb)) =>
        val sa = ca * pa.codePointCount(0, pa.length)
        val sb = cb * pb.codePointCount(0, pb.length)
        if (sa != sb) sa > sb else utf8Less(pa, pb)
      }
      .take(seedSize)
    singles ++ multis
  }

  /** One distributed E-step: per-token lattice expectations under the
    * broadcast piece log-probs, quantized per token (integer), summed
    * by piece. Bit-equal to the in-memory loop by integer summation. */
  private def distributedEStep(vocab: org.apache.spark.sql.Dataset[(String, Long)],
      pieces: Array[(String, Double)],
      maxPieceCp: Int): scala.collection.mutable.HashMap[String, Long] = {
    import vocab.sparkSession.implicits._
    val bc = vocab.sparkSession.sparkContext.broadcast(pieces)
    try {
      val partial = vocab.mapPartitions { it =>
        val lp = new java.util.HashMap[String, java.lang.Double]()
        bc.value.foreach { case (p, v) => lp.put(p, v) }
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { case (tok, w) =>
          unigramLatticeCounts(tok, w, lp, maxPieceCp, acc)
        }
        acc.iterator
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }.collect()
      scala.collection.mutable.HashMap(partial: _*)
    } finally bc.destroy()
  }

  /** Forward-backward expected piece counts for ONE token (weight w),
    * quantized floor(e · 2^20 · w) per occurrence, accumulated into
    * `acc`. Log-space throughout; StrictMath for JVM bit-equality.
    * Package-private: UnigramTrainSpec brute-force-checks it. */
  private[ops] def unigramLatticeCounts(tok: String, w: Long,
      lp: java.util.HashMap[String, java.lang.Double], maxPieceCp: Int,
      acc: scala.collection.mutable.HashMap[String, Long]): Unit = {
    val cps = tok.codePoints().toArray
    val n = cps.length
    if (n == 0) return
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else if (a > b) a + StrictMath.log1p(StrictMath.exp(b - a))
      else b + StrictMath.log1p(StrictMath.exp(a - b))
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(maxPieceCp, i)
      while (l <= maxL) {
        val c = lp.get(new String(cps, i - l, l))
        if (c != null && alpha(i - l) != NEG)
          alpha(i) = lse(alpha(i), alpha(i - l) + c.doubleValue())
        l += 1
      }
      i += 1
    }
    if (alpha(n) == NEG) return // unreachable token (no covering pieces)
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      val maxL = math.min(maxPieceCp, n - i)
      while (l <= maxL) {
        val c = lp.get(new String(cps, i, l))
        if (c != null && beta(i + l) != NEG)
          beta(i) = lse(beta(i), beta(i + l) + c.doubleValue())
        l += 1
      }
      i -= 1
    }
    val z = alpha(n)
    i = 0
    while (i < n) {
      var l = 1
      val maxL = math.min(maxPieceCp, n - i)
      while (l <= maxL) {
        val p = new String(cps, i, l)
        val c = lp.get(p)
        if (c != null && alpha(i) != NEG && beta(i + l) != NEG) {
          val e = StrictMath.exp(alpha(i) + c.doubleValue() +
            beta(i + l) - z)
          val q = (e * 1048576.0 * w).toLong // floor; integer, associative
          if (q > 0) acc.update(p, acc.getOrElse(p, 0L) + q)
        }
        l += 1
      }
      i += 1
    }
  }

  /** The shared seed→EM→prune loop. `eStep == null` runs EM on the
    * driver over `tokens`; otherwise each E-step delegates (the
    * distributed path). Exposed package-private so UnigramTrainSpec
    * can pin both paths equal. */
  private[ops] def trainUnigramCore(tokens: Array[(String, Long)],
      vocabSize: Int, maxPieceCp: Int, seedSize: Int, minCount: Long,
      emIters: Int,
      eStep: Array[(String, Double)] => scala.collection.mutable.HashMap[String, Long],
      seedOverride: Option[Array[(String, Long)]] = None): Seq[(String, Long)] = {
    // ---- seed ----
    val seeded: Array[(String, Long)] = seedOverride.getOrElse {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      tokens.foreach { case (tok, w) =>
        val cps = tok.codePoints().toArray
        var i = 0
        while (i < cps.length) {
          var l = 1
          val maxL = math.min(maxPieceCp, cps.length - i)
          while (l <= maxL) {
            val p = new String(cps, i, l)
            counts.update(p, counts.getOrElse(p, 0L) + w)
            l += 1
          }
          i += 1
        }
      }
      val (singles, multis) = counts.toArray.partition {
        case (p, _) => p.codePointCount(0, p.length) == 1 }
      singles ++ multis.filter(_._2 >= minCount)
        .sortWith { case ((pa, ca), (pb, cb)) =>
          val sa = ca * pa.codePointCount(0, pa.length)
          val sb = cb * pb.codePointCount(0, pb.length)
          if (sa != sb) sa > sb else utf8Less(pa, pb)
        }
        .take(seedSize)
    }
    require(seeded.nonEmpty, "trainUnigram: empty corpus (no tokens)")

    // current vocabulary: piece → quantized expected count
    var current: Array[(String, Long)] = seeded.sortWith {
      case ((a, _), (b, _)) => utf8Less(a, b) }
    def isSingle(p: String): Boolean = p.codePointCount(0, p.length) == 1

    def mStepLogProbs(cnt: Array[(String, Long)]): Array[(String, Double)] = {
      // Laplace(+1) over quantized counts: every piece keeps nonzero
      // mass, costs stay finite
      val total = cnt.foldLeft(0L) { case (a, (_, c)) => a + c + 1L }
      cnt.map { case (p, c) =>
        (p, StrictMath.log((c + 1L).toDouble / total.toDouble)) }
    }
    def runEStep(lpArr: Array[(String, Double)])
        : scala.collection.mutable.HashMap[String, Long] =
      if (eStep != null) eStep(lpArr)
      else {
        val lp = new java.util.HashMap[String, java.lang.Double]()
        lpArr.foreach { case (p, v) => lp.put(p, v) }
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        tokens.foreach { case (tok, w) =>
          unigramLatticeCounts(tok, w, lp, maxPieceCp, acc) }
        acc
      }
    def emRounds(k: Int): Unit = {
      var r = 0
      while (r < k) {
        val got = runEStep(mStepLogProbs(current))
        current = current.map { case (p, _) => (p, got.getOrElse(p, 0L)) }
        r += 1
      }
    }

    // ---- EM + prune to target ----
    emRounds(emIters)
    var done = false
    while (!done && current.length > vocabSize) {
      val (singles, multis) = current.partition { case (p, _) => isSingle(p) }
      if (multis.isEmpty) {
        // vocabSize is below the single-codepoint floor: singles are
        // the total-coverage contract and are never pruned — the
        // smallest legal vocabulary wins over the requested size
        done = true
      } else {
        val keepMultis =
          math.max(vocabSize - singles.length, (current.length * 3 / 4)
            .min(current.length - 1) - singles.length).max(0)
        val kept = multis.sortWith { case ((pa, ca), (pb, cb)) =>
            if (ca != cb) ca > cb else utf8Less(pa, pb) }
          .take(keepMultis)
        current = (singles ++ kept).sortWith {
          case ((a, _), (b, _)) => utf8Less(a, b) }
        if (current.length > vocabSize) emRounds(emIters)
      }
    }
    emRounds(1) // final refresh prices the surviving vocabulary

    // ---- integer costs ----
    val total = current.foldLeft(0L) { case (a, (_, c)) => a + c + 1L }
    val out = current.map { case (p, c) =>
      val cost = StrictMath.round(
        -StrictMath.log((c + 1L).toDouble / total.toDouble) * 1e6)
      require(cost >= 0, s"negative unigram cost for '$p'")
      (p, cost)
    }
    out.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca < cb else utf8Less(pa, pb) }.toSeq
  }

  /** Persistable form of an ORDERED merge list — (merge_idx, left,
    * right), merge_idx dense from 0 in training order. A trained
    * tokenizer is train-once/apply-everywhere state: write this
    * frame to parquet next to the corpus it was trained on and every
    * later job ([[applyBpe]], [[bpeTokenCounts]],
    * [[bpeSegmentCounts]], packing) reloads the identical list. */
  def mergesToDF(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("merge_idx", "left", "right")
  }

  /** Inverse of [[mergesToDF]]: reload an ordered merge list. The
    * index must be exactly 0..n-1 (a filtered or doubled store would
    * silently train a DIFFERENT tokenizer — refused instead). Driver
    * collect is merge-list-sized by construction. */
  def mergesFromDF(df: DataFrame): Seq[(String, String)] = {
    import df.sparkSession.implicits._
    val rows = df.select(col("merge_idx").cast("int"), col("left"),
        col("right"))
      .as[(Int, String, String)].collect().sortBy(_._1)
    require(rows.iterator.map(_._1).sameElements(rows.indices.iterator),
      s"merge_idx must be dense 0..${rows.length - 1} — store is " +
        "filtered, duplicated or not a merge table")
    rows.map { case (_, l, r) => (l, r) }.toSeq
  }

  /** Per-document EXACT BPE token count under an ordered merge list
    * — the true token budget [[Packing]]/[[Chunk]] need when the
    * whitespace proxy isn't good enough (seq-length packing is
    * budgeted in TOKENIZER units, not words). Scale shape: the
    * segmentation runs once per DISTINCT token (vocabulary-sized,
    * codegen'd [[applyBpe]]); the per-(doc, token) frequency table
    * is one map-side-combined agg, joined to the symbol counts (AQE
    * broadcasts the vocabulary side when small) and re-aggregated —
    * exchanges carry distinct (doc, token) pairs, never the token
    * stream. Docs with no alpha tokens (or null text) count 0;
    * null-id rows are DROPPED (the id-keyed contract of
    * [[DupSpans]]/[[Dedup]] — an equi-join would silently misreport
    * their real counts as 0 otherwise). Output: (idCol, n_bpe), one
    * row per DISTINCT non-null id — duplicate-id input rows collapse
    * to one output row carrying the id's whole-corpus token total
    * (the per-input-row spelling would attach that same total to
    * every duplicate and double-count downstream packing budgets —
    * r8 advice); identity is the unit, as in [[Dedup]]/[[DupSpans]]. */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], unicode: Boolean = false): DataFrame = {
    val nonNull = df.filter(col(idCol).isNotNull)
    val docTok = nonNull
      .select(col(idCol), explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__c"))
    val nsym = docTok.select(col("tok")).distinct()
      .select(col("tok"),
        size(applyBpe(col("tok"), merges)).cast("long").as("__nsym"))
    val counts = docTok.join(nsym, Seq("tok"))
      .groupBy(col(idCol)).agg(sum(col("__c") * col("__nsym")).as("n_bpe"))
    nonNull.select(col(idCol)).distinct().join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }

  /** Per-document BPE ENCODE — the tokenizer step a training
    * pipeline actually runs: the document's token stream segmented
    * under the ordered merge list, symbols in token order, plus the
    * exact token budget. Output: (idCol, n_bpe, enc_text) — one row
    * per non-null-id input row, enc_text the space-joined symbol
    * stream (symbols are letter/digit runs, so the join is
    * lossless), null text reads as empty (0 symbols, '').
    *
    * Scale shape: ONE codegen pass per row ([[ApplyBpeTokens]]),
    * zero joins, zero shuffles — parquet-scan speed. That is the
    * floor for encoding: the output is token-stream-sized no matter
    * how the work is organized, so vocabulary-deduped segmentation
    * (the [[bpeTokenCounts]] shape) would ADD exchanges carrying the
    * same mass it saves in segmentation; per-row work wins. Counting
    * without the encoded text → [[bpeTokenCounts]]. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], unicode: Boolean = false): DataFrame = {
    import graft.functions.GraftFunctions.{column => cexp, expr => eexp}
    df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        alphaTokens(coalesce(col(textCol), lit("")), unicode).as("__t"))
      .select(col(idCol),
        cexp(ApplyBpeTokens(eexp(col("__t")), merges)).as("__syms"))
      .select(col(idCol),
        size(col("__syms")).cast("long").as("n_bpe"),
        array_join(col("__syms"), " ").as("enc_text"))
  }

  /** Corpus BPE symbol counts under an ordered merge list — the
    * "what does my trained tokenizer's unit distribution look like"
    * table. Computed over
    * the VOCABULARY weighted by token count (the q89 shape): the
    * corpus is touched once; the segmentation runs on the distinct
    * token set. Output: (symbol, cnt). */
  def bpeSegmentCounts(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], unicode: Boolean = false): DataFrame = {
    val vocab = df
      .select(explode(alphaTokens(col(textCol), unicode)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__tc"))
    val staged = vocab
      .select(col("__tc"), applyBpe(col("tok"), merges).as("__segs"))
    NearDedup.explodeStrings(staged, "__tc", "__segs", "symbol")
      .groupBy(col("symbol")).agg(sum(col("__tc")).as("cnt"))
  }

  /** Cleaned text column: ASCII control characters (except tab/LF/CR)
    * stripped, whitespace runs collapsed to one space, edges trimmed
    * — the crawl-text normalization pass. Explicit byte-range
    * classes, not `\s`/`\p{Cntrl}`, so any RE2/PCRE engine reads the
    * same sets (the q86 oracle replays them in DuckDB). */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\r]+", " "))

  /** Sanitation report per doc: control chars removed, whitespace
    * chars collapsed/trimmed away, clean length, and the md5 of the
    * cleaned text (the string itself stays in the store; the report
    * is the audit trail). Pure scan work. */
  def sanitize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val noCtrl = regexp_replace(col(textCol),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val clean = cleanText(col(textCol))
    df.select(col(idCol),
      (length(col(textCol)) - length(noCtrl)).cast("long").as("n_ctrl"),
      (length(noCtrl) - length(clean)).cast("long").as("n_ws_collapsed"),
      length(clean).cast("long").as("n_chars_clean"),
      md5(clean).as("clean_md5"))
  }

  /** Cross-corpus phrase familiarity — the log-free cousin of n-gram
    * LM perplexity filtering (CCNet-style quality scoring): per doc,
    * the mean CORPUS occurrence count of its bigram occurrences, in
    * floored micros. Gibberish, mojibake, and machine-garbled text
    * score low (their bigrams appear nowhere else); templated
    * boilerplate scores very high. Deliberately integer end-to-end:
    * a log-prob spelling would hang cross-engine reproducibility on
    * libm's last ulp, while mean-count carries the same ordering
    * signal exactly (same doctrine as [[topTerms]] leaving idf to
    * the caller).
    *
    * Scale shape: one bigram explode feeds BOTH the corpus count agg
    * and the per-doc join side (shared scan); both aggs are map-side
    * combined; the join keys on the bigram value, where stop-bigram
    * heat is AQE-skew-join territory — same contract as
    * [[NearDedup.contamination]]'s shingle join. Docs with < 2
    * tokens have no bigrams and emit no row. */
  def bigramFamiliarity(df: DataFrame, idCol: String,
      textCol: String, unicode: Boolean = false): DataFrame = {
    val staged = df.select(col(idCol),
        alphaTokens(col(textCol), unicode).as("__toks"))
      .select(col(idCol), bigramsOfTokens(col("__toks")).as("__bg"))
    val occ = NearDedup.explodeStrings(staged, idCol, "__bg", "__b")
    val corpus = occ.groupBy(col("__b")).agg(count(lit(1)).as("__cc"))
    occ.join(corpus, Seq("__b"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__cc")).as("__sum_cc"))
      .withColumn("familiarity_m",
        expr("__sum_cc * 1000000 div n_bigrams"))
      .select(col(idCol), col("n_bigrams"), col("familiarity_m"))
  }

  /** EXACT corpus-wide frequent terms: every alpha token whose total
    * occurrence count is ≥ `minCount`, with its exact count —
    * vocabulary heavy hitters for tokenizer construction, stopword
    * derivation, and boilerplate detection.
    *
    * Why not a plain `groupBy(term).count()`: map-side combine still
    * puts one row PER PARTITION-DISTINCT TERM into the exchange — on
    * web-scale corpora the vocabulary (URLs, typos, numbers, n-grams)
    * is itself enormous and heavy-tailed, so the shuffle is
    * vocabulary-sized even though the answer is tiny. This operator
    * instead runs per-partition Misra–Gries summaries (k counters,
    * decrement-all on overflow) to nominate candidates, then one
    * exact recount restricted to them. MG guarantee: an item missing
    * from EVERY partition summary has per-partition count
    * ≤ n_p/(k+1), hence global count ≤ N/(k+1) < minCount for
    * k ≥ N/minCount — so the candidate set provably contains every
    * qualifying term, and the recount's exchange carries only
    * candidate tokens. Result is exactly equal to the naive groupBy
    * + filter (the summaries only ever ADD false candidates, which
    * the exact recount then removes).
    *
    * `summarySize` = 0 (default) derives k from a token-count job:
    * k = N/minCount + 1. Pass it explicitly to skip that pass when
    * an upper bound on N/minCount is known — the claim is AUDITED,
    * not trusted: the nominate pass counts tokens by accumulator
    * (free) and the call REQUIRES k ≥ N/minCount + 1 once that pass
    * materializes, so an undersized summary fails loudly instead of
    * silently dropping true heavy hitters (r7 advice). Task retries
    * can only overcount the accumulator — the audit may reject a
    * barely-sufficient k on a retry-heavy run, never accept an
    * insufficient one. Caller-supplied k therefore makes this
    * operator EAGER (the nominate pass runs at call time, persisted
    * for the recount join); two corpus scans either way (nominate +
    * recount) — both narrow, at scan speed.
    *
    * Output: (term, cnt), exact. */
  def frequentTerms(df: DataFrame, textCol: String, minCount: Long,
      summarySize: Int = 0, unicode: Boolean = false): DataFrame = {
    require(minCount > 0, s"minCount must be positive (got $minCount)")
    require(summarySize >= 0)
    val toks = df.select(lit(0L).as("__g"),
      alphaTokens(col(textCol), unicode).as("__t"))
    val stream = NearDedup.explodeStrings(toks, "__g", "__t", "term")
      .select(col("term"))
    val k: Int =
      if (summarySize > 0) summarySize
      else {
        // coalesce: sum() over zero rows is null — an empty corpus
        // must derive k=1 (and fall through to an empty result), not
        // NPE on getLong
        val n = df.select(
          coalesce(sum(size(alphaTokens(col(textCol), unicode))).cast("long"),
            lit(0L)).as("n"))
          .head().getLong(0)
        val derived = n / minCount + 1
        require(derived <= 50000000L,
          s"derived summary size $derived (= N/minCount + 1) is too large " +
            "to hold per task — raise minCount or pass summarySize")
        derived.toInt
      }
    import org.apache.spark.sql.Encoders
    val nAcc =
      if (summarySize > 0)
        Some(df.sparkSession.sparkContext.longAccumulator(
          "graft.frequentTerms.tokens"))
      else None
    val candidates = stream.select(col("term")).as(Encoders.STRING)
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, Long](k * 2)
        it.foreach { t =>
          nAcc.foreach(_.add(1L))
          val c = m.get(t)
          if (c != 0L) m.put(t, c + 1L)
          else if (m.size < k) m.put(t, 1L)
          else { // decrement-all, evict zeros (classic Misra–Gries)
            val e = m.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
            }
          }
        }
        scala.jdk.CollectionConverters.SetHasAsScala(m.keySet).asScala.iterator
      }(Encoders.STRING)
      .distinct().toDF("term")
    // caller-supplied k: materialize the nominate pass (persisted, so
    // the recount join reuses it — still two corpus scans total) and
    // audit the MG no-miss precondition against the counted N
    val audited = nAcc match {
      case Some(acc) =>
        val pinned = candidates.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // unpersist on audit failure — a caller probing for a workable
        // k must not accumulate orphaned vocabulary-sized caches
        try {
          pinned.count()
          val needed = acc.value / minCount + 1
          if (needed > k) {
            // the accumulator can only OVERCOUNT (task retries /
            // speculation), so a failed accumulator audit is
            // re-adjudicated against an EXACT token count before
            // rejecting — a legitimately sufficient k never fails on
            // a retry-heavy run (r8 advice); the exact pass runs only
            // on this failure path, never in the healthy one
            val exactN = df.select(
              coalesce(sum(size(alphaTokens(col(textCol), unicode)))
                .cast("long"), lit(0L)).as("n")).head().getLong(0)
            val exactNeeded = exactN / minCount + 1
            require(exactNeeded <= k,
              s"summarySize $k < N/minCount + 1 = $exactNeeded (N=$exactN " +
                "tokens): Misra-Gries summaries this small can silently miss " +
                "true heavy hitters — raise summarySize or minCount")
          }
        } catch {
          case e: Throwable => pinned.unpersist(); throw e
        }
        pinned
      case None => candidates
    }
    // No forced broadcast: the candidate set is bounded only by
    // k·partitions, and k may legitimately be millions — a forced
    // hint would build that on the driver unconditionally. AQE's
    // runtime size-based join selection broadcasts the candidate
    // side exactly when it is actually small (the common case) and
    // falls back to a shuffled semi-join when it is not.
    stream.join(audited, Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "was", "that", "with", "this", "have"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "para"),
    "it" -> Seq("il", "di", "che", "per", "una", "sono", "con", "non"))

  /** Lowercase unicode-alpha token array (langid tokenization). */
  def langTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-zà-ÿ]+"), lit(0))

  /** Language score/pick from a *materialized* token array. A
    * language's score is the number of DISTINCT marker words present
    * (`array_intersect` — native, codegen-friendly; the r2 form used
    * 5 interpreted `filter` lambdas and was 6.5× slower). Ties break
    * by language order (en first); "und" when nothing matches. */
  def langIdOfTokens(toks: Column): Column = {
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(size(array_intersect(toks, lit(markers.toArray))).as("hits"),
        lit(lang).as("lang"))
    }
    // reduce to the max-hits language, first-listed wins ties
    val best = scored.reduce((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") <= 0, "und").otherwise(best.getField("lang"))
  }

  /** Heuristic language ID as one Column expression; on DataFrames
    * prefer [[langIdDF]] (tokenizes once per row). */
  def langId(text: Column): Column = langIdOfTokens(langTokens(text))

  /** Scale-safe language ID: token array materialized behind a
    * projection boundary, scored once. Adds `outCol`. */
  def langIdDF(df: DataFrame, textCol: String,
      outCol: String = "lang_pred"): DataFrame = {
    val keep = df.columns.map(col).toSeq
    df.select(keep :+ langTokens(col(textCol)).as("__toks"): _*)
      .select(keep :+ langIdOfTokens(col("__toks")).as(outCol): _*)
  }

  /** Per-document Unicode SCRIPT profile — the routing signal a
    * multilingual pipeline applies BEFORE language-specific
    * processing (choose tokenizer/segmenter, shard a crawl by
    * writing system, catch mojibake as high `n_other`): exact
    * per-script letter counts for the five big crawl scripts plus
    * the remainder, and the dominant script label (`none` when the
    * doc has no letters; ties break in column order — latin first).
    *
    * Scan work: ONE codegen'd codepoint pass per row
    * ([[ScriptCounts]]), no tokenization, no shuffle. Counts are
    * LETTERS of each script (letter∩script — so `n_other` is
    * non-negative by construction; script-bound digits and marks
    * count nothing). Cross-engine parity: Java's `\p{IsXxx}` and
    * RE2's `\p{Xxx}` both implement the Unicode Script property,
    * the letter intersection replays in RE2 as strip-non-letters-
    * then-count, and the tie-break is a fixed CASE chain any
    * engine replays (the q106 oracle). Output: (idCol, n_latin,
    * n_cyrillic, n_han, n_arabic, n_greek, n_other, script) — one
    * row per input row, null text reads as empty. */
  def scriptProfile(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // ONE codegen pass over the text ([[ScriptCounts]]) — the
    // regexp spelling re-scans every document once per script class
    // (6×), and Java's \p{IsXxx} / \p{L} are by definition
    // Character.UnicodeScript / Character.isLetter membership, so
    // the kernel computes the identical counts. Letters-of-script
    // is a class INTERSECTION RE2 cannot spell directly; the oracle
    // composes it exactly by stripping non-letters first
    // (regexp_replace '[^\p{L}]') and counting the script class on
    // the remainder (q106)
    val counted = df.select(col(idCol),
      graft.functions.GraftFunctions.column(ScriptCounts(
        graft.functions.GraftFunctions.expr(
          coalesce(col(textCol), lit(""))))).as("__sc"))
    val Seq(l, c, h, a, g) = Seq("n_latin", "n_cyrillic", "n_han",
      "n_arabic", "n_greek").map(n => col("__sc").getField(n))
    counted.select(col(idCol),
      l.as("n_latin"), c.as("n_cyrillic"), h.as("n_han"),
      a.as("n_arabic"), g.as("n_greek"),
      (col("__sc").getField("n_letter") - l - c - h - a - g).as("n_other"),
      when(greatest(l, c, h, a, g) === 0, "none")
        .when(l >= c && l >= h && l >= a && l >= g, "latin")
        .when(c >= h && c >= a && c >= g, "cyrillic")
        .when(h >= a && h >= g, "han")
        .when(a >= g, "arabic")
        .otherwise("greek").as("script"))
  }

  /** Attach the full analysis column set — one scan, token arrays
    * materialized once (see class doc). */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val keep = df.columns.map(col).toSeq
    val staged = df.select(keep ++ Seq(
      alphaTokens(t).as("__ltoks"), langTokens(t).as("__lgtoks"),
      tokenCount(t).as("__ntok"), alphaRatio(t).as("__alpha"),
      tokenLenSum(t).as("__sumlen")): _*)
    val metrics = staged.select(keep ++ Seq(
      col("__ntok"), col("__alpha"), col("__lgtoks"),
      subwordCount(t).as("__nsub"), punctRatio(t).as("__punct"),
      stopwordRatioOfTokens(col("__ltoks")).as("__stop"),
      when(col("__ntok") === 0, 0.0)
        .otherwise(col("__sumlen").cast("double") / col("__ntok")).as("__mtl"),
      fingerprint(t).as("__fp")): _*)
    metrics.select(keep ++ Seq(
      col("__ntok").as("n_tokens"),
      col("__nsub").as("n_subwords"),
      round(col("__alpha"), 6).as("alpha_ratio"),
      round(col("__punct"), 6).as("punct_ratio"),
      round(col("__stop"), 6).as("stopword_ratio"),
      round(qualityCombine(col("__ntok"), col("__alpha"), col("__stop"),
        col("__mtl")), 6).as("quality"),
      col("__fp").as("fingerprint"),
      langIdOfTokens(col("__lgtoks")).as("lang_pred")): _*)
  }

  /** Gopher rule-based quality filter (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A1.1) — the NAMED
    * rule set next to [[qualityDF]]'s combined score: per document,
    * the raw metrics each rule thresholds plus the per-rule and
    * overall verdicts, so a pipeline can both filter and audit WHY
    * documents fail. Rules (English-calibrated, as published):
    * 50 ≤ words ≤ 100k; mean word length in [3, 10]; symbol-to-word
    * ratio (`#` + ellipsis) ≤ 0.1; ≤ 90% of lines bullet-started;
    * ≤ 30% of lines ellipsis-ended; ≥ 80% of words contain a Latin
    * letter; ≥ 2 distinct Gopher stopwords present.
    *
    * A "word" is a maximal non-whitespace run (the paper's
    * whitespace tokenization, NOT [[alphaTokens]]); a "line" splits
    * on `\n`. Every metric is a codegen'd `regexp_count`/`length`
    * over explicit byte-range classes (both engines agree), ratios
    * are exact floor-micros via integral `div`; every zero
    * denominator implies a zero numerator (lines ≥ 1 always; a `#`
    * or ellipsis or alpha word IS a non-whitespace run) so
    * `greatest(den, 1)` is exact, not an approximation. Scan speed:
    * no tokenization arrays, no shuffle. Output: `(idCol, n_words,
    * mean_word_len_m, symbol_ratio_m, bullet_frac_m,
    * ellipsis_frac_m, alpha_word_frac_m, n_stop_hits, passes)`
    * with `passes` as 0/1; null text reads as empty (and fails).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val stopHits = GopherStopwords.map(w =>
      (regexp_count(simpleLower(t), lit(s"\\b$w\\b")) > 0).cast("long"))
      .reduce(_ + _)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        // maximal non-whitespace runs; their total length is the
        // text minus its whitespace (no per-token arrays needed)
        regexp_count(t, lit("[^ \\t\\n\\r]+")).cast("long")
          .as("n_words"),
        length(regexp_replace(t, "[ \\t\\n\\r]", "")).cast("long")
          .as("__sum_len"),
        size(split(t, "\n", -1)).cast("long").as("__n_lines"),
        (regexp_count(t, lit("#")) +
          regexp_count(t, lit("\\.\\.\\.|…"))).cast("long")
          .as("__symbols"),
        regexp_count(t, lit("(?m)^[ ]*[-*•]")).cast("long")
          .as("__bullets"),
        regexp_count(t, lit("(?m)(\\.\\.\\.|…)[ ]*$")).cast("long")
          .as("__ell_ends"),
        // a word counts as alphabetic if it contains a Latin letter;
        // the match ends at the word's LAST letter and a next match
        // needs a fresh separator, so no word is counted twice
        // (greedy leftmost scan agrees across Java regex and RE2)
        regexp_count(t,
          lit("(?:^|[ \\t\\n\\r])[^ \\t\\n\\r]*[a-zA-Z]")).cast("long")
          .as("__alpha_words"),
        stopHits.as("n_stop_hits"))
      .select(col(idCol), col("n_words"),
        expr("__sum_len * 1000000 div greatest(n_words, 1)")
          .as("mean_word_len_m"),
        expr("__symbols * 1000000 div greatest(n_words, 1)")
          .as("symbol_ratio_m"),
        expr("__bullets * 1000000 div greatest(__n_lines, 1)")
          .as("bullet_frac_m"),
        expr("__ell_ends * 1000000 div greatest(__n_lines, 1)")
          .as("ellipsis_frac_m"),
        expr("__alpha_words * 1000000 div greatest(n_words, 1)")
          .as("alpha_word_frac_m"),
        col("n_stop_hits"))
      .withColumn("passes",
        (col("n_words").between(50L, 100000L) &&
          col("mean_word_len_m").between(3000000L, 10000000L) &&
          col("symbol_ratio_m") <= 100000L &&
          col("bullet_frac_m") <= 900000L &&
          col("ellipsis_frac_m") <= 300000L &&
          col("alpha_word_frac_m") >= 800000L &&
          col("n_stop_hits") >= 2L).cast("long"))
  }

  /** The Gopher stopword list (Rae et al. 2021 A1.1): a document
    * must contain at least two of these as whole words. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-group BPE FERTILITY — characters per token, the
    * tokenizer-equity metric a multilingual pipeline reads before
    * fixing a vocabulary (a language whose chars-per-token is far
    * below the corpus mean is being shredded into characters and
    * will pay more sequence length for the same text). Characters
    * are the letters the tokenizer actually sees (the `[a-z]+` /
    * unicode token alphabet, not raw text length); token counts
    * are the exact [[bpeTokenCounts]] segmentation under `merges`.
    * Exact floor-micros integral div; a group with zero tokens
    * reads 0.
    *
    * Scale: [[bpeTokenCounts]]'s vocabulary-sized segmentation +
    * one doc-keyed join + a group-keyed partial aggregation —
    * output is group-cardinality.
    *
    * Returns `(groupCol, n_chars, n_bpe, chars_per_token_m)`. */
  def bpeFertility(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      unicode: Boolean = false): DataFrame = {
    val alpha =
      if (unicode) regexp_replace(simpleLower(coalesce(col(textCol), lit(""))),
        "[^\\p{L}\\p{N}]", "")
      else regexp_replace(lower(coalesce(col(textCol), lit(""))),
        "[^a-z]", "")
    val chars = df.filter(col(idCol).isNotNull)
      .select(col(idCol), col(groupCol),
        length(alpha).cast("long").as("__nc"))
    bpeTokenCounts(df, idCol, textCol, merges, unicode)
      .join(chars, Seq(idCol))
      .groupBy(col(groupCol))
      .agg(sum(col("__nc")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe"))
      .withColumn("chars_per_token_m",
        expr("n_chars * 1000000 div greatest(n_bpe, 1)"))
  }

  /** Apply a TRAINED hashed-n-gram linear classifier — the
    * fastText-style quality-filter APPLY step (CCNet/LLaMA-pipeline
    * "keep if the wiki-vs-crawl classifier says wiki"): features are
    * the [[graft.codecs.HashedGramCounts]] histogram (same map DSIR
    * uses), the score is `bias + Σ_b n_b·w_b` in exact integer ppm
    * via the codegen'd broadcast dot
    * ([[graft.codecs.LinearScoreLong]]) — scan speed, zero shuffles,
    * engine-reproducible (the weights arrive ALREADY TRAINED as
    * integers; training a logistic model is upstream/offline work —
    * this operator is the corpus-sized part). Output: (idCol,
    * n_feats, score_ppm, keep) with keep = score ≥ threshold. */
  def linearClassify(df: DataFrame, idCol: String, textCol: String,
      weightsPpm: Seq[Long], biasPpm: Long = 0L,
      thresholdPpm: Long = 0L, n: Int = 2,
      unicode: Boolean = false): DataFrame = {
    import graft.functions.GraftFunctions
    require(weightsPpm.nonEmpty, "linearClassify needs weights")
    val buckets = weightsPpm.length
    df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        GraftFunctions.hashedGramCounts(
          NearDedup.tokens(coalesce(col(textCol), lit("")), unicode),
          n, buckets)
          .as("__fc"))
      .select(col(idCol),
        aggregate(col("__fc"), lit(0L), (a, x) => a + x).as("n_feats"),
        (lit(biasPpm) +
          GraftFunctions.linearScoreLong(col("__fc"),
            weightsPpm.toArray)).as("score_ppm"))
      .withColumn("keep", col("score_ppm") >= thresholdPpm)
  }

  /** DSIR-style hashed n-gram importance score (Xie et al. 2023,
    * arXiv:2302.03169): documents resembling a TARGET corpus more
    * than the source corpus score high. Features are n-gram counts
    * (with multiplicity) hashed into `buckets` —
    * [[graft.codecs.HashedGramCounts]], the paper's feature map —
    * and the score is `Σ_b n_b·(p̂_t(b) − p̂_s(b))` with add-one
    * smoothed bucket frequencies in exact integer ppm. The paper
    * scores `Σ_b n_b·log(p̂_t/p̂_s)`; the ppm DIFFERENCE replaces
    * the log ratio because cross-engine `ln` drifts (libm) while
    * integral ppm reproduces bit-for-bit — same fixed points
    * (score 0 when the distributions agree), monotone per bucket,
    * documented surrogate (the repo's lmScore doctrine).
    *
    * Scale: the corpus never materializes gram strings into an
    * exchange — each doc reduces to a `buckets`-long histogram at
    * scan speed; bucket totals are one partial-aggregated
    * posexplode (≤ buckets·partitions rows) collected bounded;
    * scoring is a codegen'd broadcast dot
    * ([[graft.codecs.LinearScoreLong]]), zero shuffles. The corpus
    * is scanned twice (totals, then scoring) — persist upstream if
    * that matters. Tokenizer/gram conventions are the
    * [[NearDedup]] shingle family's (same `unicode` opt-in,
    * whole-text gram under n tokens).
    *
    * Returns `(idCol, n_feats, score)` — n_feats the doc's gram
    * count, score the signed importance weight (ppm-weighted). */
  def dsirScore(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, n: Int = 2,
      buckets: Int = 256, unicode: Boolean = false): DataFrame = {
    import graft.functions.GraftFunctions
    require(buckets > 0, s"bucket count must be positive (got $buckets)")
    def feats(tc: String): Column =
      GraftFunctions.hashedGramCounts(
        NearDedup.tokens(col(tc), unicode), n, buckets)
    def totals(df: DataFrame): (Array[Long], Long) = {
      val rows = df.select(posexplode(col("__fc")))
        .groupBy(col("pos")).agg(sum(col("col")).as("__s"))
        .collect() // ≤ buckets rows: bounded
      val arr = new Array[Long](buckets)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      (arr, arr.sum)
    }
    val fc = corpus.filter(col(idCol).isNotNull)
      .select(col(idCol), feats(textCol).as("__fc"))
    val (sTot, sAll) = totals(fc)
    val (tTot, tAll) = totals(
      target.select(feats(targetTextCol).as("__fc")))
    val w = Array.tabulate(buckets) { b =>
      1000000L * (tTot(b) + 1L) / (tAll + buckets) -
        1000000L * (sTot(b) + 1L) / (sAll + buckets)
    }
    fc.select(col(idCol),
      GraftFunctions.arraySumLong(col("__fc")).as("n_feats"),
      GraftFunctions.linearScoreLong(col("__fc"), w).as("score"))
  }

  /** Per-document n-gram NOVELTY: the fraction of a document's
    * distinct word n-grams whose FIRST corpus occurrence (minimum
    * id) is this document — the memorization/repetition audit a
    * curriculum or dedup pass reads (a novelty collapse across a
    * crawl snapshot means the new slice is mostly re-crawl; a
    * low-novelty document is mostly assembled from earlier text).
    * Shingle semantics are exactly [[NearDedup.shingleSets]]
    * (distinct n-grams, whole-text shingle under n tokens, same
    * `unicode` opt-in), so novelty composes with the near-dup
    * family's numbers.
    *
    * Scale: the only corpus-sized exchanges carry distinct
    * (gram, doc) pairs — the [[DupSpans]] exchange floor: one
    * gram-keyed partial-aggregated min, one doc-keyed count, then
    * a doc-keyed join of two doc-cardinality frames (no gram-keyed
    * join back). All integer arithmetic; `n_grams >= 1` for every
    * document (the whole-text shingle), so the ppm div is total.
    *
    * Returns `(idCol, n_grams, n_novel, novelty_ppm)`. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, unicode: Boolean = false): DataFrame = {
    val ex = NearDedup.explodeStrings(
      NearDedup.shingleSets(df.filter(col(idCol).isNotNull),
        idCol, textCol, n, unicode), idCol, "sh", "__s")
    val tot = ex.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val nov = ex.groupBy(col("__s"))
      .agg(min(col(idCol)).as(idCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nn"))
    tot.join(nov, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        expr("n_novel * 1000000 div n_grams"))
  }

  /** HTML/markup → text extraction — the crawl-pipeline step that
    * precedes every text filter in this file: strip script/style
    * blocks wholesale, drop comments, turn block-closing tags into
    * line breaks (so [[graft.ops.LineDedup]] still sees line
    * structure), strip remaining tags, decode the six standard
    * entities, and normalize whitespace. A deterministic heuristic
    * extractor — not an HTML5 tree parser (malformed nesting,
    * attribute values containing `>`, and CDATA are out of scope;
    * boilerplate-model extraction belongs to a trafilatura-class
    * tool upstream) — but it is the pure-regex subset BOTH engines
    * replay exactly, every step a codegen'd `regexp_replace` at
    * parquet-scan speed with no tokenization and no shuffle.
    *
    * Entity order is load-bearing: `&lt;`/`&gt;` decode AFTER tag
    * stripping (decoded angle brackets are content, not markup) and
    * `&amp;` decodes LAST (`&amp;lt;` means the literal text
    * `&lt;`). Word-boundary and whitespace classes are spelled as
    * explicit byte ranges so Java regex and RE2 agree. Null
    * propagates (coalesce upstream for the empty-text contract). */
  def stripMarkup(text: Column): Column = {
    val ws = "[ \\t\\n\\r]"
    var c = text
    // script/style content is NOT text — remove before generic tag
    // stripping (their bodies legally contain bare '<')
    c = regexp_replace(c, s"(?is)<script\\b[^>]*>.*?</script$ws*>", " ")
    c = regexp_replace(c, s"(?is)<style\\b[^>]*>.*?</style$ws*>", " ")
    c = regexp_replace(c, "(?s)<!--.*?-->", " ")
    // block-level closers and <br> become line breaks
    c = regexp_replace(c,
      s"(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)$ws*>" +
        s"|<br$ws*/?>", "\n")
    c = regexp_replace(c, "<[^>]*>", " ")
    c = regexp_replace(c, "&nbsp;", " ")
    c = regexp_replace(c, "&lt;", "<")
    c = regexp_replace(c, "&gt;", ">")
    c = regexp_replace(c, "&quot;", "\"")
    c = regexp_replace(c, "&#39;|&apos;", "'")
    c = regexp_replace(c, "&amp;", "&")
    // whitespace normalization: collapse runs, trim around breaks,
    // cap blank runs at one empty line, trim the ends
    c = regexp_replace(c, "[ \\t]+", " ")
    c = regexp_replace(c, "[ ]*\\n[ ]*", "\n")
    c = regexp_replace(c, "\\n{3,}", "\n\n")
    trim(c, " \n")
  }

  /** Per-document CODE-corpus quality profile — the line-structure
    * signals code curation filters on (StarCoder/The-Stack-style
    * rules): line count, longest line, indented-line and
    * comment-line counts, bracket density, and the auto-generated
    * marker every dedup-before-train pipeline drops. All built-in
    * codegen'd string/array expressions over one `split('\n')` —
    * one scan, no shuffle, no UDF; ratios are integer ppm per the
    * repo's determinism convention. The rules are deliberately
    * language-agnostic (comment prefixes cover the //, #, (star),
    * ;, -- families); real pipelines layer per-language configs on
    * the same frame. */
  def codeStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n")
    def nMatching(re: String): Column =
      size(filter(lines, l => l.rlike(re))).cast("long")
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      array_max(transform(lines, l => length(l))).cast("long")
        .as("max_line_len"),
      nMatching("^[ \\t]").as("n_indented"),
      nMatching("^[ \\t]*(//|#|\\*|;|--)").as("n_comment"),
      regexp_count(t, lit("[{}()\\[\\];]")).cast("long")
        .as("n_brackets"),
      t.rlike("(?i)(auto-?generated|do not edit|generated by)")
        .cast("long").as("autogen"))
      .withColumn("indent_ppm",
        expr("n_indented * 1000000 div n_lines"))
      .withColumn("comment_ppm",
        expr("n_comment * 1000000 div n_lines"))
  }

  /** Vocabulary-richness estimates a corpus census reports alongside
    * raw vocab size: Chao1's lower bound on TRUE vocabulary
    * (Chao 1984 — `V + f1(f1−1)/(2(f2+1))`, the bias-corrected form
    * that stays finite when no type occurs twice) and Good–Turing's
    * unseen-probability mass (`f1/N` — the chance the NEXT token is
    * a new type; Gale & Sampson 1995). Both are exact integer
    * rationals here: chao1 ×1000 floor, unseen mass ppm floor.
    * Shape: one distinct-(token) agg for the frequency-of-frequency
    * table, then 1-row arithmetic — the f-of-f exchange is
    * vocabulary-sized, never corpus-sized. */
  def vocabRichness(df: DataFrame, textCol: String, n: Int = 1,
      unicode: Boolean = false): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val toks = if (unicode) unicodeTokens(col(textCol))
               else alphaTokens(col(textCol))
    // n > 1 censuses the n-gram type space (the unigram vocabulary
    // of a synthetic or templated corpus can be tiny while its gram
    // space still has a heavy unseen tail)
    val grams =
      if (n == 1) toks
      else when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i =>
          concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val counts = df.select(explode(grams).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).cast("long").as("__c"))
    counts.agg(sum(col("__c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_milli", lit(1000L) * col("vocab") +
        expr("1000 * f1 * (f1 - 1) div (2 * (f2 + 1))"))
      .withColumn("unseen_ppm",
        expr("1000000 * f1 div n_tokens"))
  }
}

/** `simple_lower(text)` → codepoint-wise Unicode simple lowercase
  * (locale-free `Character.toLowerCase` per codepoint) — the case
  * map DuckDB's utf8proc `lower()` applies, unlike Java/Spark
  * `lower()`'s full mapping. See [[TextAnalysis.simpleLower]]. */
/** `nfc_normalize(text)` → Unicode NFC (canonical composition) —
  * crawl text mixes precomposed and combining-sequence spellings of
  * the same glyph ("é" U+00E9 vs "e"+U+0301), which hash, dedup,
  * shingle and join as DIFFERENT strings until normalized; NFC
  * before fingerprinting closes that dedup-miss class. Java
  * `Normalizer.normalize(_, NFC)` and DuckDB `nfc_normalize`
  * (utf8proc) both implement UAX #15, whose stability policy makes
  * composed forms permanent — so the oracle replay is exact across
  * engines and Unicode versions. The fast path (ASCII / already-
  * composed text) is a quick-check inside the JDK normalizer; cost
  * is one pass per row, no allocation when already normalized. */
case class NfcNormalize(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType

  def compute(in: UTF8String): UTF8String = {
    val s = in.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) in
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

case class SimpleLower(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType

  def compute(in: UTF8String): UTF8String = {
    val s = in.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simpleLower", this,
      classOf[SimpleLower].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "simple_lower"
}

/** `script_counts(text)` → struct of exact per-script LETTER counts
  * in ONE codepoint pass — the kernel behind
  * [[TextAnalysis.scriptProfile]]. `n_<script>` counts codepoints
  * that are BOTH letters (`Character.isLetter`, `\p{L}`) and
  * members of the script (`Character.UnicodeScript`, Java
  * `\p{IsXxx}` / RE2 `\p{Xxx}`); `n_letter` counts all letters —
  * so `n_letter - Σ n_<script>` is non-negative by construction.
  * The oracle replays the intersection by stripping non-letters
  * first (RE2 has no class intersection — q106). */
case class ScriptCounts(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StructType(Seq(
    StructField("n_latin", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_han", LongType, nullable = false),
    StructField("n_arabic", LongType, nullable = false),
    StructField("n_greek", LongType, nullable = false),
    StructField("n_letter", LongType, nullable = false)))

  def compute(in: UTF8String): InternalRow = {
    import java.lang.Character.UnicodeScript
    val s = in.toString
    var l, c, h, a, g, nl = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      // LETTERS only, so n_letter - sum(per-script) is provably
      // non-negative: script-specific non-letters (Arabic-Indic
      // digits Nd, Roman numerals Nl, script-bound marks Mn) carry
      // a script but would not count toward n_letter — counting
      // them per-script underflowed n_other on exactly such text
      if (Character.isLetter(cp)) {
        nl += 1
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN => l += 1
          case UnicodeScript.CYRILLIC => c += 1
          case UnicodeScript.HAN => h += 1
          case UnicodeScript.ARABIC => a += 1
          case UnicodeScript.GREEK => g += 1
          case _ => ()
        }
      }
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](l, c, h, a, g, nl))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scriptCounts", this,
      classOf[ScriptCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "script_counts"
}

/** `apply_bpe(token)` → array<string> BPE symbols under the baked-in
  * ORDERED merge list: character split (by codepoint — a surrogate
  * pair must never be cut), then per merge one greedy left-to-right
  * pass replacing adjacent `(l, r)` with `l+r`. The pass never
  * re-examines a symbol it just produced — the standard BPE apply —
  * and `replace('(l)(r)', '(lr)')` over the delimiter encoding has
  * exactly the same semantics, which is how the q98 DuckDB oracle
  * replays it. Codegen'd tight loop; O(merges × symbols) per row. */
case class ApplyBpe(child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)]) // Seq, not Array: case-class equality
                                   // must be structural for Catalyst
                                   // CSE/canonicalization to dedupe
                                   // identical segmentations
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val mergeArr: Array[(String, String)] =
    merges.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(tok: UTF8String): GenericArrayData =
    new GenericArrayData(ApplyBpe.segment(tok.toString, mergeArr)
      .map(UTF8String.fromString(_): Any))

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("applyBpe", this, classOf[ApplyBpe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "apply_bpe"
}

object ApplyBpe {
  /** The ONE BPE apply loop ([[ApplyBpe]] per-token, [[ApplyBpeTokens]]
    * per-array): codepoint split, then per merge one greedy
    * left-to-right pass. */
  private[ops] def segment(s: String,
      mergeArr: Array[(String, String)]): Array[String] = {
    var segs: Array[String] =
      s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var m = 0
    while (m < mergeArr.length) {
      val (l, r) = mergeArr(m)
      val out = new Array[String](segs.length)
      var o = 0
      var i = 0
      while (i < segs.length) {
        if (i + 1 < segs.length && segs(i) == l && segs(i + 1) == r) {
          out(o) = l + r; o += 1; i += 2
        } else { out(o) = segs(i); o += 1; i += 1 }
      }
      segs = java.util.Arrays.copyOf(out, o)
      m += 1
    }
    segs
  }
}

/** `apply_bpe_tokens(tokens)` → array<string>: the per-DOCUMENT
  * encode — every token of the input array segmented under the
  * baked-in merge list ([[ApplyBpe]] semantics), symbols concatenated
  * in token order. One codegen pass per row, zero joins/shuffles —
  * the scale shape for ENCODING: the output is token-stream-sized no
  * matter what, so per-row work is the floor (counting-only callers
  * want [[TextAnalysis.bpeTokenCounts]], which dedups segmentation
  * over the vocabulary instead). */
case class ApplyBpeTokens(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val mergeArr: Array[(String, String)] =
    merges.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val segs = ApplyBpe.segment(toks.getUTF8String(i).toString, mergeArr)
      var j = 0
      while (j < segs.length) { out += UTF8String.fromString(segs(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("applyBpeTokens", this,
      classOf[ApplyBpeTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "apply_bpe_tokens"
}

/** Unigram-LM Viterbi segmentation (Kudo 2018, the SentencePiece
  * unigram model's ENCODE step — the other tokenizer family next to
  * BPE): one token segments into vocabulary pieces minimizing the
  * total integer piece cost (a trained model's `-log p` scaled to
  * integers by the caller — integer costs are what make the DP
  * engine-exact; two candidate splits differing in the last float
  * ulp is precisely the nondeterminism this library refuses).
  *
  * DP over codepoints, O(len·maxPieceLen) per token. Any single
  * codepoint absent from the vocabulary is an UNK piece at
  * `unkCost` (coverage is total, nothing is dropped). Tie-break,
  * fixed and documented: lower total cost, then fewer pieces, then
  * the LONGEST last piece (applied recursively through the DP —
  * accepting equal keys at increasing length implements it).
  *
  * Training is out of scope by design: unigram training is EM over
  * the same Viterbi (feasible on this kernel) but every production
  * pipeline we target applies a PRE-TRAINED vocabulary; costs
  * arrive via [[TextAnalysis.unigramVocabFromDF]]. */
case class UnigramSegmentTokens(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    pieces: Seq[(String, Long)], // Seq: structural equality for CSE
    unkCost: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  require(pieces.nonEmpty, "empty unigram vocabulary")
  require(pieces.forall(_._1.nonEmpty), "empty piece")
  require(pieces.map(_._1).distinct.size == pieces.size,
    "duplicate pieces in vocabulary")
  // costs are -log p scaled to integers — non-negative by
  // construction; a negative unkCost would disable segment()'s
  // cost >= 0 reachability gate and surface as an opaque
  // StringIndexOutOfBounds during path reconstruction, so misuse
  // must fail HERE with a message naming the contract
  require(unkCost >= 0, s"unkCost must be >= 0 (got $unkCost): " +
    "unigram costs are scaled -log p, never negative")
  require(pieces.forall(_._2 >= 0),
    "negative piece cost: unigram costs are scaled -log p, never " +
      s"negative (got ${pieces.filter(_._2 < 0).take(3)})")

  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }
  @transient private lazy val maxPieceCp: Int =
    pieces.map(p => p._1.codePointCount(0, p._1.length)).max

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(toks: ArrayData): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val segs = UnigramSegmentTokens.segment(
        toks.getUTF8String(i).toString, vocab, maxPieceCp, unkCost)
      var j = 0
      while (j < segs.length) { out += UTF8String.fromString(segs(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this,
      classOf[UnigramSegmentTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "unigram_segment_tokens"
}

object UnigramSegmentTokens {
  /** Viterbi over codepoints. best/pieces/back arrays; acceptance at
    * strictly-better (cost, pieces) or equal keys at LONGER length
    * implements the documented tie-break. */
  private[ops] def segment(tok: String,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceCp: Int, unkCost: Long): Array[String] = {
    if (tok.isEmpty) return Array.empty
    val cps = tok.codePoints().toArray
    val n = cps.length
    val INF = Long.MaxValue / 4
    val best = Array.fill(n + 1)(INF)
    val np = Array.fill(n + 1)(Int.MaxValue / 4)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L; np(0) = 0
    var i = 1
    while (i <= n) {
      var len = 1
      val maxL = math.min(maxPieceCp, i)
      while (len <= maxL) {
        val sub = new String(cps, i - len, len)
        val c = vocab.get(sub)
        val cost: Long =
          if (c != null) c.longValue()
          else if (len == 1) unkCost
          else -1L
        if (cost >= 0 && best(i - len) < INF) {
          val nc = best(i - len) + cost
          val npc = np(i - len) + 1
          if (nc < best(i) || (nc == best(i) && npc < np(i)) ||
              (nc == best(i) && npc == np(i))) {
            best(i) = nc; np(i) = npc; back(i) = i - len
          }
        }
        len += 1
      }
      i += 1
    }
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      segs += new String(cps, j, pos - j)
      pos = j
    }
    segs.reverse.toArray
  }
}
