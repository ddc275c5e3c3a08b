package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Duplicated-span coverage: for every document, the fraction of its
  * token n-gram positions whose n-gram also occurs in at least one
  * OTHER document — the per-document "how much of me is boilerplate"
  * signal behind substring-level training-data dedup (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better":
  * duplicated spans are removed, not whole near-dup docs). The
  * reference's dedup story stops at whole-row/near-dup granularity;
  * this is the span-granularity member of the same family
  * ([[Dedup]] exact rows, [[NearDedup]] MinHash/SimHash docs).
  *
  * Scale shape (exact, no sampling): positional n-grams are scan
  * work (one tokenize per row, slices behind a projection boundary,
  * same as [[Chunk]]); they are immediately compressed to
  * (gram, doc, count) by a hash aggregate whose map side collapses
  * within-doc repeats, so the only corpus-sized exchange carries
  * distinct (gram, doc) pairs — the floor for any exact formulation
  * (Lee et al. reach the same floor with a single-machine suffix
  * array; at cluster scale the gram shuffle IS the suffix array).
  * Cross-doc detection is min(doc)!=max(doc) over a gram window on
  * the compressed pairs — no self-join, no second scan of the
  * positional grams; a window group is one gram's doc list, already
  * distinct. The final rollup shuffles doc-sized rows. A hot
  * boilerplate gram makes a wide window group (its doc list); if a
  * corpus has grams shared by a large fraction of ALL docs, cap the
  * study with a stopgram filter upstream — the operator itself never
  * buffers more than one gram's distinct-doc list.
  *
  * Docs with fewer than `n` tokens have no spans and emit no row
  * (coverage of an empty span set is undefined, not zero). Rows with
  * a null id are dropped up front: identity is the unit of the study,
  * and min/max over a gram window would otherwise silently fold all
  * null-id rows into one pseudo-document AND un-flag a gram shared
  * between a null-id row and exactly one real document (min=max=the
  * real id) — consistent with the non-null-id contract of the other
  * id-keyed ops ([[Dedup]], [[NearDedup]], [[Chunk]]).
  *
  * Output: (idCol, n_spans, n_dup, dup_ratio_m) — span counts with
  * multiplicity, ratio floored to integer micros via exact integer
  * division (`div`), bit-reproducible across engines like
  * [[TextAnalysis.repetitionStats]]'s ppm columns.
  */
object DupSpans {

  /** (idCol, __s, gram) from a [[tokenized]] frame: every 0-based
    * n-gram start position of every doc with ≥ n tokens — the ONE
    * positional-gram definition [[spanCoverage]] and [[removeSpans]]
    * share, so the measure and the intervention can never disagree
    * on what a span is. Scan work over the token column: slices
    * behind a projection boundary. */
  private def gramsOfTokenized(tk: DataFrame, idCol: String,
      n: Int): DataFrame =
    tk.withColumn("__len", size(col("__t")))
      .filter(col("__len") >= n)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__len") - n)).as("__s"))
      .select(col(idCol), col("__s"),
        concat_ws(" ", slice(col("__t"), col("__s") + 1, lit(n))).as("gram"))

  private def positionalGrams(df: DataFrame, idCol: String,
      textCol: String, n: Int, unicode: Boolean): DataFrame = {
    require(n >= 1, s"span width must be positive (got $n)")
    gramsOfTokenized(tokenized(df, idCol, textCol, unicode), idCol, n)
  }

  def spanCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int, unicode: Boolean = false): DataFrame = {
    require(n >= 1, s"span width must be positive (got $n)")
    val grams = positionalGrams(df, idCol, textCol, n, unicode)
    // compress to distinct (gram, doc) + positional multiplicity:
    // the map-side partial agg folds within-doc repeats before the
    // exchange, so the shuffle carries pairs, not positions
    val pairs = grams.groupBy(col("gram"), col(idCol))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("gram"))
    pairs
      .withColumn("__dup",
        min(col(idCol)).over(w) =!= max(col(idCol)).over(w))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_spans"),
        sum(when(col("__dup"), col("__c")).otherwise(0L)).as("n_dup"))
      .select(col(idCol), col("n_spans"), col("n_dup"),
        // n_spans > 0 is guaranteed by the __len >= n filter
        expr("n_dup * 1000000 div n_spans").as("dup_ratio_m"))
  }

  /** 0-based starts of n-gram positions whose gram ALREADY OCCURRED
    * earlier in the same token array (ascending) — one pass with a
    * seen-set, O(len·n). */
  def repeatedStarts(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    // decode each token ONCE (each participates in up to n grams;
    // per-gram getUTF8String.toString would allocate n× per token)
    val ts = new Array[String](len)
    var t = 0
    while (t < len) { ts(t) = toks.getUTF8String(t).toString; t += 1 }
    val seen = new java.util.HashSet[String]()
    val out = new Array[Long](len - n + 1)
    var o = 0
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s + n <= len) {
      sb.setLength(0)
      var i = s
      while (i < s + n) {
        if (i > s) sb.append(' ')
        sb.append(ts(i))
        i += 1
      }
      if (!seen.add(sb.toString)) { out(o) = s.toLong; o += 1 }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  /** (idCol, __t): non-null-id rows with the normalized token array,
    * null text as empty — the shared removal-input stage. `unicode`
    * selects the tokenizer ([[TextAnalysis.alphaTokens]] two-arg
    * form): without the opt-in, span removal silently no-ops on
    * non-Latin docs — zero tokens, nothing to remove. */
  private def tokenized(df: DataFrame, idCol: String,
      textCol: String, unicode: Boolean): DataFrame =
    df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        TextAnalysis.alphaTokens(coalesce(col(textCol), lit("")), unicode)
          .as("__t"))

  /** The removal ops' shared output contract: (idCol, n_tokens,
    * n_removed, clean_text) from (__t, __clean). */
  private def cleanedProjection(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
      size(col("__t")).cast("long").as("n_tokens"),
      (size(col("__t")) - size(col("__clean"))).cast("long")
        .as("n_removed"),
      array_join(col("__clean"), " ").as("clean_text"))

  /** INTRA-document duplicated-span removal — the Gopher-family
    * "repeated passages within one document" cleanup complementing
    * [[removeSpans]]'s cross-document intervention: every token
    * position covered by an n-gram span whose gram already occurred
    * EARLIER in the same document is dropped (the first occurrence
    * survives), and the survivors re-join into the cleaned text.
    * Same unit and output contract as [[removeSpans]] (normalized
    * alpha-token stream; null text reads as empty; null-id rows
    * dropped; one output row per surviving input row).
    *
    * Scale shape: everything is per-row — repeated-gram starts come
    * from ONE codegen'd seen-set pass ([[RepeatedGramStarts]]) and
    * the splice is the shared two-pointer kernel. ZERO shuffles,
    * zero joins: at 100 TB this runs at parquet scan speed, the
    * strongest possible plan (the relational spelling would window
    * over (doc, gram) and exchange every position). */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, unicode: Boolean = false): DataFrame = {
    require(n >= 1, s"span width must be positive (got $n)")
    import graft.functions.GraftFunctions.{column => cexp, expr => eexp}
    cleanedProjection(
      tokenized(df, idCol, textCol, unicode)
        .withColumn("__st", cexp(RepeatedGramStarts(eexp(col("__t")), n)))
        .withColumn("__clean",
          cexp(SpliceOutSpans(eexp(col("__t")), eexp(col("__st")), n))),
      idCol)
  }

  /** Two-pointer splice: tokens NOT covered by any span `[s, s+n)`
    * for the SORTED starts — O(len + starts), one pass. */
  def splice(toks: ArrayData, starts: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val s = starts.numElements()
    val out = new Array[Any](len)
    var o = 0
    var j = 0
    var coverEnd = 0L // exclusive end of the merged covering interval
    var i = 0L
    while (i < len) {
      while (j < s && starts.getLong(j) <= i) {
        val e = starts.getLong(j) + n
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (i >= coverEnd) { out(o) = toks.getUTF8String(i.toInt); o += 1 }
      i += 1
    }
    new GenericArrayData(out.take(o))
  }

  /** Duplicated-span REMOVAL — the actual Lee et al. 2022
    * intervention [[spanCoverage]] only measures: every token
    * position covered by a duplicated n-gram span is dropped, and
    * the survivors are re-joined into the cleaned text. The unit is
    * the normalized alpha-token stream (the same unit the coverage
    * measure and the gram table use), so `clean_text` is the
    * SPACE-JOINED SURVIVING TOKENS, not the original text with its
    * original whitespace/punctuation — the downstream consumer is a
    * tokenizer-bound training pipeline, for which the token stream
    * IS the document.
    *
    * Scale shape: the dup-gram table reuses [[spanCoverage]]'s floor
    * (the distinct (gram, doc) exchange); recovering WHICH positions
    * are covered then re-derives positional grams (the
    * nominate/recount shape of [[TextAnalysis.frequentTerms]] —
    * three tokenize scans total, which SCALE, in exchange for
    * keeping every exchange gram-pair-sized, which would NOT)
    * semi-joined against the dup-gram set: AQE broadcasts that set
    * when it is small (the common case); a corpus whose
    * duplicated-gram set is itself enormous pays a positional-gram
    * shuffle — the honest floor for exact positional removal.
    * When the TOKENIZED corpus fits the cluster, pass
    * `persistTokens` to pin the (id, tokens) stage across the
    * gram/recovery/splice stages instead: the text column is
    * tokenized exactly ONCE (spec-asserted) and the three scans
    * become cache reads. The cache lives as long as the returned
    * frame is in use — callers drop it with
    * `spark.catalog.clearCache()` (or let the session end), the same
    * lifecycle as [[graft.sources.SparkConverter]] handles.
    * Per-doc splicing merges each doc's covered intervals in ONE
    * codegen'd two-pointer pass ([[SpliceOutSpans]]); the collected
    * start list is bounded by the doc's own length, like the token
    * array itself.
    *
    * Docs with fewer than `n` tokens have no spans and pass through
    * uncleaned (n_removed = 0); null-id rows are dropped
    * ([[spanCoverage]] contract); a null TEXT reads as empty (0
    * tokens, clean_text '') — the contract the q94 oracle's
    * `coalesce` spells, instead of null-propagating into a
    * cross-engine '' vs NULL mismatch. Output: (idCol, n_tokens,
    * n_removed, clean_text), one row per surviving input row —
    * counts exact integers, so the whole result is
    * bit-reproducible. */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, unicode: Boolean = false,
      persistTokens: Option[org.apache.spark.storage.StorageLevel] = None)
      : DataFrame = {
    require(n >= 1, s"span width must be positive (got $n)")
    val tk = tokenized(df, idCol, textCol, unicode)
    val toks = persistTokens.map(tk.persist).getOrElse(tk)
    val grams = gramsOfTokenized(toks, idCol, n)
    val dupGrams = grams.select(col("gram"), col(idCol)).distinct()
      .groupBy(col("gram"))
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select(col("gram"))
    spliceAgainst(toks, grams, dupGrams, idCol, n)
  }

  /** Shared splice tail of [[removeSpans]]/[[removeSharedSpans]]:
    * positions of `grams` whose gram is in `badGrams` are spliced
    * out of `toks`. */
  private def spliceAgainst(toks: DataFrame, grams: DataFrame,
      badGrams: DataFrame, idCol: String, n: Int): DataFrame = {
    val dupStarts = grams.join(badGrams, Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__s").cast("long"))).as("__st"))
    val clean = graft.functions.GraftFunctions.column(
      SpliceOutSpans(
        graft.functions.GraftFunctions.expr(col("__t")),
        graft.functions.GraftFunctions.expr(
          coalesce(col("__st"), array().cast("array<bigint>"))), n))
    cleanedProjection(
      toks.join(dupStarts, Seq(idCol), "left")
        .withColumn("__clean", clean),
      idCol)
  }

  /** Cross-CORPUS span removal — decontamination SURGERY: every
    * token position of `df` covered by an n-gram that occurs
    * anywhere in `reference` (a benchmark / eval set) is spliced
    * out, and the survivors re-join into the cleaned text. The
    * doc-level alternative ([[NearDedup.contamination]] /
    * `bloomContamination` + drop) discards a whole document for one
    * quoted benchmark passage; this keeps the document and excises
    * exactly the leaked spans (the Lee et al. splice applied to
    * eval-set leakage). Same unit and output contract as
    * [[removeSpans]].
    *
    * Scale shape: the reference's DISTINCT gram set is
    * benchmark-sized — for real benchmarks orders of magnitude
    * smaller than the corpus — so AQE broadcasts it and the corpus
    * side never shuffles: tokenize → per-row gram starts → splice,
    * at parquet-scan speed. A corpus-sized reference degrades to a
    * hash semi-join on gram (the honest floor). `persistTokens`
    * trades the two corpus tokenize scans for one, as in
    * [[removeSpans]]. */
  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, n: Int,
      unicode: Boolean = false,
      persistTokens: Option[org.apache.spark.storage.StorageLevel] = None)
      : DataFrame = {
    require(n >= 1, s"span width must be positive (got $n)")
    val tk = tokenized(df, idCol, textCol, unicode)
    val toks = persistTokens.map(tk.persist).getOrElse(tk)
    val grams = gramsOfTokenized(toks, idCol, n)
    val refGrams = gramsOfTokenized(
      reference.select(lit(0L).as("__rid"),
        TextAnalysis.alphaTokens(coalesce(col(refTextCol), lit("")), unicode)
          .as("__t")),
      "__rid", n)
      .select(col("gram")).distinct()
    spliceAgainst(toks, grams, refGrams, idCol, n)
  }
}

/** `repeated_gram_starts(tokens)` → array<long>: ascending 0-based
  * starts of n-gram positions whose gram already occurred earlier in
  * the SAME array — the per-row candidate generator behind
  * [[DupSpans.removeRepeatedSpans]]; codegen'd seen-set pass, no
  * shuffle, no join. */
case class RepeatedGramStarts(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"span width must be positive (got $n)")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    DupSpans.repeatedStarts(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.DupSpans.repeatedStarts($c, $n);")
  override protected def withNewChildInternal(c: Expression)
      : RepeatedGramStarts = copy(child = c)
  override def prettyName: String = "repeated_gram_starts"
}

/** `splice_out_spans(tokens, starts)` → array<string>: the tokens
  * whose 0-based position is covered by NO span `[s, s+n)`, `starts`
  * sorted ascending — the codegen'd single pass behind
  * [[DupSpans.removeSpans]] (the HOF spelling is an interpreted
  * lambda pair per token × per start). */
case class SpliceOutSpans(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1, s"span width must be positive (got $n)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(toks: Any, starts: Any): Any =
    DupSpans.splice(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.ops.DupSpans.splice($t, $s, $n);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SpliceOutSpans = copy(left = l, right = r)
  override def prettyName: String = "splice_out_spans"
}
