package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array machinery — the exact-substring path of
  * the dedup family (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better": ExactSubstr builds a suffix array over
  * the corpus and walks rank-adjacent suffixes for long shared
  * prefixes). The gram-based span family ([[DupSpans]]) approximates
  * this with fixed-width shingles; this module computes the REAL
  * suffix order, distributed.
  *
  * Scale design — prefix doubling (Manber–Myers, the classic
  * O(n log n) construction re-expressed in joins):
  *   - round 0 ranks fixed-width prefix blocks (32 chars — the
  *     block strings order exactly like 32-char suffix prefixes, so
  *     the doubling starts at width 32 and skips five rounds);
  *   - round m replaces each suffix's key by the integer PAIR
  *     (rank of its first w chars, rank of the next w chars) and
  *     re-ranks, doubling w — after ceil(log2(maxLen/32)) rounds
  *     the ranks order full suffixes lexicographically.
  * Strings are touched ONLY in round 0; every later round shuffles
  * fixed-width integer tuples — at 100 TB no long-string comparison
  * ever crosses the wire, which is the whole point vs sorting
  * suffix strings directly. Each round is: the pairing self-join on
  * (doc, pos), then ONE range shuffle assigning dense ranks
  * ([[Ranking.withDenseRank]], r19 — replacing the
  * distinct → global-index → join-back shape that shuffled the full
  * table three times per round). Rounds pin their frame as
  * an InternalRow RDD ([[Dedup.clusters]]' lineage-truncation idiom)
  * so the plan tree stays flat, and stop early once every suffix
  * holds a distinct rank (one tiny agg action per round).
  *
  * Suffixes are DOC-CONFINED (a suffix never runs past its
  * document's end): ranks follow lexicographic order where a suffix
  * that is a proper prefix of another sorts first (missing
  * continuation ranks as -1, below every real rank). Equal suffix
  * strings — within or across documents — receive equal (dense)
  * ranks, so the output matches `dense_rank() OVER (ORDER BY
  * suffix)` computed by any engine with bytewise string collation.
  *
  * Reference behavior anchor: dedup span semantics per
  * `/root/reference/README.rst`-era petastorm has no suffix ops;
  * this is part of the beyond-reference LLM-pipeline layer.
  */
object SuffixArray {

  /** (idCol, pos, rnk): 1-based dense global rank of the suffix of
    * `substring(textCol, 1, maxLen)` starting at 1-based `pos`,
    * under corpus-wide lexicographic order. Empty/null texts yield
    * no rows. */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int, maxRounds: Int = 40): DataFrame =
    suffixRanksCounted(docs, idCol, textCol, maxLen, maxRounds)._1

  /** [[suffixRanks]] plus the suffix-row count the construction
    * already pays for (the round-0 pin's count action) — callers
    * that SIZE-SWITCH on the suffix table ([[crossDocShared]]) read
    * it here instead of paying a second count. */
  private[ops] def suffixRanksCounted(docs: DataFrame, idCol: String,
      textCol: String, maxLen: Int,
      maxRounds: Int = 40): (DataFrame, Long) = {
    require(maxLen >= 1, s"maxLen must be >= 1 (got $maxLen)")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // per-round lineage truncation ([[ColumnBridge.pinned]])
    def pin(df: DataFrame)
        : (DataFrame,
           org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) =
      ColumnBridge.pinned(df)
    // Round 0 ranks fixed-width prefix BLOCKS (32 chars), not single
    // characters: block strings sort exactly like the suffixes'
    // first min(32, len) chars (a shorter block is a prefix of a
    // longer one only when the suffix itself ends — and prefix-
    // shorter sorts first in both orders; the argument is width-
    // independent), so starting the doubling at width 32 is correct
    // and skips five rounds. This is the last time a string column
    // exists. Width trade (r19, guide §1.2/§2.3): each skipped
    // integer round saves THREE full-table shuffles + two actions,
    // while round 0 — the one string pass that exists anyway — only
    // carries 16 more chars per suffix through its one exchange; at
    // maxLen 128–200 (the declared queries) that is one fewer round
    // for a ~2× byte increase in a pass that is not the bottleneck.
    val initWidth = math.min(32, maxLen)
    val blocks = docs
      .select(col(idCol).as("__doc"),
        substring(col(textCol), 1, maxLen).as("__t"))
      .filter(col("__t").isNotNull && length(col("__t")) >= 1)
      .select(col("__doc"),
        explode(sequence(lit(1), length(col("__t")))).as("pos"),
        col("__t"))
      .select(col("__doc"), col("pos"),
        expr(s"substring(__t, pos, $initWidth)").as("__blk"))
    // Round 0 plans under the CALLER's session at full width (it is
    // the one corpus-sized string pass); the integer doubling rounds
    // then run on a conf-scoped session with parallelism sized to
    // the SUFFIX TABLE (~250k rows per partition): at sf-small the
    // fixed per-stage scheduling of 32-way shuffles dominated the
    // round cost (the Dedup.clusters graph-width discipline), while
    // billions of suffixes keep the session's full width.
    val spark = docs.sparkSession
    val (r0, r0Rdd) = pin(denseRank(blocks, Seq("__blk"))
      .select(col("__doc"), col("pos"), col("__rnk")))
    val total = r0Rdd.count()
    val roundParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      total / 250000L + 1L)).toInt
    val scoped = graft.GraftSession.scoped(spark, roundParts)
    var cur = ColumnBridge.internalCreateDataFrame(scoped, r0Rdd, r0.schema)
    var curRdd = r0Rdd
    var distinctRanks = cur.agg(
      (max(col("__rnk")) + 1).as("d")).head().getLong(0)
    var width = initWidth.toLong
    var rounds = 0
    var plateau = false
    while (distinctRanks < total && !plateau && width < maxLen.toLong &&
        rounds < maxRounds) {
      // continuation rank: the CURRENT rank of the suffix `width`
      // positions later in the same doc; absent (suffix shorter than
      // 2*width) ranks below everything.
      val right = cur.select(col("__doc").as("__d2"),
        (col("pos") - width).as("__p2"), col("__rnk").as("__r2"))
      val paired = cur.join(right,
          col("__doc") === col("__d2") && col("pos") === col("__p2"),
          "left")
        .select(col("__doc"), col("pos"), col("__rnk").as("__r1"),
          coalesce(col("__r2"), lit(-1L)).as("__r2"))
      val next = pin(denseRank(paired, Seq("__r1", "__r2"))
        .select(col("__doc"), col("pos"), col("__rnk")))
      curRdd.unpersist()
      cur = next._1; curRdd = next._2
      val d = cur.agg((max(col("__rnk")) + 1).as("d")).head().getLong(0)
      // ranks only ever SPLIT (the pair key refines the partition),
      // so an unchanged class count means no pair split this round —
      // a fixed point: the remaining ties are exact duplicate
      // suffixes that no wider window can separate. Stop.
      plateau = d == distinctRanks
      distinctRanks = d
      width *= 2
      rounds += 1
    }
    // Ties can legitimately remain (identical suffix strings); once
    // width covers maxLen the ranks ARE the dense suffix order.
    // Rewrap onto the CALLER's session so downstream plans keep its
    // full width (the Dedup.clusters exit discipline).
    (ColumnBridge.internalCreateDataFrame(spark, curRdd, cur.schema)
      .select(col("__doc").as(idCol), col("pos").cast("long").as("pos"),
        (col("__rnk") + 1).as("rnk")), total)
  }

  /** Dense 0-based rank of `keyCols` tuples appended as `__rnk` —
    * ONE range shuffle of the full table ([[Ranking.withDenseRank]];
    * r19 replaced the distinct → global-index → join-back shape,
    * which shuffled the table three times per doubling round). */
  private def denseRank(df: DataFrame, keyCols: Seq[String]): DataFrame =
    Ranking.withDenseRank(df, keyCols, "__rnk")

  /** Longest repeated substring per document — the intra-document
    * repetition signal, exact (vs [[TextAnalysis]]'s gram-based
    * repetition ratios): max common prefix of rank-adjacent suffixes
    * within each doc. One row per doc with >= 2 suffix positions in
    * the first `maxLen` chars; `lrs` is 0 when nothing repeats.
    *
    * Scale: suffixes of one doc sort inside that doc's window
    * partition (docs are bounded-length by contract — truncation to
    * `maxLen` enforces it), so there is no global sort and no
    * single-task window; the LCP kernel ([[CommonPrefixLen]]) is a
    * codegen'd code-point scan. */
  def longestRepeat(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int): DataFrame = {
    require(maxLen >= 2, s"maxLen must be >= 2 (got $maxLen)")
    val sufs = docs
      .select(col(idCol).as("__doc"),
        substring(col(textCol), 1, maxLen).as("__t"))
      .filter(col("__t").isNotNull && length(col("__t")) >= 2)
      .select(col("__doc"),
        explode(sequence(lit(1), length(col("__t")))).as("pos"),
        col("__t"))
      .withColumn("__suf", expr("substring(__t, pos)"))
    val w = Window.partitionBy(col("__doc"))
      .orderBy(col("__suf"), col("pos"))
    sufs.withColumn("__prev", lag(col("__suf"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__doc").as(idCol))
      .agg(max(commonPrefixLen(col("__suf"), col("__prev"))).as("lrs"))
  }

  /** Cross-document duplicated-substring CERTIFICATES — the
    * cross-document half of the ExactSubstr dedup story (the
    * Lee-et-al detector for verbatim text reuse between sources):
    * scan the doc-changing adjacencies of suffix order and report,
    * per certified doc pair, the longest adjacency-certified shared
    * substring >= minLen.
    *
    * Contract (the suffix-array adjacency facts, spec-verified):
    *  - SOUND: a reported (a, b, l) means docs a and b literally
    *    share an l-char substring (the LCP of two real suffixes).
    *  - CORPUS-MAX EXACT: max(lcp) over the output equals the true
    *    longest substring shared by ANY two distinct docs (every
    *    suffix-order path between docs crosses a doc-changing
    *    adjacency whose LCP >= the pair's LCP).
    *  - DOC-COVERING: every doc that shares >= minLen chars with
    *    any other doc appears in at least one reported pair
    *    (walking from its suffix through the shared block, the
    *    first doc change has the walked doc on its left).
    *  - NOT pair-complete: when 3+ docs share a run, a pair
    *    separated by other docs in suffix order may go unreported
    *    or report a shorter certificate — like LSH banding, the
    *    output is a candidate/certificate covering of duplicated
    *    TEXT, not the quadratic pair closure (which is Θ(n²) for n
    *    identical docs and exactly what a dedup pipeline must NOT
    *    materialize at scale).
    *
    * Scale design: suffix order comes from [[suffixRanks]] (integer
    * prefix doubling); global adjacency comes from
    * [[Ranking.withGlobalIndex]] over (rnk, doc, pos) — integer
    * keys, no string sort. Suffix STRINGS are materialized once,
    * shuffled once onto the doc-changing boundary pairs for the
    * codegen'd LCP verify — ≤ 2·maxLen chars per boundary, the
    * documented exchange floor (the rank-table binary-lifting LCP
    * would avoid even that at 8× the join rounds; not worth it at
    * bounded maxLen).
    *
    * Output: (doc_a, doc_b, lcp), doc_a < doc_b, certified shared
    * length >= minLen, over the first `maxLen` chars of each doc. */
  def crossDocShared(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int, minLen: Int): DataFrame = {
    require(minLen >= 1 && minLen <= maxLen,
      s"need 1 <= minLen <= maxLen, got $minLen/$maxLen")
    val (ranks, nSuffixes) =
      suffixRanksCounted(docs, idCol, textCol, maxLen)
    val idx = Ranking.withGlobalIndex(ranks,
      Seq(col("rnk"), col(idCol), col("pos")), "__idx")
    val pairs0 = idx
      .select(col(idCol).as("__da"), col("pos").as("__pa"), col("__idx"))
      .join(idx.select(col(idCol).as("__db"), col("pos").as("__pb"),
        (col("__idx") - 1).as("__idx")), Seq("__idx"))
      .filter(col("__da") =!= col("__db"))
    val sufs = docs
      .select(col(idCol).as("__doc"),
        substring(col(textCol), 1, maxLen).as("__t"))
      .filter(col("__t").isNotNull && length(col("__t")) >= 1)
      .select(col("__doc"),
        explode(sequence(lit(1), length(col("__t")))).as("__pos"),
        col("__t"))
      .select(col("__doc"), col("__pos").cast("long").as("__pos"),
        expr("substring(__t, __pos)").as("__suf"))
    // SIZE SWITCH (guide §2.3 / §8: shuffle keys, not payloads, once
    // the payload is the bill): the two verify joins below shuffle
    // the FULL suffix-string table twice. Below the threshold that
    // is cheaper than any reduction (measured r19: the semi-join
    // orchestration LOST at sf0.1 — 9.7 s vs 8.8 s, so the declared
    // queries keep this arm); above it the strings dominate the
    // exchanges, so the boundary-pair POSITIONS (integer keys) first
    // semi-join-reduce the suffix table to the ~2 rows per boundary
    // the LCP verify actually reads, and only the reduced strings
    // ever shuffle. The extra pairs0 references re-run integer-only
    // subplans over the PINNED ranks RDD — deliberately cheaper at
    // scale than double-shuffling corpus-sized strings, and no
    // persist means no session-lifetime cache to leak.
    val stringsOnce = nSuffixes > docs.sparkSession.conf
      .get("spark.graft.crossDocStringsOnceRows", (64L << 20).toString)
      .toLong
    val (pairs, sufA, sufB) =
      if (!stringsOnce) (pairs0, sufs, sufs)
      else {
        val needed = pairs0.select(col("__da").as("__doc"),
            col("__pa").as("__pos"))
          .unionByName(pairs0.select(col("__db").as("__doc"),
            col("__pb").as("__pos")))
          .distinct()
        val slim = sufs.join(needed, Seq("__doc", "__pos"), "left_semi")
        (pairs0, slim, slim)
      }
    pairs
      .join(sufA.select(col("__doc").as("__da"), col("__pos").as("__pa"),
        col("__suf").as("__sa")), Seq("__da", "__pa"))
      .join(sufB.select(col("__doc").as("__db"), col("__pos").as("__pb"),
        col("__suf").as("__sb")), Seq("__db", "__pb"))
      .select(least(col("__da"), col("__db")).as("doc_a"),
        greatest(col("__da"), col("__db")).as("doc_b"),
        commonPrefixLen(col("__sa"), col("__sb")).as("__l"))
      .groupBy(col("doc_a"), col("doc_b")).agg(max(col("__l")).as("lcp"))
      .filter(col("lcp") >= minLen)
  }

  /** Length (in code points) of the common prefix of two strings —
    * see [[CommonPrefixLen]]. */
  def commonPrefixLen(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.column(CommonPrefixLen(
      graft.functions.GraftFunctions.expr(a),
      graft.functions.GraftFunctions.expr(b)))
}

/** `common_prefix_len(a, b)` → BIGINT count of leading code points
  * equal in both strings. Code points (not UTF-16 units, not bytes)
  * so the count matches engines that index strings by character
  * (DuckDB `substr`/`length` semantics) on any plane. */
case class CommonPrefixLen(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, LongType}
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = LongType

  def compute(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    var i = 0; var n = 0L
    while (i < la && i < lb) {
      val ca = a.codePointAt(i)
      if (ca != b.codePointAt(i)) return n
      // surrogate pairs advance two UTF-16 units but count once
      i += Character.charCount(ca)
      n += 1L
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("commonPrefixLen", this,
      classOf[CommonPrefixLen].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "common_prefix_len"
}
