package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide exact LINE-level deduplication — the C4 /
  * RefinedWeb-family boilerplate cleanup that [[DupSpans]]'
  * token-gram splice does not express: navigation menus, cookie
  * banners, copyright footers and share buttons repeat byte-for-byte
  * as whole LINES across millions of pages, and the standard
  * intervention is "a line occurring more than `maxOccurrences`
  * times in the corpus keeps only its first occurrence" (or none).
  * Complements [[DupSpans.removeSpans]] (token n-grams, unaligned
  * spans) — line dedup catches structured boilerplate at line
  * granularity without touching prose that merely shares phrases.
  *
  * Beyond-reference LLM-pipeline operator (no counterpart in the
  * reference tree; the line unit follows C4's and RefinedWeb's
  * published line-level filters).
  */
object LineDedup {

  /** Remove corpus-duplicated lines from every document.
    *
    * A LINE is a maximal `\n`-free substring (split on `\n`, no
    * trimming — the byte content is the identity). Lines shorter
    * than `minLineChars` characters are EXEMPT: they never count
    * and are never removed (the default 1 exempts only empty
    * lines — without this, blank separator lines would dedup away
    * and silently reflow every document). A participating line
    * occurrence is removed iff its exact content occurs more than
    * `maxOccurrences` times corpus-wide AND (`keepFirst`) it is not
    * the corpus-first occurrence in `(id, pos)` order; with
    * `keepFirst=false` every occurrence of an over-threshold line
    * is removed (the RefinedWeb spelling). Survivors re-join with
    * `\n` — untouched lines are preserved byte-for-byte, including
    * empty lines and trailing-newline artifacts.
    *
    * `idCol` must be unique per document (the [[Dedup]] /
    * [[DupSpans]] id contract — duplicate ids would corrupt both
    * the first-occurrence order and the reconstruction join); null
    * ids are dropped, null text reads as empty. Output: one row per
    * input document, `(idCol, n_lines, n_removed, clean_text)` —
    * the [[DupSpans]] cleaned-projection convention at line unit.
    *
    * Scale shape (the q94 sparse-removal pattern): occurrences are
    * fingerprinted AT THE SCAN (`md5(line)`), so the one
    * corpus-sized exchange — the count/rank window partitioned by
    * fingerprint — carries only `(fp, id, pos)`, never line text;
    * per-fingerprint groups are duplicate-family-sized. Out of that
    * exchange flows ONLY the removed `(id, pos)` set — sparse in
    * any real corpus (most lines are unique). The per-doc removal
    * lists group on that sparse set, and the final join back to the
    * documents is removal-sized against the corpus (AQE broadcasts
    * it on the common path); reconstruction is a per-row indexed
    * `filter` over the re-split text at parquet-scan speed. No
    * corpus-sized shuffle ever carries document content.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long = 1L, minLineChars: Int = 1,
      keepFirst: Boolean = true): DataFrame = {
    require(maxOccurrences >= 1,
      s"maxOccurrences must be >= 1 (got $maxOccurrences): every " +
        "line occurs at least once, so 0 would remove all " +
        "participating lines")
    require(minLineChars >= 0,
      s"minLineChars must be >= 0 (got $minLineChars)")
    val docs = df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        split(coalesce(col(textCol), lit("")), "\n", -1).as("__ls"))
    // participating occurrences, fingerprinted at the scan: the
    // window exchange below carries (fp, id, pos) — 3 narrow
    // columns — instead of full line text
    val occ = docs
      .select(col(idCol), posexplode(col("__ls")).as(Seq("__p0", "__ln")))
      .filter(length(col("__ln")) >= minLineChars)
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__pos"),
        md5(col("__ln")).as("__fp"))
    val byFp = Window.partitionBy(col("__fp"))
    val firstOrder = byFp.orderBy(col(idCol), col("__pos"))
    val overCap = occ
      .withColumn("__n", count(lit(1)).over(byFp))
      .withColumn("__rn", row_number().over(firstOrder))
      .filter(col("__n") > maxOccurrences)
    val removed =
      (if (keepFirst) overCap.filter(col("__rn") > 1) else overCap)
        .select(col(idCol), col("__pos"))
    val remByDoc = removed.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__rm"))
    docs.join(remByDoc, Seq(idCol), "left")
      .withColumn("__rm",
        coalesce(col("__rm"), array().cast("array<bigint>")))
      .select(col(idCol),
        size(col("__ls")).cast("long").as("n_lines"),
        size(col("__rm")).cast("long").as("n_removed"),
        array_join(filter(col("__ls"),
          (x: Column, i: Column) =>
            !array_contains(col("__rm"), (i + 1).cast("long"))),
          "\n").as("clean_text"))
  }

  /** Corpus-wide line frequency report — the inspection companion to
    * [[dedupLines]]: every participating line content occurring more
    * than `maxOccurrences` times, with its corpus count, character
    * length, and first-occurrence document. Feed it to a reviewer
    * before committing to a removal threshold. One representative
    * line string per fingerprint travels to the output (min over
    * occurrences — deterministic); map-side partial aggregation
    * compresses the exchange to one (fp, line, count) per distinct
    * fingerprint per input partition — duplicate families collapse
    * before they shuffle. Output:
    * `(line, n_occurrences, n_chars, first_id)`, over-threshold
    * rows only. */
  def duplicatedLines(df: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long = 1L, minLineChars: Int = 1): DataFrame = {
    require(maxOccurrences >= 1,
      s"maxOccurrences must be >= 1 (got $maxOccurrences)")
    val occ = df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n", -1))
          .as(Seq("__p0", "__ln")))
      .filter(length(col("__ln")) >= minLineChars)
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__pos"),
        col("__ln"))
    occ.groupBy(md5(col("__ln")).as("__fp"))
      .agg(min(col("__ln")).as("line"),
        count(lit(1)).as("n_occurrences"),
        min(struct(col(idCol), col("__pos"))).as("__first"))
      .filter(col("n_occurrences") > maxOccurrences)
      .select(col("line"),
        col("n_occurrences"),
        length(col("line")).cast("long").as("n_chars"),
        col("__first").getField(idCol).as("first_id"))
  }
}
