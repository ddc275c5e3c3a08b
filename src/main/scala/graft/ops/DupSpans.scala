package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  def spanCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"span width must be positive (got $n)")
    val grams = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol), TextAnalysis.alphaTokens(col(textCol)).as("__t"))
      .withColumn("__len", size(col("__t")))
      .filter(col("__len") >= n)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__len") - n)).as("__s"))
      .select(col(idCol),
        concat_ws(" ", slice(col("__t"), col("__s") + 1, lit(n))).as("gram"))
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
}
