package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT set-similarity self-join with prefix filtering (Chaudhuri,
  * Ganti & Kaushik 2006; Bayardo, Ma & Srikant 2007 — the machinery
  * behind "find ALL near-duplicate pairs above Jaccard θ", where
  * MinHash-LSH ([[NearDedup]]) only finds them with high
  * probability). The prefix-filter theorem: order every set by one
  * global token order and keep each set's first
  * `|s| - ceil(θ·|s|) + 1` tokens; any two sets with Jaccard ≥ θ
  * MUST share a prefix token — so the candidate join keys on prefix
  * tokens only, and exact Jaccard verification prunes the rest.
  * Completeness is a theorem, not a probability: this is the exact
  * counterpart used when a dedup audit must certify "no pair above θ
  * was missed".
  *
  * The global order is (document frequency asc, token) — rarest
  * first, the standard choice: rare prefix tokens mean tiny join
  * buckets, which is the entire scale story. All threshold
  * arithmetic is integer ppm (`ceil(θn) = (θppm·n + 999999) div
  * 1e6`), engine-reproducible.
  *
  * Scale shape: token sets and df are two map-side-combined aggs;
  * prefixes explode at most `(1-θ)|s|+1` rows per set; the candidate
  * join keys on (rare) prefix tokens, with a `maxBucket` cap on
  * pathological hub tokens (dropping a bucket sacrifices
  * completeness ONLY for pairs whose every shared prefix token is a
  * hub — counted and knowable from the prefix table; default keeps
  * everything). Verification joins the two set arrays back by id —
  * id-keyed, candidate-sized. */
object SetSim {

  /** All unordered id pairs (id_a < id_b) whose DISTINCT-token
    * Jaccard (in ppm) is ≥ `thetaPpm`, with the intersection size
    * and exact `jacc_ppm` attached. Tokens come from
    * [[TextAnalysis.alphaTokens]] over `textCol`. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      thetaPpm: Long, maxBucket: Int = Int.MaxValue): DataFrame = {
    require(thetaPpm > 0 && thetaPpm <= 1000000,
      s"thetaPpm must be in (0, 1e6] (got $thetaPpm)")
    require(maxBucket >= 2, s"maxBucket must be >= 2 (got $maxBucket)")
    val toks = df.select(col(idCol).as("id"),
        explode(TextAnalysis.alphaTokens(col(textCol))).as("tok"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // per-set token array in (df asc, tok) global order
    val sets = toks.join(dfreq, "tok")
      .groupBy(col("id"))
      .agg(transform(sort_array(collect_list(
          struct(col("df"), col("tok")))), s => s.getField("tok"))
        .as("ts"))
      .withColumn("n", size(col("ts")))
      // prefix length: n - ceil(theta*n) + 1
      .withColumn("plen",
        col("n") - expr(s"($thetaPpm * n + 999999) div 1000000") + 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sets.count()
    toks.unpersist()
    val prefix = sets.select(col("id"),
      explode(slice(col("ts"), lit(1), col("plen"))).as("tok"))
    val okTok = prefix.groupBy(col("tok"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucket)
      .select(col("tok"))
    val p = prefix.join(okTok, "tok")
    val cand = p.as("x").join(p.as("y"),
        col("x.tok") === col("y.tok") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("ts").as("__ta"),
        col("n").as("__na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("ts").as("__tb"),
        col("n").as("__nb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("jacc_ppm", expr(
        "(inter * 1000000L) div (__na + __nb - inter)"))
      .filter(col("jacc_ppm") >= thetaPpm)
      .select(col("id_a"), col("id_b"), col("inter"), col("jacc_ppm"))
  }
}
