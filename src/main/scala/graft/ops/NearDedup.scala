package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash
  * signatures with LSH banding for candidate generation, exact
  * n-gram-Jaccard verification on the candidates, and SimHash
  * fingerprints.
  *
  * Scale shape (the non-negotiable at 100 TB): candidates come from a
  * self-join on *band keys* — docs only ever meet if they share a
  * band bucket, so the join is a hash shuffle on band_key and nothing
  * compares all pairs. Signatures are built relationally (explode
  * shingles → hash-aggregate minima), which gives map-side partial
  * combine and keeps md5 evaluation out of interpreted higher-order
  * lambdas. Every derived array (tokens, shingles, hashes) is
  * materialized behind a projection boundary before reuse — Spark's
  * higher-order functions are not codegen'd and get no common-
  * subexpression elimination, so an unshared `tokens(text)` inside a
  * lambda re-runs the regex once per element (measured 100× blowup).
  *
  * Every hash is md5-derived and deterministic across engines,
  * partitionings, and cluster sizes — the DuckDB oracle reproduces
  * signatures exactly. Hash family h (0-based) reads hex chars
  * `[8·(h mod 4), 8·(h mod 4)+8)` of `md5((h div 4) + ":" + shingle)`
  * as a uint32 — four 32-bit hashes per md5 call.
  */
object NearDedup {

  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Tokenizer selector: every shingle-family op threads a
    * `unicode: Boolean = false` opt-in down to this point — `false`
    * keeps the historical `[a-z0-9]+` ASCII tokenizer, `true`
    * switches to [[TextAnalysis.unicodeTokens]] (`[\p{L}\p{N}]+`),
    * without which CJK/Cyrillic/Arabic text tokenizes to nothing and
    * dedup silently no-ops on it. Same md5 hash families either way;
    * only the token alphabet changes. */
  def tokens(text: Column, unicode: Boolean): Column =
    if (unicode) TextAnalysis.unicodeTokens(text) else tokens(text)

  /** Distinct word n-gram shingles from a *materialized* token-array
    * column; docs shorter than n tokens yield one whole-text shingle.
    * Codegen'd one-pass [[graft.codecs.ShingleArray]] (the HOF
    * spelling ran interpreted transform+concat_ws per token). */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    graft.functions.GraftFunctions.column(graft.codecs.ShingleArray(
      graft.functions.GraftFunctions.expr(toks), n))

  /** Convenience single-column form — only safe on top of a
    * materialized token column; see class doc. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(tokens(text), n)

  /** (id, sh: array<string>) — per-doc distinct shingle sets, with
    * the token array materialized behind a projection boundary. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, unicode: Boolean = false): DataFrame =
    df.select(col(idCol), tokens(col(textCol), unicode).as("__toks"))
      .select(col(idCol), shinglesOfTokens(col("__toks"), shingleN).as("sh"))

  /** Explode an (id, array<string>) frame through a typed flatMap
    * boundary instead of `explode`: Spark's Generate over an
    * interpreted (HOF-built) array expression re-evaluates it
    * per OUTPUT element — measured 23× slower than this on the
    * shingle pipeline. Deserializing to objects forces exactly one
    * materialization of the array per input row; the flatMap itself
    * is plain iterator code, still fully parallel, no shuffle. */
  private[ops] def explodeStrings(df: DataFrame, idCol: String,
      arrCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val slim = df.select(col(idCol), col(arrCol))
    val outSchema = StructType(Seq(
      slim.schema.fields(0), StructField(outCol, StringType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    slim.flatMap { r =>
      // a null array (null text upstream — the shingle kernels
      // null-propagate) contributes no rows instead of NPE-ing the
      // whole job; a no-text document simply cannot pair
      if (r.isNullAt(1)) Iterator.empty
      else {
        val id = r.get(0)
        r.getSeq[String](1).iterator.map(v => Row(id, v))
      }
    }
  }

  /** (id, sig: array<long>) — k-element MinHash signatures, built
    * relationally: explode shingles, one md5 per hash *group* (4
    * family members per md5), hash-aggregate the minima. One shuffle
    * on id with map-side partial min. */
  def signatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleN: Int = 3, unicode: Boolean = false): DataFrame = {
    require(k % 4 == 0, s"k must be a multiple of 4 (got $k)")
    val groups = k / 4
    val exploded = explodeStrings(
      shingleSets(df, idCol, textCol, shingleN, unicode), idCol, "sh", "__s")
    val withMd5 = exploded.select(col(idCol) +:
      (0 until groups).map(g =>
        md5(concat(lit(g.toString), lit(":"), col("__s"))).as(s"__m$g")): _*)
    val mins = (0 until k).map { h =>
      val (g, o) = (h / 4, h % 4)
      min(conv(substring(col(s"__m$g"), o * 8 + 1, 8), 16, 10).cast("long"))
        .as(s"__h$h")
    }
    withMd5.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(h => col(s"__h$h")): _*).as("sig"))
  }

  /** LSH band keys from a signature column: `bands` buckets of `rows`
    * slots each, rendered `bandIdx|v_v_..`. Two docs collide on a
    * band iff their signature agrees on all `rows` slots. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      concat(j.cast("string"), lit("|"),
        concat_ws("_", transform(slice(sig, j * rows + 1, lit(rows)),
          v => v.cast("string")))))

  /** Candidate near-dup pairs via banded MinHash (id_a < id_b,
    * distinct). Explode bands → self-join on band key → distinct:
    * never all-pairs.
    *
    * `maxBucket` caps band-bucket width (standard LSH practice): N
    * degenerate docs (empty/boilerplate text → one whole-text shingle
    * → identical signature) would otherwise meet in ONE bucket and go
    * N²/2 — the residual skew bomb at 100 TB. Buckets wider than the
    * cap are dropped entirely — including any GENUINE duplicate
    * cluster wider than the cap, which then reports no pairs. The
    * drop is measurable, not silent: [[droppedBandBuckets]] lists
    * every capped bucket and its width from the same pipeline; check
    * it (or raise `maxBucket`) when coverage matters more than skew
    * protection. The width check is a band_key-partitioned window
    * count, which rides the same hash exchange the self-join needs
    * (ReusedExchange) — the cap costs no extra pass. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, rows: Int = 4,
      shingleN: Int = 3, maxBucket: Int = 1000,
      unicode: Boolean = false): DataFrame = {
    require(bands * rows <= k, s"bands*rows (${bands * rows}) > k ($k)")
    val capped = cappedBands(df, idCol, textCol, k, bands, rows, shingleN,
      maxBucket, keepOver = false, unicode)
    val a = capped.select(col(idCol).as("id_a"), col("band_key"))
    val b = capped.select(col(idCol).as("id_b"), col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The observability counterpart of [[candidatePairs]]'s cap: every
    * band bucket WIDER than `maxBucket` (i.e. whose members produced
    * no pairs), as (band_key, width). Empty output = full coverage. */
  def droppedBandBuckets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, rows: Int = 4,
      shingleN: Int = 3, maxBucket: Int = 1000,
      unicode: Boolean = false): DataFrame =
    cappedBands(df, idCol, textCol, k, bands, rows, shingleN, maxBucket,
      keepOver = true, unicode)
      .groupBy(col("band_key")).agg(count(lit(1)).as("width"))

  /** Bucket-width cap — the file's standard skew guard in ONE place:
    * keep rows whose `keyCol` bucket holds ≤ `maxBucket` rows
    * (`keepOver = true` inverts: the observability face listing what
    * the cap dropped). The partitionBy window count rides the same
    * hash exchange the downstream self-join needs (ReusedExchange),
    * so the cap costs no extra pass. */
  private def capBuckets(df: DataFrame, keyCol: String, maxBucket: Int,
      keepOver: Boolean): DataFrame = {
    val widthOf = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol)))
    val withC = df.withColumn("__bc", widthOf)
    (if (keepOver) withC.filter(col("__bc") > maxBucket)
     else withC.filter(col("__bc") <= maxBucket)).drop("__bc")
  }

  private def cappedBands(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, rows: Int, shingleN: Int, maxBucket: Int,
      keepOver: Boolean, unicode: Boolean = false): DataFrame = {
    val ex = signatures(df, idCol, textCol, k, shingleN, unicode)
      .select(col(idCol), explode(bandKeys(col("sig"), bands, rows)).as("band_key"))
    capBuckets(ex, "band_key", maxBucket, keepOver)
  }

  /** Exact n-gram Jaccard for given (id_a, id_b) pairs — the verify
    * stage after LSH candidate generation. Adds `jaccard` ∈ [0,1].
    *
    * The shingle table is rebuilt from the corpus for each join side
    * (scan is cheap and columnar) rather than semi-joining the corpus
    * down to candidate ids first — deriving the id list from `pairs`
    * would execute the whole signature pipeline a second time, which
    * costs more than the re-tokenization it saves (measured). Callers
    * verifying against a *pre-materialized* pair list get the narrow
    * semi-join shape for free by passing a read-back `pairs`. */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3,
      unicode: Boolean = false): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, shingleN, unicode)
      .withColumnRenamed(idCol, "__id")
    pairs
      .join(sh.select(col("__id").as("id_a"), col("sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("sh").as("__shb")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("__sha"), col("__shb"))).cast("double") /
          size(array_union(col("__sha"), col("__shb"))))
      .drop("__sha", "__shb")
  }

  /** Candidate pairs + exact Jaccard, optionally thresholded. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.0, k: Int = 16, bands: Int = 4,
      rows: Int = 4, shingleN: Int = 3, maxBucket: Int = 1000,
      unicode: Boolean = false): DataFrame = {
    val pairs = candidatePairs(df, idCol, textCol, k, bands, rows, shingleN,
      maxBucket, unicode)
    jaccardVerify(pairs, df, idCol, textCol, shingleN, unicode)
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exploded LSH band keys per doc — the table an INCREMENTAL dedup
    * pipeline PERSISTS (e.g. via `Materialize`): tomorrow's batch
    * joins its own bands against the stored corpus bands and never
    * re-hashes the corpus. (id, band_key), `bands` rows per doc. */
  def bandTable(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, rows: Int = 4,
      shingleN: Int = 3, unicode: Boolean = false): DataFrame = {
    require(bands * rows <= k, s"bands*rows (${bands * rows}) > k ($k)")
    signatures(df, idCol, textCol, k, shingleN, unicode)
      .select(col(idCol),
        explode(bandKeys(col("sig"), bands, rows)).as("band_key"))
  }

  /** Candidate near-dup pairs between a NEW batch and an existing
    * corpus band table — the daily-ingest shape: work is
    * O(new batch + matched buckets), never corpus×corpus and never a
    * corpus re-hash. `corpusBands` is a [[bandTable]] output (live or
    * read back from a store). The bucket-width cap applies to the
    * CORPUS side — the unbounded one at 100 TB, where a boilerplate
    * bucket accretes forever; the new batch is operationally bounded
    * (one ingest). Output: (id_new, id_corpus) distinct; a doc
    * present in both inputs matches itself (callers filter ids). */
  def incrementalPairs(newDf: DataFrame, corpusBands: DataFrame,
      idCol: String, textCol: String, k: Int = 16, bands: Int = 4,
      rows: Int = 4, shingleN: Int = 3, maxBucket: Int = 1000,
      unicode: Boolean = false): DataFrame = {
    val nb = bandTable(newDf, idCol, textCol, k, bands, rows, shingleN,
      unicode)
      .select(col(idCol).as("id_new"), col("band_key"))
    val cb = capBuckets(corpusBands, "band_key", maxBucket,
        keepOver = false)
      .select(col(idCol).as("id_corpus"), col("band_key"))
    nb.join(cb, Seq("band_key"))
      .select(col("id_new"), col("id_corpus")).distinct()
  }

  /** Exact shingle-Jaccard verification of candidate (id_new,
    * id_corpus) pairs against the two sides' texts, integer ppm
    * (floor) — the ONE home of the verify formula, shared by the
    * batch incremental path and the streaming ingest
    * ([[graft.streaming.GraftStream.nearDupIngest]]) so the two can
    * never drift. */
  private[graft] def verifyPairsJaccardPpm(pairs: DataFrame,
      newDf: DataFrame, corpusDocs: DataFrame, idCol: String,
      textCol: String, shingleN: Int,
      unicode: Boolean = false): DataFrame = {
    val shNew = shingleSets(newDf, idCol, textCol, shingleN, unicode)
      .select(col(idCol).as("id_new"), col("sh").as("__sha"))
    val shCor = shingleSets(corpusDocs, idCol, textCol, shingleN, unicode)
      .select(col(idCol).as("id_corpus"), col("sh").as("__shb"))
    pairs.join(shNew, Seq("id_new")).join(shCor, Seq("id_corpus"))
      // EXACT integer ppm (i·1e6 div u) — the [[jaccardJoin]] and
      // oracle convention; the former double-multiply floor was off
      // by one ulp at exact-boundary ratios (41/80 → 512499 vs the
      // true 512500), so a threshold set at the exact value could
      // drop a pair that meets it
      .withColumn("jaccard_ppm", expr(
        "CAST(size(array_intersect(__sha, __shb)) AS BIGINT) " +
          "* 1000000L DIV " +
          "CAST(size(array_union(__sha, __shb)) AS BIGINT)"))
      .select(col("id_new"), col("id_corpus"), col("jaccard_ppm"))
  }

  /** [[incrementalPairs]] + exact Jaccard verification across the two
    * inputs, integer ppm (floor), optionally thresholded. The verify
    * touches only matched docs on each side. */
  def incrementalNearDuplicates(newDf: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, minJaccardPpm: Long = 0L,
      k: Int = 16, bands: Int = 4, rows: Int = 4, shingleN: Int = 3,
      maxBucket: Int = 1000, unicode: Boolean = false): DataFrame = {
    val pairs = incrementalPairs(newDf,
      bandTable(corpus, idCol, textCol, k, bands, rows, shingleN, unicode),
      idCol, textCol, k, bands, rows, shingleN, maxBucket, unicode)
    verifyPairsJaccardPpm(pairs, newDf, corpus, idCol, textCol, shingleN,
      unicode)
      .filter(col("jaccard_ppm") >= minJaccardPpm)
  }

  /** EXACT set-similarity self-join (recall 1.0) via prefix
    * filtering — the AllPairs/PPJoin family (Bayardo et al., WWW'07;
    * Xiao et al., WWW'08): every pair of documents whose shingle-set
    * Jaccard is ≥ `minJaccardPpm`/1e6, with the exact similarity.
    * The guaranteed-recall complement of [[nearDuplicates]]: MinHash
    * banding trades recall for speed; this path misses nothing, and
    * cuts the candidate space by the prefix-filter principle instead
    * of hashing.
    *
    * Order every doc's shingles by ascending corpus frequency
    * (rarest first, ties by value — a total order, since per-doc
    * shingles are distinct) and keep only the first
    * `|s| − ceil(t·|s|) + 1` ("prefix"). Any two docs with J ≥ t
    * share a prefix shingle: J(A,B) ≥ t forces
    * |A∩B| ≥ ceil(t·max(|A|,|B|)), and the smallest common shingle
    * under the global order cannot sit in either doc's suffix — a
    * suffix holds only ceil(t·|s|)−1 slots, fewer than the
    * intersection that must fit at-or-after it. Candidates therefore
    * come from an equi-join on PREFIX shingles only. This is also
    * why the join resists skew by construction: hot boilerplate
    * shingles sort to the END of frequency order and almost never
    * enter a prefix, so the band-bucket skew bomb that
    * [[candidatePairs]] needs a cap for cannot form here.
    *
    * Scale shape — the tokenize+shingle pipeline is evaluated exactly
    * ONCE: corpus shingle frequency is attached with a window count
    * over the shingle key (riding the one hash exchange the pipeline
    * needs anyway, the [[candidatePairs]] cap trick) instead of a
    * separate vocabulary agg + join, which would re-run the pipeline;
    * a per-doc hash agg then sorts/slices the prefix. Every
    * downstream consumer (both prefix-join sides, both verify sides)
    * hangs off that agg's exchange, which Spark's ReuseExchange
    * dedupes. Candidates come from the equi-join on prefix shingles
    * (+ a size filter: min(|A|,|B|) ≥ ceil(t·max) prunes before
    * verification); the verify reuses the agg's own sorted shingle
    * arrays — the corpus text is never re-read. Nothing is ever
    * all-pairs.
    *
    * Output: (id_a, id_b, jaccard_ppm), id_a < id_b, exact integer
    * ppm (floor). Pairs sharing no shingle at all are never
    * candidates — correct for any t > 0 since their Jaccard is 0. */
  /** The AllPairs/PPJoin shared substrate: per doc, its DISTINCT
    * shingles in the GLOBAL rarest-first order (corpus frequency
    * asc, value asc — a total order since per-doc shingles are
    * distinct). BOTH prefix-filter joins' losslessness proofs assume
    * the two sides use this identical order and the identical
    * integer-ceil prefix arithmetic — extracting the substrate makes
    * drift between them impossible. Output: (idCol, __n, __ord). */
  private def freqOrderedDocs(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, unicode: Boolean): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, shingleN, unicode)
    val ex = explodeStrings(sh, idCol, "sh", "__s")
    val wByShingle = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s"))
    ex.withColumn("__df", count(lit(1)).over(wByShingle))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__df"), col("__s"))))
        .as("__sorted"))
      .select(col(idCol),
        size(col("__sorted")).cast("long").as("__n"),
        col("__sorted").getField("__s").as("__ord"))
  }

  /** Prefix length n − ceil(t·n) + 1; ceil in pure integer
    * arithmetic: (t_ppm·n + 999999) div 1e6. */
  private def prefixLen(tPpm: Long): Column =
    (col("__n") - expr(s"(__n * ${tPpm}L + 999999) div 1000000")
      + lit(1L)).cast("int")

  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      minJaccardPpm: Long = 500000L, shingleN: Int = 3,
      unicode: Boolean = false): DataFrame = {
    require(minJaccardPpm > 0 && minJaccardPpm <= 1000000L,
      s"minJaccardPpm must be in (0, 1e6] (got $minJaccardPpm)")
    val docs = freqOrderedDocs(df, idCol, textCol, shingleN, unicode)
    val pfxLen = prefixLen(minJaccardPpm)
    // posexplode over a materialized attribute (slice of the
    // projected array) — never a Generate over an interpreted
    // expression. The 1-based position feeds the positional filter.
    val pfx = docs
      .select(col(idCol), col("__n"), slice(col("__ord"), lit(1), pfxLen)
        .as("__pfx"))
      .select(col(idCol), col("__n"), posexplode(col("__pfx")))
      .select(col(idCol), col("__n"), (col("pos") + 1).cast("long").as("__p"),
        col("col").as("__s"))
    val a = pfx.select(col(idCol).as("id_a"), col("__n").as("__na"),
      col("__p").as("__pa"), col("__s"))
    val b = pfx.select(col(idCol).as("id_b"), col("__n").as("__nb"),
      col("__p").as("__pb"), col("__s"))
    // PPJoin positional filter (lossless): common shingles all sit at
    // or after the matched positions under the shared global order,
    // so overlap ≤ min(na−pa, nb−pb)+1; J ≥ t needs overlap ≥
    // ceil(t·(na+nb)/(1+t)) — integer cross-multiplied. A pair's
    // FIRST common shingle is in both prefixes (the prefix-principle
    // witness) and bounds overlap tightest from the left, so a
    // qualifying pair always survives through that match (2.5×
    // candidate cut measured). Sizes are functions of the ids, so the
    // distinct carries them; union size is then |A|+|B|−|A∩B| and the
    // verify pays one array_intersect, never an array_union.
    val cand = a.join(b, Seq("__s"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("__na"), col("__nb")) * 1000000L >=
        lit(minJaccardPpm) * greatest(col("__na"), col("__nb")))
      .filter((least(col("__na") - col("__pa"), col("__nb") - col("__pb"))
        + lit(1L)) * lit(1000000L + minJaccardPpm) >=
        lit(minJaccardPpm) * (col("__na") + col("__nb")))
      .select("id_a", "id_b", "__na", "__nb").distinct()
    cand
      .join(docs.select(col(idCol).as("id_a"), col("__ord").as("__sha")),
        Seq("id_a"))
      .join(docs.select(col(idCol).as("id_b"), col("__ord").as("__shb")),
        Seq("id_b"))
      .withColumn("__i",
        size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .withColumn("__u", col("__na") + col("__nb") - col("__i"))
      .withColumn("jaccard_ppm", expr("__i * 1000000 div __u"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("id_a"), col("id_b"), col("jaccard_ppm"))
  }

  /** EXACT asymmetric containment join (recall 1.0): every ORDERED
    * pair (container, contained) with
    * `|sh(a) ∩ sh(b)| / |sh(b)| ≥ t` — quote inclusion, boilerplate
    * wrapping, and doc-inside-doc detection, which symmetric Jaccard
    * structurally misses (a page embedded in a 100× larger page has
    * tiny Jaccard but containment 1.0). The LSH band path misses
    * those pairs for the same reason, so candidates come from the
    * prefix principle instead (the containment member of the
    * AllPairs/PPJoin family, cf. JOSIE/PEL): the CONTAINED side can
    * afford to miss only `nb − ceil(t·nb)` of its shingles, so it
    * must share one of its `nb − ceil(t·nb) + 1` rarest; that prefix
    * joins the container side's FULL shingle stream (a container's
    * prefix cannot be bounded without knowing |b|). Rarest-first
    * global order keeps stop-shingles out of every prefix — the same
    * skew-resistance-by-construction as [[jaccardJoin]] — and two
    * positional filters (`overlap ≤ size − pos + 1` on each side)
    * prune before the distinct. Verify pays one `array_intersect`
    * per surviving pair. Output: (id_a container, id_b contained,
    * contain_ppm), both directions when both qualify, never self. */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      minContainPpm: Long = 900000L, shingleN: Int = 3,
      unicode: Boolean = false): DataFrame = {
    require(minContainPpm > 0 && minContainPpm <= 1000000L,
      s"minContainPpm must be in (0, 1e6] (got $minContainPpm)")
    val docs = freqOrderedDocs(df, idCol, textCol, shingleN, unicode)
    val pfxLen = prefixLen(minContainPpm)
    val contained = docs
      .select(col(idCol), col("__n"), slice(col("__ord"), lit(1), pfxLen)
        .as("__pfx"))
      .select(col(idCol), col("__n"), posexplode(col("__pfx")))
      .select(col(idCol).as("id_b"), col("__n").as("__nb"),
        (col("pos") + 1).cast("long").as("__pb"), col("col").as("__s"))
    val container = docs
      .select(col(idCol), col("__n"), posexplode(col("__ord")))
      .select(col(idCol).as("id_a"), col("__n").as("__na"),
        (col("pos") + 1).cast("long").as("__pa"), col("col").as("__s"))
    val cand = container.join(contained, Seq("__s"))
      .filter(col("id_a") =!= col("id_b"))
      // overlap ≥ ceil(t·nb) must fit both suffixes past the match
      .filter((col("__na") - col("__pa") + lit(1L)) * 1000000L >=
        lit(minContainPpm) * col("__nb"))
      .filter((col("__nb") - col("__pb") + lit(1L)) * 1000000L >=
        lit(minContainPpm) * col("__nb"))
      .select("id_a", "id_b", "__nb").distinct()
    cand
      .join(docs.select(col(idCol).as("id_a"), col("__ord").as("__sha")),
        Seq("id_a"))
      .join(docs.select(col(idCol).as("id_b"), col("__ord").as("__shb")),
        Seq("id_b"))
      .withColumn("__i",
        size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .withColumn("contain_ppm", expr("__i * 1000000 div __nb"))
      .filter(col("contain_ppm") >= minContainPpm)
      .select(col("id_a"), col("id_b"), col("contain_ppm"))
  }

  /** 32-bit SimHash from a *materialized* array of 32-bit token
    * hashes (token frequency is the weight). Bit j is 1 iff the sum
    * over tokens of ±1 (bit j of the token hash) is positive.
    * Codegen'd one-pass [[graft.codecs.SimHash32]]; the per-bit HOF
    * spelling walked the array 32× interpreted. */
  def simhashOfHashes(hashes: Column): Column =
    graft.functions.GraftFunctions.column(graft.codecs.SimHash32(
      graft.functions.GraftFunctions.expr(hashes)))

  /** md5-derived 32-bit hashes of each token. */
  def tokenHashes(text: Column, unicode: Boolean = false): Column =
    transform(tokens(text, unicode), t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  /** (id, simhash) with the hash array materialized once per row. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame =
    df.select(col(idCol), tokenHashes(col(textCol), unicode).as("__hs"))
      .select(col(idCol), simhashOfHashes(col("__hs")).as("simhash"))

  /** Single-column form; prefer [[simhash]] on DataFrames (see class
    * doc on lambda recomputation). */
  def simhash32(text: Column): Column = simhashOfHashes(tokenHashes(text))

  /** Hamming distance between two simhash values (near-dup metric). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs — the banded scale shape for the
    * hamming metric: the 32-bit simhash splits into 4 byte-bands;
    * two hashes within hamming distance ≤ 3 differ in at most 3 bits,
    * so by pigeonhole at least ONE band is untouched and the pair
    * meets in that band's bucket — candidates come from a hash
    * self-join on band keys (never all-pairs), then the exact hamming
    * filter verifies. `maxHamming` must stay < 4 to keep the
    * guarantee; `maxBucket` caps pathological buckets exactly like
    * [[candidatePairs]]. Output: (id_a, id_b, hamming), id_a < id_b. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000,
      unicode: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"banded simhash guarantees recall only for hamming < 4 (got $maxHamming)")
    val sh = simhash(df, idCol, textCol, unicode)
    val bands = array((0 until 4).map(b =>
      concat(lit(s"$b|"),
        (shiftright(col("simhash"), b * 8) % 256).cast("string"))): _*)
    val banded = sh.select(col(idCol), col("simhash"),
      explode(bands).as("band_key"))
    val capped = capBuckets(banded, "band_key", maxBucket,
      keepOver = false)
    val a = capped.select(col(idCol).as("id_a"), col("simhash").as("__sa"),
      col("band_key"))
    val b = capped.select(col(idCol).as("id_b"), col("simhash").as("__sb"),
      col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("__sa"), col("__sb")).cast("int").as("hamming"))
      // hamming is a pure function of the pair, so filtering BEFORE
      // distinct is equivalent — and the distinct shuffle then carries
      // only near pairs instead of every band collision (a close pair
      // collides in up to 4 bands; far pairs that happen to share one
      // band never enter the exchange at all)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Banded near-duplicate pairs over a PRECOMPUTED 64-bit hash
    * column (SimHash over embeddings, [[Multimodal.dhash64]]
    * perceptual image hashes, …) — the [[simhashNearDups]] scale
    * shape generalized: 8 byte-bands, so by pigeonhole any pair
    * within Hamming distance <= 7 shares an untouched band and
    * meets in that band's bucket; the exact `bit_count(xor)` filter
    * verifies. Never an all-pairs exchange; `maxBucket` caps
    * pathological buckets. Output: (id_a, id_b, hamming),
    * id_a < id_b. */
  def hammingNearDups64(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 4, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"8-band hashing guarantees recall only for hamming < 8 (got $maxHamming)")
    require(maxBucket >= 1)
    val bands = array((0 until 8).map(b =>
      concat(lit(s"$b|"),
        (shiftrightunsigned(col(hashCol), b * 8) % 256).cast("string"))): _*)
    val banded = df.select(col(idCol), col(hashCol),
      explode(bands).as("band_key"))
    val capped = capBuckets(banded, "band_key", maxBucket,
      keepOver = false)
    val a = capped.select(col(idCol).as("id_a"), col(hashCol).as("__ha"),
      col("band_key"))
    val b = capped.select(col(idCol).as("id_b"), col(hashCol).as("__hb"),
      col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("__ha"), col("__hb")).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Benchmark decontamination: per-document shingle containment
    * against a benchmark corpus — the standard pre-training
    * decontamination check (flag or drop training documents that
    * overlap an evaluation set). For every corpus doc: its distinct
    * shingle count, how many of those shingles occur anywhere in the
    * benchmark, and the contamination rate in exact ppm (integer
    * `div` — no float division, so the number is reproducible on any
    * engine). Output: (idCol, n_shingles, n_contaminated, contam_ppm).
    *
    * Scale shape: both sides shingle + explode exactly once (the
    * typed-flatMap explode, see [[explodeStrings]]); the benchmark
    * collapses to a distinct shingle set that is typically tiny
    * relative to the corpus (eval sets are small), so AQE broadcasts
    * the semi-join — otherwise it hash-shuffles on the shingle value.
    * Nothing ever compares documents pairwise. */
  def contamination(df: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      shingleN: Int = 3, unicode: Boolean = false): DataFrame = {
    val ex = explodeStrings(
      shingleSets(df, idCol, textCol, shingleN, unicode),
      idCol, "sh", "__s")
    val bench = explodeStrings(
      shingleSets(benchmark, benchIdCol, benchTextCol, shingleN, unicode),
      benchIdCol, "sh", "__s")
      .select(col("__s")).distinct()
    // ONE pass over the corpus shingles: mark membership with a left
    // join (bench is distinct, so multiplicity is preserved) and take
    // both counts in a single agg — a separate totals scan would
    // re-run the whole tokenize+shingle+flatMap pipeline (no exchange
    // at its top means no ReusedExchange to share it).
    ex.join(bench.withColumn("__hit", lit(1)), Seq("__s"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contam_ppm",
        expr("n_contaminated * 1000000 div n_shingles"))
  }

  /** [[contamination]] with a broadcast Bloom prefilter — the 100 TB
    * shuffle shape. [[contamination]]'s one corpus-sized exchange is
    * its join: EVERY corpus shingle occurrence travels to the shingle
    * hash partition just to discover (almost always) "not in the
    * benchmark". Here the benchmark's distinct shingles are folded
    * into a Bloom filter (one pass over the small-by-contract bench
    * side), baked into a codegen'd scan-speed predicate
    * ([[graft.codecs.BloomMightContain]]), and only ADMITTED shingles
    * enter the exchange — at fpp 1% a clean corpus shrinks the
    * shuffle ~100×. The result is IDENTICAL to [[contamination]]:
    * the bloom never drops a true member (no false negatives), and
    * admitted false positives are eliminated by the same exact join.
    * Price: per-doc totals need their own scan-side agg (the one-pass
    * join-then-count trick would route everything through the
    * exchange again), so this variant tokenizes the corpus twice —
    * scans scale, exchanges don't.
    *
    * `fpp` trades filter size (broadcast cost, ~1.2 bytes/item at 1%)
    * against admitted-noise volume. Output shape identical to
    * [[contamination]]. */
  def bloomContamination(df: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      shingleN: Int = 3, fpp: Double = 0.01,
      unicode: Boolean = false): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ex = explodeStrings(
      shingleSets(df, idCol, textCol, shingleN, unicode),
      idCol, "sh", "__s")
    val bench = explodeStrings(
      shingleSets(benchmark, benchIdCol, benchTextCol, shingleN, unicode),
      benchIdCol, "sh", "__s")
      .select(col("__s")).distinct()
    // the bench pipeline runs three times (count, bloom aggregate,
    // verify join); pin it for the two eager driver-side uses and
    // release before returning — the lazy verify join re-derives it
    // once, so each call pays 2 bench passes, not 3
    bench.persist()
    val admit: org.apache.spark.sql.Column =
      try {
        val nBench = bench.count()
        if (nBench == 0) lit(false) // empty benchmark admits nothing
        else {
          val bf = bench.stat.bloomFilter("__s", nBench, fpp)
          graft.functions.GraftFunctions.column(
            graft.codecs.BloomMightContain(
              graft.functions.GraftFunctions.expr(col("__s")),
              graft.codecs.BloomBytes.toBytes(bf)))
        }
      } finally bench.unpersist(false)
    val totals = ex.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = ex.filter(admit)
      .join(bench, Seq("__s"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__nc"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("__nc"), lit(0L)).as("n_contaminated"))
      .withColumn("contam_ppm",
        expr("n_contaminated * 1000000 div n_shingles"))
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member
    * of the dedup family: candidates are same-LSH-bucket rows (random
    * hyperplanes, [[AnnSearch.bucketOf]]), verified by exact cosine ≥
    * `minCosM` micro-units. The join shuffles on the bucket key only;
    * nothing compares all pairs, the same scale shape as the MinHash
    * path. Output: (id_a, id_b, cos_m), id_a < id_b.
    *
    * Geometry is scale-checked, never silently degenerate: the corpus
    * is counted once, `planes = 0` (default) derives the plane count
    * from that size ([[AnnSearch.planesFor]]), and an EXPLICIT plane
    * count whose expected bucket width exceeds `maxBucket` is refused
    * with the corrective value — a fixed 8-plane layout (256 buckets)
    * over a few billion vectors would put every bucket over the cap
    * and "find no duplicates". Residual skew (a single pathological
    * bucket, e.g. zero vectors) is still capped like
    * [[candidatePairs]], and [[embeddingDroppedBuckets]] reports
    * exactly what the cap excluded. */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      minCosM: Long, planes: Int = 0, dim: Int = 64,
      maxBucket: Int = 10000): DataFrame = {
    val p = checkedPlanes(df, embCol, planes, maxBucket)
    val capped = cappedEmbBuckets(df, idCol, embCol, p, dim, maxBucket,
      keepOver = false)
    val a = capped.select(col(idCol).as("id_a"), col("__e").as("__ea"),
      col("bucket"))
    val b = capped.select(col(idCol).as("id_b"), col("__e").as("__eb"),
      col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_m",
        floor(AnnSearch.cosine(col("__ea"), col("__eb")) * 1000000L)
          .cast("long"))
      .filter(col("cos_m") >= minCosM)
      .select(col("id_a"), col("id_b"), col("cos_m"))
  }

  /** The observability counterpart of [[embeddingNearDups]]'s cap:
    * (bucket, width) of every LSH bucket wider than `maxBucket`,
    * whose members produced no pairs. Empty output = full coverage. */
  def embeddingDroppedBuckets(df: DataFrame, idCol: String, embCol: String,
      planes: Int = 0, dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val p = checkedPlanes(df, embCol, planes, maxBucket)
    cappedEmbBuckets(df, idCol, embCol, p, dim, maxBucket, keepOver = true)
      .groupBy(col("bucket")).agg(count(lit(1)).as("width"))
  }

  /** Resolve + sanity-check the LSH plane count against the corpus
    * size (one count job — the price of the no-silent-empty
    * guarantee). */
  private def checkedPlanes(df: DataFrame, embCol: String,
      planes: Int, maxBucket: Int): Int = {
    // null embeddings are excluded by cappedEmbBuckets — size the
    // geometry on the rows that will actually be bucketed
    val n = df.filter(col(embCol).isNotNull).count()
    val p = if (planes > 0) planes else AnnSearch.planesFor(n)
    val expectedWidth = n.toDouble / (1L << math.min(p, 62))
    require(expectedWidth <= maxBucket,
      s"degenerate LSH geometry: $n vectors over 2^$p buckets gives an " +
        f"expected bucket width of $expectedWidth%.0f > maxBucket=$maxBucket " +
        s"— every bucket would be dropped. Use planes >= " +
        s"${AnnSearch.planesFor(n, maxBucket)} (or planes=0 to derive).")
    p
  }

  private def cappedEmbBuckets(df: DataFrame, idCol: String, embCol: String,
      planes: Int, dim: Int, maxBucket: Int, keepOver: Boolean): DataFrame = {
    // a null embedding would bucket to 0 (every sign bit takes the
    // otherwise-branch), polluting a REAL bucket's width and — past
    // the cap — evicting its legitimate vectors; drop them here
    val withB = df.select(col(idCol), col(embCol).as("__e"))
      .filter(col("__e").isNotNull)
      .withColumn("bucket", AnnSearch.bucketOf(col("__e"), planes, dim))
    capBuckets(withB, "bucket", maxBucket, keepOver)
  }
}
