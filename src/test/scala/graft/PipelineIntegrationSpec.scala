package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, NearDedup, Sampling, TextAnalysis}
import graft.schema.{CodecSpec, FieldSpec, GraftSchema}
import graft.sources.{GraftRead, Materialize}

/** End-to-end training-data pipeline over the driver's documents
  * table: analyze → language/quality filter → exact dedup → near-dup
  * removal → deterministic split/sample → materialize with a tensor
  * feature column → read back through the reader. The composition a
  * real corpus-cleaning job runs, exercised as one flow. */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("clean -> dedup -> sample -> materialize -> read round-trip") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    assert(total > 0)

    // 1. analyze + filter (language, quality, length)
    val analyzed = TextAnalysis.analyze(docs)
    val kept = analyzed.filter($"lang_pred" === "en" && $"quality" > 0.4 &&
      $"n_tokens" >= 5)
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. exact dedup on normalized fingerprint
    val exact = Dedup.exactByText(kept, "doc_id", "text")
    val nExact = exact.count()
    assert(nExact <= nKept)

    // 3. near-dup removal: drop the higher id of each verified pair
    val pairs = NearDedup.nearDuplicates(exact, "doc_id", "text",
      minJaccard = 0.8)
    val losers = pairs.select($"id_b".as("doc_id")).distinct()
    val unique = exact.join(losers, Seq("doc_id"), "left_anti")
    val nUnique = unique.count()
    assert(nUnique <= nExact)

    // 4. deterministic 90% train split
    val train = unique.filter(
      Sampling.sampleByKey(unique, $"doc_id", 0.9, seed = 13))
    val nTrain = train.count()
    assert(nTrain <= nUnique)

    // 5. feature column + materialize through the tensor codec
    val featured = train.select($"doc_id", $"lang_pred",
      array($"n_tokens".cast("double"), $"alpha_ratio", $"quality")
        .as("features"))
    val schema = GraftSchema("clean_docs", Seq(
      FieldSpec("doc_id", LongType),
      FieldSpec("lang_pred", StringType),
      FieldSpec("features", DoubleType, shape = Seq(3),
        codec = Some(CodecSpec("compressed_ndarray")))))
    val url = scratch("pipeline-out")
    Materialize.materialize(featured, url, schema, partitions = Some(2))

    // 6. read back: schema view + decoded features intact
    val back = GraftRead.reader(spark, url).load()
    assert(back.count() == nTrain)
    val sample = back.select($"doc_id", $"features.data").limit(5)
      .as[(Long, Seq[Double])].collect()
    assert(sample.forall(_._2.length == 3))
    // features survive bit-exactly vs recomputation
    val recomputed = featured.select($"doc_id", $"features").as[(Long, Seq[Double])]
      .collect().toMap
    sample.foreach { case (id, f) => assert(recomputed(id) == f) }
  }

  test("embedding pipeline: near-dup prune -> IVF search over the pruned corpus") {
    import graft.ops.{AnnSearch, NearDedup}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val total = emb.count()

    // 1. vector near-dup removal (keep the lower id of each pair)
    val dups = NearDedup.embeddingNearDups(emb, "vec_id", "embedding",
      minCosM = 990000L, planes = 4)
    val losers = dups.select($"id_b".as("vec_id")).distinct()
    val pruned = emb.join(losers, Seq("vec_id"), "left_anti")
    val nPruned = pruned.count()
    assert(nPruned > 0 && nPruned <= total)
    // coverage was full — nothing silently dropped by the width cap
    assert(NearDedup.embeddingDroppedBuckets(emb, "vec_id", "embedding",
      planes = 4).count() == 0)

    // 2. IVF top-k over the pruned corpus; every hit must be a survivor
    val queries = pruned.filter($"vec_id" < 30)
    val hits = AnnSearch.ivfTopK(queries, pruned, "vec_id", "vec_id",
      "embedding", k = 3, centroids = 8, nprobe = 3)
    val hitIds = hits.select($"cid").distinct()
    assert(hits.count() > 0)
    assert(hitIds.join(pruned.select($"vec_id".as("cid")), Seq("cid"),
      "left_anti").count() == 0)

    // 3. rank-1 self-retrieval for every query (cos(self)=1 is max)
    val self = hits.filter($"rank" === 1)
      .select($"qid", $"cid").as[(Long, Long)].collect()
    assert(self.nonEmpty && self.forall { case (q, c) => q == c })
  }

  test("curation v2: sanitize -> decontaminate -> span/containment " +
      "screen -> semantic dedup -> quality bins") {
    import graft.ops.{NearDedup, SemanticDedup, Stats, TextAnalysis}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"n_chars")
    val total = docs.count()

    // 1. sanitation report: the fixture is clean ASCII, so the audit
    // must be an exact no-op — proving the pass would not corrupt it
    val audit = TextAnalysis.sanitize(docs, "doc_id", "text")
    assert(audit.filter($"n_ctrl" =!= 0L || $"n_ws_collapsed" =!= 0L)
      .count() == 0)

    // 2. benchmark decontamination via the bloom prefilter; drop docs
    // with > 50% shingle overlap with the held-out "benchmark"
    val bench = docs.filter($"doc_id" % 101 === 0)
    val contam = NearDedup.bloomContamination(docs, "doc_id", "text",
      bench, "doc_id", "text")
    val keptIds = contam.filter($"contam_ppm" <= 500000L)
      .select($"doc_id")
    val kept = docs.join(keptIds, Seq("doc_id"), "left_semi")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < total) // bench members self-contaminate out

    // 3. containment screen: no surviving doc may be ≥90% contained
    // in another survivor (drop the contained side)
    val contained = NearDedup.containmentJoin(kept, "doc_id", "text",
      minContainPpm = 900000L)
      .select($"id_b".as("doc_id")).distinct()
    val screened = kept.join(contained, Seq("doc_id"), "left_anti")
    assert(NearDedup.containmentJoin(screened, "doc_id", "text",
      minContainPpm = 900000L).count() == 0)

    // 4. semantic dedup over the SURVIVORS' embeddings: pair each
    // screened doc onto the embeddings fixture by doc_id modulo the
    // table size (ids live in different ranges), then keep only
    // cluster representatives among those vectors
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val embTotal = emb.count()
    val survivorVecs = emb.join(
      screened.select(($"doc_id" % embTotal).as("vec_id")).distinct(),
      Seq("vec_id"), "left_semi")
    val nSurvivorVecs = survivorVecs.count()
    assert(nSurvivorVecs > 0)
    val semKeep = SemanticDedup.keepers(survivorVecs, "vec_id", "embedding",
      SemanticDedup.lowestIdCentroids(survivorVecs, "vec_id", "embedding", 4),
      minCosM = 990000L)
    val nSemKeep = semKeep.count()
    assert(nSemKeep > 0 && nSemKeep <= nSurvivorVecs)

    // 5. per-lang length quartiles over the screened corpus:
    // ALL four bins present for the dominant language
    val binned = Stats.quantileBins(screened, Seq("lang"), "n_chars",
      Seq(0.25, 0.5, 0.75))
    val byLang = binned.groupBy($"lang")
      .agg(countDistinct($"bin").as("nb"), count(lit(1)).as("n"))
    val dominant = byLang.orderBy($"n".desc).first()
    assert(dominant.getLong(1) == 4,
      s"dominant lang has ${dominant.getLong(1)} distinct bins")
    // bins partition the corpus: no rows lost or duplicated
    assert(binned.count() == screened.count())
  }

  test("multilingual pipeline: script routing -> unicode near-dedup " +
      "-> tokenizer train -> encode -> pack on exact budgets") {
    import graft.ops.{NearDedup, Packing, TextAnalysis}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // a mixed-script crawl: even ids become Cyrillic docs whose body
    // varies by id but repeats exactly within groups of 10
    val crawl = docs.select($"doc_id",
      when(pmod($"doc_id", lit(2)) === 0, concat(
        lit("привет мир документ серия "),
        translate(($"doc_id" / 20).cast("long").cast("string"),
          "0123456789", "абвгдежзик")))
        .otherwise($"text").as("text"))

    // 1. route by writing system
    val routed = TextAnalysis.scriptProfile(crawl, "doc_id", "text")
      .select($"doc_id", $"script")
      .join(crawl, Seq("doc_id"))
    val cyr = routed.filter($"script" === "cyrillic")
    val lat = routed.filter($"script" === "latin")
    assert(cyr.count() > 0 && lat.count() > 0)
    assert(cyr.count() + lat.count() == routed.count()) // nothing lost

    // 2. unicode near-dedup on the Cyrillic shard: the repeated
    // bodies are exact near-dups; keep the lowest id of each group
    val pairs = NearDedup.nearDuplicates(cyr, "doc_id", "text",
      minJaccard = 0.9, unicode = true)
    assert(pairs.count() > 0, "ASCII tokenizer would find nothing here")
    val losers = pairs.select($"id_b".as("doc_id")).distinct()
    val uniqueCyr = cyr.join(losers, Seq("doc_id"), "left_anti")
    // one survivor per body group
    assert(uniqueCyr.select($"text").distinct().count() ==
      uniqueCyr.count())

    // 3. train a tokenizer on the surviving shard (in-memory path),
    // persist + reload the merge list
    val merges = TextAnalysis.trainBpe(uniqueCyr, "text", 24,
      minCount = 2L, unicode = true)
    assert(merges.nonEmpty &&
      merges.exists { case (l, r) => (l + r).exists(_ > 'z') })
    val store = scratch("ml-merges")
    TextAnalysis.mergesToDF(spark, merges).write.mode("overwrite").parquet(store)
    val reloaded = TextAnalysis.mergesFromDF(spark.read.parquet(store))
    assert(reloaded == merges)

    // 4. encode under the reloaded tokenizer; budgets agree with the
    // vocabulary-join count path
    val enc = TextAnalysis.bpeEncode(uniqueCyr, "doc_id", "text",
      reloaded, unicode = true)
    val viaCounts = TextAnalysis.bpeTokenCounts(uniqueCyr, "doc_id",
      "text", reloaded, unicode = true)
    assert(enc.select($"doc_id", $"n_bpe").except(viaCounts).isEmpty)
    assert(enc.filter($"n_bpe" === 0L).isEmpty) // every doc has tokens

    // 5. pack the encoded stream into 64-token bins: offsets tile
    // the stream exactly
    val packed = Packing.packed(enc, Seq($"doc_id"), "n_bpe",
      chunkTokens = 64L)
    val rows = packed.orderBy($"doc_id")
      .select($"n_bpe", $"tok_start").as[(Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array((n, s), (_, s2)) => assert(s + n == s2)
      case _ => ()
    }
  }
}
