package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnSearchSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic embeddings: 40 vecs in 4 tight clusters
  private lazy val vecs = {
    val rows = (0 until 40).map { i =>
      val cluster = i % 4
      val base = Array.tabulate(8)(d => math.sin(cluster * 37.0 + d))
      val jitter = Array.tabulate(8)(d => 0.01 * math.sin(i * 131.0 + d))
      (i.toLong, base.zip(jitter).map { case (b, j) => (b + j).toFloat }.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("a", "b")
    val r = df.select(AnnSearch.cosine($"a", $"b")).as[Double].collect()
    assert(r(0) == 1.0 && r(1) == 0.0 && r(2) == -1.0)
  }

  test("brute-force top-k: self is rank 1; neighbors share cluster") {
    val top = AnnSearch.bruteForceTopK(
      vecs.filter($"vec_id" < 4), vecs, "vec_id", "vec_id", "embedding", k = 5)
      .collect()
    val byQ = top.groupBy(_.getLong(0))
    (0L until 4L).foreach { q =>
      val rows = byQ(q).sortBy(_.getInt(1))
      assert(rows.head.getLong(2) == q) // rank 1 = self
      // self-cos floors to 999999 or 1000000 depending on the norm
      // product's last ulp — deterministic either way
      assert(rows.head.getLong(3) >= 999999L)
      // all top-5 from the same cluster (ids ≡ q mod 4)
      assert(rows.forall(_.getLong(2) % 4 == q))
    }
  }

  test("bucketize is deterministic and clusters land together") {
    val b1 = AnnSearch.bucketize(vecs, "vec_id", "embedding", planes = 6, dim = 8)
      .as[(Long, Long)].collect().toMap
    val b2 = AnnSearch.bucketize(vecs, "vec_id", "embedding", planes = 6, dim = 8)
      .as[(Long, Long)].collect().toMap
    assert(b1 == b2)
    assert(b1.values.forall(v => v >= 0 && v < 64))
    // same-cluster vectors (tiny jitter) share their bucket
    (0 until 4).foreach { c =>
      val buckets = (0 until 40).filter(_ % 4 == c).map(i => b1(i.toLong)).toSet
      assert(buckets.size <= 2) // jitter may flip at most a borderline plane
    }
  }

  test("int8TopK with rescore reproduces exact top-k on the fixture") {
    val queries = vecs.filter($"vec_id" < 6)
    val exact = AnnSearch.bruteForceTopK(
      queries, vecs, "vec_id", "vec_id", "embedding", k = 5)
      .orderBy($"qid", $"rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val quant = AnnSearch.int8TopK(
      queries, vecs, "vec_id", "vec_id", "embedding", k = 5, rerank = 4)
      .orderBy($"qid", $"rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // rescore is the same float arithmetic, so ranks AND scores match
    assert(quant == exact)
    assert(AnnSearch.int8RecallAtK(
      queries, vecs, "vec_id", "vec_id", "embedding", k = 5, rerank = 4) == 1.0)
  }

  test("int8TopK coarse phase alone has high recall (rerank=1)") {
    val queries = vecs.filter($"vec_id" < 8)
    val r = AnnSearch.int8RecallAtK(
      queries, vecs, "vec_id", "vec_id", "embedding", k = 5, rerank = 1)
    // rerank=1 keeps only the quantized top-5: on the tight-cluster
    // fixture int8 error (~0.4% relative) barely perturbs order
    assert(r >= 0.9, s"rerank=1 recall $r")
  }

  test("lshTopK returns same-bucket candidates ranked like brute force") {
    val lsh = AnnSearch.lshTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "vec_id", "embedding", k = 3, planes = 6, dim = 8)
      .orderBy("rank").collect()
    assert(lsh.nonEmpty)
    assert(lsh.head.getLong(2) == 0L) // self in same bucket, rank 1
    // every returned candidate is at least cluster-similar
    assert(lsh.forall(_.getLong(3) > 900000L))
  }

  test("two-phase rankTopK equals a naive global window (multi-partition)") {
    import org.apache.spark.sql.expressions.Window
    // many partitions + forced cos_m ties exercise both the heap
    // tie-break and the phase-2 merge
    val scored = spark.range(2000).toDF("cid")
      .withColumn("qid", pmod($"cid", lit(7)))
      .withColumn("cos_m", pmod($"cid" * 1103L + 17, lit(50)))
      .repartition(16)
    val got = AnnSearch.rankTopK(scored, k = 9)
      .orderBy("qid", "rank").as[(Long, Int, Long, Long)].collect().toSeq
    val w = Window.partitionBy($"qid").orderBy($"cos_m".desc, $"cid")
    val want = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 9).select($"qid", $"rank", $"cid", $"cos_m")
      .orderBy("qid", "rank").as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("null embeddings are skipped, not crashed on (nullable corpora)") {
    // corpus with a null embedding row: cosine → null cos_m; the
    // phase-1 heap must skip it instead of NPE-ing on getLong
    val withNull = vecs.unionByName(
      Seq((999L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding"))
    val top = AnnSearch.bruteForceTopK(
      vecs.filter($"vec_id" === 0), withNull, "vec_id", "vec_id",
      "embedding", k = 5).collect()
    assert(top.length == 5)
    assert(!top.exists(_.getLong(2) == 999L)) // null row never ranks
    // null on the QUERY side nulls every score for that qid → no rows
    val nullQ = AnnSearch.bruteForceTopK(
      withNull.filter($"vec_id" === 999L), vecs, "vec_id", "vec_id",
      "embedding", k = 5).collect()
    assert(nullQ.isEmpty)
  }

  test("recall harness: clustered data ≈ full recall; uniform fixture degrades with planes") {
    // clustered fixture: near vectors agree on nearly every
    // hyperplane sign → the bucket join barely loses anything
    val clustered = AnnSearch.recallAtK(vecs.filter($"vec_id" < 4), vecs,
      "vec_id", "vec_id", "embedding", k = 5, planes = 6, dim = 8)
    assert(clustered >= 0.9, s"clustered recall $clustered")
    // uniform 64-dim fixture (adversarial for LSH): recall must
    // degrade monotonically as planes rise, and the derived
    // geometry (planes=0 → planesFor(500)=1) must beat a fixed
    // over-partitioned one — deterministic values (md5 planes).
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 20)
    val byPlanes = Seq(4, 8, 12).map(p =>
      p -> AnnSearch.recallAtK(q, e, "vec_id", "vec_id", "embedding",
        k = 5, planes = p))
    val r = byPlanes.toMap
    assert(r(4) >= r(8) && r(8) >= r(12), s"not monotone: $byPlanes")
    assert(r(4) >= 0.30 && r(8) >= 0.20 && r(12) >= 0.15, s"floors: $byPlanes")
    val derived = AnnSearch.recallAtK(q, e, "vec_id", "vec_id", "embedding", k = 5)
    assert(derived >= r(4), s"derived-geometry recall $derived < planes=4 ${r(4)}")
    // 500·2^20 vectors / 4096-wide target buckets → ceil(log2(128000)) = 17
    assert(AnnSearch.planesFor(500) == 1 && AnnSearch.planesFor(500L << 20) == 17)
  }

  test("ivfTopK: deterministic centroids; probing raises recall; full probe = exhaustive") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 20)
    val c1 = AnnSearch.ivfCentroids(e, "vec_id", "embedding", 16)
      .select("centroid_id").as[Long].collect().toSeq
    val c2 = AnnSearch.ivfCentroids(e, "vec_id", "embedding", 16)
      .select("centroid_id").as[Long].collect().toSeq
    assert(c1 == c2 && c1.length == 16)
    def rec(np: Int) = AnnSearch.ivfRecallAtK(q, e, "vec_id", "vec_id",
      "embedding", k = 5, centroids = 16, nprobe = np)
    val (r2, r4, r16) = (rec(2), rec(4), rec(16))
    assert(r16 == 1.0, s"full probe must be exhaustive, got $r16")
    assert(r2 <= r4 && r4 <= r16, s"probing must not lower recall: $r2 $r4 $r16")
    assert(r4 >= 0.6, s"nprobe=4 recall $r4") // measured 0.64, deterministic
    // beats LSH at the same bucket count (16 buckets = 4 planes)
    val lsh = AnnSearch.recallAtK(q, e, "vec_id", "vec_id", "embedding",
      k = 5, planes = 4)
    assert(r4 > lsh, s"IVF nprobe=4 ($r4) should beat 16-bucket LSH ($lsh)")
  }

  test("ivfAssign plans as a pure projection: no exchange, no join") {
    val cents = AnnSearch.ivfCentroids(vecs, "vec_id", "embedding", 4)
    val assigned = AnnSearch.ivfAssign(vecs, "vec_id", "embedding", cents)
    assigned.collect()
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"assignment joined:\n$plan")
    // and the argmax picks a real centroid for every row
    assert(assigned.filter($"bucket".isNull).count() == 0)
  }

  test("planeWeight matches its SQL definition") {
    // md5("0:0") = first 8 hex → uint32/2^32 - 0.5, spot-checked
    val w = AnnSearch.planeWeight(0, 0)
    assert(w >= -0.5 && w <= 0.5)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("0:0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(md.substring(0, 8), 16).toDouble / 4294967296.0 - 0.5
    assert(w == expected)
  }

  test("JL-space candidates + exact rescore recover full-dim top-k") {
    // the documented use: shrink 8→4 dims, take generous candidates
    // by JL-space cosine, exact-rescore in full dimension — on the
    // clustered fixture the true top-5 must survive (recall 1.0)
    val proj = AnnSearch.jlProject(vecs, "vec_id", "embedding",
        outDim = 4, dim = 8)
      .select($"vec_id", $"proj".cast("array<double>").as("embedding"))
    val cand = AnnSearch.bruteForceTopK(
        proj.filter($"vec_id" < 4), proj, "vec_id", "vec_id",
        "embedding", k = 12)
      .select($"qid", $"cid")
    val rescored = cand
      .join(vecs.select($"vec_id".as("cid"), $"embedding".as("__ce")), "cid")
      .join(vecs.select($"vec_id".as("qid"), $"embedding".as("__qe")), "qid")
      .withColumn("cos_m",
        floor(AnnSearch.cosine($"__qe", $"__ce") * 1000000L).cast("long"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"cos_m".desc, $"cid")))
      .filter($"rank" <= 5).select($"qid", $"cid")
    val truth = AnnSearch.bruteForceTopK(
        vecs.filter($"vec_id" < 4), vecs, "vec_id", "vec_id",
        "embedding", k = 5)
      .select($"qid", $"cid")
    val hit = truth.join(rescored, Seq("qid", "cid"), "left_semi").count()
    assert(hit == truth.count(),
      s"JL pipeline lost ${truth.count() - hit} of the true top-5")
  }

  test("planesFor is integer-exact at power-of-two ratios — no " +
      "float-log off-by-one") {
    // corpus/target = 2^29 exactly: the float spelling returned 30
    assert(AnnSearch.planesFor(4096L << 29, 4096L) == 29)
    assert(AnnSearch.planesFor(4096L << 31, 4096L) == 31)
    // ceil semantics: one row over the boundary needs one more plane
    assert(AnnSearch.planesFor(8193L, 4096L) == 2)
    assert(AnnSearch.planesFor(8192L, 4096L) == 1)
  }

  test("ivf/pq samplers skip null ids and embeddings (the module's " +
      "null contract)") {
    def v(d: Int): Seq[Float] =
      (0 until 4).map(i => if (i == d) 1f else 0f)
    val dirty = Seq(
      (Some(1L), Some(v(0))), (Some(2L), Some(v(1))),
      (None: Option[Long], Some(v(2))),
      (Some(3L), None: Option[Seq[Float]]))
      .toDF("id", "emb")
    // null id would sort FIRST into the centroid set before the fix
    val cents = AnnSearch.ivfCentroids(dirty, "id", "emb", k = 4)
    assert(cents.count() == 2L)
    assert(cents.filter(col("centroid_id").isNull).count() == 0L)
    // the full ivf path must run clean on the dirty corpus
    val top = AnnSearch.ivfTopK(
      Seq((10L, v(0))).toDF("id", "emb"), dirty,
      "id", "id", "emb", k = 1, centroids = 2)
    assert(top.count() == 1L)
    val cb = AnnSearch.pqCodebooks(dirty, "id", "emb", m = 1, ksub = 4)
    assert(cb(0).length == 2)
  }

  test("bucketOf refuses out-of-range plane counts instead of " +
      "wrapping bucket bits") {
    intercept[IllegalArgumentException] {
      AnnSearch.bucketOf(col("emb"), planes = 64, dim = 4)
    }
    intercept[IllegalArgumentException] {
      AnnSearch.bucketOf(col("emb"), planes = 0, dim = 4)
    }
  }

  test("hardNegatives excludes same and null labels, ranks the rest") {
    def ax(d: Int, s: Double) = (0 until 4).map(i => if (i == d) s.toFloat else 0f)
    val corpus = Seq(
      (1L, Some(0), ax(0, 1.0)),  // same label as query → excluded
      (2L, Some(1), ax(0, 2.0)),  // different label, cos 1 → rank 1
      (3L, Some(1), ax(1, 1.0)),  // different label, cos 0 → rank 2
      (4L, None, ax(0, 1.0)))     // null label → never a negative
      .toDF("vec_id", "label", "embedding")
    val q = Seq((0L, Some(0), ax(0, 1.0))).toDF("vec_id", "label", "embedding")
    val out = AnnSearch.hardNegatives(q, corpus, "vec_id", "vec_id",
        "embedding", "label", k = 3)
      .orderBy("rank")
      .select("qid", "rank", "cid", "neg_label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(out == Seq((0L, 1, 2L, 1), (0L, 2, 3L, 1))) // only 2 qualify
    // a null-label query draws negatives from every labelled row
    val qn = Seq((9L, None: Option[Int], ax(0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val outN = AnnSearch.hardNegatives(qn, corpus, "vec_id", "vec_id",
        "embedding", "label", k = 3)
      .orderBy("rank").select("cid").as[Long].collect().toSeq
    assert(outN == Seq(1L, 2L, 3L)) // cos ties (1,2) break to lower cid
  }

  test("jlSign matches independently-computed md5 parities") {
    // python hashlib: md5('jl:0:0')[0]='b' (odd → -1),
    // 'jl:0:1'→'8' (+1), 'jl:1:0'→'0' (+1), 'jl:2:3'→'d' (-1)
    assert(AnnSearch.jlSign("jl", 0, 0) == -1)
    assert(AnnSearch.jlSign("jl", 0, 1) == 1)
    assert(AnnSearch.jlSign("jl", 1, 0) == 1)
    assert(AnnSearch.jlSign("jl", 2, 3) == -1)
  }

  test("jlProject of an axis vector reads out one sign-matrix column") {
    // embedding = 1.0 on input dim 5 → proj_j = sign(j,5) · 1e6
    val df = Seq((1L, (0 until 8).map(d => if (d == 5) 1.0f else 0f)))
      .toDF("vec_id", "embedding")
    val proj = AnnSearch.jlProject(df, "vec_id", "embedding",
        outDim = 4, dim = 8)
      .as[(Long, Seq[Long])].head()._2
    assert(proj == (0 until 4).map(j =>
      AnnSearch.jlSign("jl", j, 5).toLong * 1000000L))
    // and a custom seed changes the matrix
    val proj2 = AnnSearch.jlProject(df, "vec_id", "embedding",
        outDim = 4, dim = 8, seed = "other")
      .as[(Long, Seq[Long])].head()._2
    assert(proj2 == (0 until 4).map(j =>
      AnnSearch.jlSign("other", j, 5).toLong * 1000000L))
  }
}
