package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Model-based check of the MERGE clause matrix: for a grid of
  * clause configurations (matched update/delete × conditional ×
  * insert × by-source update/delete × conditional), run the SQL
  * MERGE through the catalog AND an in-memory Scala model of
  * standard MERGE semantics over the same rows, and compare exact
  * final states. Deterministic data; the value is the exhaustive
  * clause composition, which the per-shape specs sample. */
class MergeMatrixModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = new java.io.File(scratch(
      s"mmm/${java.util.UUID.randomUUID().toString.take(8)}"))
      .getAbsolutePath
    spark.conf.set("spark.sql.catalog.gmm",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmm.root", r)
    r
  }

  // target: keys 1..12, v alternating sign; source: every 3rd key
  // (some matched, some not) with a delta
  private val target0: Map[Long, Long] =
    (1L to 12L).map(k => k -> (if (k % 2 == 0) k * 10 else -k * 10))
      .toMap
  private val source0: Map[Long, Long] =
    (0L to 5L).map(i => (i * 3 + 1) -> (i * 100 + 7)).toMap // 1,4,7,10,13,16

  /** The in-memory model of one MERGE statement. */
  private def model(
      matched: Option[(Boolean, Boolean)], // (conditional, isDelete)
      insert: Boolean,
      bySource: Option[(Boolean, Boolean)]): Map[Long, Long] = {
    def mCond(v: Long): Boolean = v > 0 // the matched condition used
    def bCond(v: Long): Boolean = v < 0 // the by-source condition
    var out = target0
    matched.foreach { case (conditional, isDelete) =>
      target0.foreach { case (k, v) =>
        if (source0.contains(k) && (!conditional || mCond(v))) {
          if (isDelete) out -= k
          else out += k -> (v + source0(k))
        }
      }
    }
    if (insert)
      source0.foreach { case (k, d) =>
        if (!target0.contains(k)) out += k -> d
      }
    bySource.foreach { case (conditional, isDelete) =>
      target0.foreach { case (k, v) =>
        if (!source0.contains(k) && (!conditional || bCond(v))) {
          if (isDelete) out -= k
          else out += k -> (v - 1000)
        }
      }
    }
    out
  }

  private def sqlFor(
      matched: Option[(Boolean, Boolean)],
      insert: Boolean,
      bySource: Option[(Boolean, Boolean)], tbl: String): String = {
    val m = matched.map { case (c, d) =>
      val cond = if (c) " AND t.v > 0" else ""
      if (d) s"WHEN MATCHED$cond THEN DELETE"
      else s"WHEN MATCHED$cond THEN UPDATE SET v = t.v + s.d"
    }
    val i = if (insert)
      Some("WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.d)")
    else None
    val b = bySource.map { case (c, d) =>
      val cond = if (c) " AND t.v < 0" else ""
      if (d) s"WHEN NOT MATCHED BY SOURCE$cond THEN DELETE"
      else s"WHEN NOT MATCHED BY SOURCE$cond THEN UPDATE SET " +
        "v = t.v - 1000"
    }
    s"MERGE INTO gmm.$tbl AS t USING mmm_src AS s ON t.k = s.k\n" +
      (m.toSeq ++ i.toSeq ++ b.toSeq).mkString("\n")
  }

  test("every clause configuration matches the in-memory MERGE " +
      "model exactly, each as one committed version") {
    source0.toSeq.toDF("k", "d").createOrReplaceTempView("mmm_src")
    val matchedOpts: Seq[Option[(Boolean, Boolean)]] =
      Seq(None, Some((false, false)), Some((true, false)),
        Some((false, true)), Some((true, true)))
    val bySourceOpts = matchedOpts
    var n = 0
    for {
      m <- matchedOpts
      ins <- Seq(false, true)
      b <- bySourceOpts
      if m.isDefined || ins || b.isDefined
    } {
      n += 1
      val tbl = f"t$n%03d"
      val url = s"$root/$tbl"
      Snapshots.create(spark, url,
        target0.toSeq.toDF("k", "v"), nFiles = 2)
      val v0 = Snapshots.latest(spark, url)
      spark.sql(sqlFor(m, ins, b, tbl))
      assert(Snapshots.latest(spark, url) <= v0 + 1,
        s"config $n must commit at most one version")
      val got = Snapshots.read(spark, url)
        .select(col("k"), col("v")).as[(Long, Long)]
        .collect().toMap
      val want = model(m, ins, b)
      assert(got == want,
        s"config $n (matched=$m insert=$ins bySource=$b):\n" +
          s"  got  $got\n  want $want\n  sql: ${sqlFor(m, ins, b, tbl)}")
    }
    assert(n == 49) // 5*2*5 - 1 empty config
  }

  test("multi-clause groups: FIRST-MATCH-WINS within each group, " +
      "NULL conditions do not fire and do not suppress later arms") {
    // source carries a NULLABLE flag so an arm's condition can
    // evaluate to NULL (k=7: flag null → arm 1 must not fire AND
    // must not block arms 2/3)
    val srcRows = Seq[(Long, Long, Option[Long])](
      (1L, 50L, Some(1L)),   // matched, flag>0   → arm1 DELETE
      (4L, 400L, Some(0L)),  // matched, d>300    → arm2 UPDATE +d
      (7L, 500L, None),      // matched, flag NULL, d>300 → arm2
      (10L, 9L, Some(0L)),   // matched, no cond  → arm3 SET 0
      (13L, 333L, Some(1L)), // unmatched, d odd  → ins1 (+d)
      (16L, 222L, None))     // unmatched, d even → ins2 (-1)
    srcRows.toDF("k", "d", "flag").createOrReplaceTempView("mmm_mc")
    val url = s"$root/multi"
    Snapshots.create(spark, url, target0.toSeq.toDF("k", "v"),
      nFiles = 2)
    spark.sql(
      """MERGE INTO gmm.multi AS t USING mmm_mc AS s ON t.k = s.k
        |WHEN MATCHED AND s.flag > 0 THEN DELETE
        |WHEN MATCHED AND s.d > 300 THEN UPDATE SET v = t.v + s.d
        |WHEN MATCHED THEN UPDATE SET v = 0
        |WHEN NOT MATCHED AND s.d % 2 = 1
        |  THEN INSERT (k, v) VALUES (s.k, s.d)
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, -1)
        |WHEN NOT MATCHED BY SOURCE AND t.v < 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v * 2
        |""".stripMargin)
    // the in-memory model of the same statement
    val srcByK = srcRows.map(r => r._1 -> r).toMap
    var want = Map.empty[Long, Long]
    target0.foreach { case (k, v) =>
      srcByK.get(k) match {
        case Some((_, d, flag)) =>
          if (flag.exists(_ > 0)) ()               // arm1 delete
          else if (d > 300) want += k -> (v + d)   // arm2
          else want += k -> 0L                     // arm3
        case None =>
          if (v < 0) ()                            // bySource delete
          else want += k -> v * 2                  // bySource update
      }
    }
    srcByK.foreach { case (k, (_, d, _)) =>
      if (!target0.contains(k))
        want += k -> (if (d % 2 == 1) d else -1L)
    }
    val got = Snapshots.read(spark, url)
      .select(col("k"), col("v")).as[(Long, Long)].collect().toMap
    assert(got == want, s"\n  got  $got\n  want $want")
    // one committed version for the whole statement
    assert(Snapshots.latest(spark, url) == 2)
  }

  test("a matched row that satisfies NO arm is left untouched " +
      "(it never enters the upsert batch)") {
    // (an unconditional clause before a later one is refused by
    // Spark's own parser — NON_LAST_MATCHED_CLAUSE_OMIT_CONDITION —
    // so dead arms cannot reach the translation)
    Seq((2L, 5L), (4L, 7L)).toDF("k", "d")
      .createOrReplaceTempView("mmm_dead")
    val url = s"$root/dead"
    Snapshots.create(spark, url, target0.toSeq.toDF("k", "v"),
      nFiles = 1)
    spark.sql(
      """MERGE INTO gmm.dead AS t USING mmm_dead AS s ON t.k = s.k
        |WHEN MATCHED AND t.v > 1000 THEN DELETE
        |WHEN MATCHED AND t.v > 500 THEN UPDATE SET v = 0
        |""".stripMargin)
    val after = Snapshots.read(spark, url)
      .select(col("k"), col("v")).as[(Long, Long)].collect().toMap
    assert(after == target0)
  }
}
