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
}
