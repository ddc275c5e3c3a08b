package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Model-based check of the WHOLE SQL DML surface as a SEQUENCE: a
  * seeded pseudo-random program of INSERT / INSERT OVERWRITE /
  * DELETE / UPDATE / MERGE / ALTER RENAME statements runs through
  * the catalog AND an in-memory Scala model, with full-state
  * equality after EVERY statement and a CDC-feed replay check at the
  * end. The per-shape specs sample the matrix; this spec exercises
  * the interleavings — a native-write append feeding a banded
  * delete feeding a bloom-pruned merge across a rename is where
  * state machines break, not in isolated statements. Deterministic:
  * a fixed seed drives the op choices, so a failure names a
  * reproducible program. */
class SqlDmlModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = new java.io.File(scratch(
      s"dmlmodel/${java.util.UUID.randomUUID().toString.take(8)}"))
      .getAbsolutePath
    spark.conf.set("spark.sql.catalog.gdm",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdm.root", r)
    r
  }

  // model state: key -> (group, value); the store schema is
  // (k BIGINT, g BIGINT, value BIGINT) with `value` renamable
  private type Model = Map[Long, (Long, Long)]

  private def storeState(url: String, valCol: String): Model =
    Snapshots.read(spark, url)
      .select(col("k"), col("g"), col(valCol))
      .as[(Long, Long, Long)].collect()
      .map { case (k, g, v) => k -> (g, v) }.toMap

  test("a seeded random DML program matches the in-memory model " +
      "after every statement; the CDC feed replays to the final " +
      "state") {
    val url = s"$root/prog"
    val rng = new scala.util.Random(20260816L)
    var model: Model = (1L to 50L)
      .map(k => k -> (k % 7, k * 10)).toMap
    Snapshots.create(spark, url,
      model.toSeq.map { case (k, (g, v)) => (k, g, v) }
        .toDF("k", "g", "value"),
      nFiles = 3, clusterBy = Some("k"))
    Snapshots.indexStats(spark, url, Seq("k"))
    Snapshots.indexBloom(spark, url, Seq("k"))
    var valCol = "value" // tracks the rename
    var nextKey = 100L

    def checkState(step: String): Unit = {
      val got = storeState(url, valCol)
      assert(got == model,
        s"$step diverged:\n  got   ${got.toSeq.sortBy(_._1)}\n" +
          s"  model ${model.toSeq.sortBy(_._1)}")
    }

    (1 to 30).foreach { step =>
      rng.nextInt(6) match {
        case 0 => // INSERT INTO ... VALUES (native V2 write)
          val rows = (1 to 1 + rng.nextInt(3)).map { _ =>
            val k = nextKey; nextKey += 1
            (k, k % 7, rng.nextInt(1000).toLong)
          }
          spark.sql(s"INSERT INTO gdm.prog VALUES " +
            rows.map { case (k, g, v) => s"($k, $g, $v)" }
              .mkString(", "))
          rows.foreach { case (k, g, v) => model += k -> (g, v) }
        case 1 => // DELETE FROM with a key band (banded route when
          // stats cover) or a group predicate (general route)
          if (rng.nextBoolean()) {
            val lo = rng.nextInt(60).toLong
            val hi = lo + rng.nextInt(20)
            spark.sql(
              s"DELETE FROM gdm.prog WHERE k BETWEEN $lo AND $hi")
            model = model.filterNot { case (k, _) =>
              k >= lo && k <= hi }
          } else {
            val g = rng.nextInt(7).toLong
            spark.sql(s"DELETE FROM gdm.prog WHERE g = $g " +
              s"AND $valCol > 500")
            model = model.filterNot { case (_, (gg, v)) =>
              gg == g && v > 500 }
          }
        case 2 => // UPDATE with band or predicate
          val d = 1 + rng.nextInt(9)
          if (rng.nextBoolean()) {
            val lo = rng.nextInt(60).toLong
            val hi = lo + rng.nextInt(15)
            spark.sql(s"UPDATE gdm.prog SET $valCol = $valCol + $d " +
              s"WHERE k BETWEEN $lo AND $hi")
            model = model.map { case (k, (g, v)) =>
              k -> (g, if (k >= lo && k <= hi) v + d else v) }
          } else {
            val g = rng.nextInt(7).toLong
            spark.sql(s"UPDATE gdm.prog SET $valCol = $valCol * 2 " +
              s"WHERE g = $g")
            model = model.map { case (k, (gg, v)) =>
              k -> (gg, if (gg == g) v * 2 else v) }
          }
        case 3 => // classic MERGE: update-matched + insert-unmatched
          val keys = (1 to 2 + rng.nextInt(3)).map { _ =>
            if (rng.nextBoolean() && model.nonEmpty)
              model.keys.toSeq(rng.nextInt(model.size))
            else { val k = nextKey; nextKey += 1; k }
          }.distinct
          val src = keys.map(k => (k, k % 7, rng.nextInt(100).toLong))
          src.toDF("k", "g", "d").createOrReplaceTempView("dm_src")
          spark.sql(
            s"""MERGE INTO gdm.prog AS t USING dm_src AS s
               |ON t.k = s.k
               |WHEN MATCHED THEN UPDATE SET
               |  g = s.g, $valCol = s.d
               |WHEN NOT MATCHED THEN INSERT (k, g, $valCol)
               |  VALUES (s.k, s.g, s.d)""".stripMargin)
          src.foreach { case (k, g, d) => model += k -> (g, d) }
        case 4 => // conditional multi-clause MERGE with DELETE arm
          val keys = model.keys.toSeq.sorted
            .take(3 + rng.nextInt(4))
          if (keys.nonEmpty) {
            keys.map(k => (k, rng.nextInt(50).toLong))
              .toDF("k", "d").createOrReplaceTempView("dm_src2")
            val rows = keys.map(k => k -> model(k)).toMap
            spark.sql(
              s"""MERGE INTO gdm.prog AS t USING dm_src2 AS s
                 |ON t.k = s.k
                 |WHEN MATCHED AND t.$valCol % 2 = 0 THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET
                 |  $valCol = t.$valCol + s.d""".stripMargin)
            keys.foreach { k =>
              val (g, v) = rows(k)
              if (v % 2 == 0) model -= k
              else {
                val d = spark.sql(
                  "SELECT d FROM dm_src2 WHERE k = " + k)
                  .as[Long].head()
                model += k -> (g, v + d)
              }
            }
          }
        case 5 => // ALTER RENAME the value column (metadata only)
          val next = if (valCol == "value") "val2" else "value"
          spark.sql(
            s"ALTER TABLE gdm.prog RENAME COLUMN $valCol TO $next")
          valCol = next
      }
      checkState(s"step $step (op class)")
    }

    // the CDC feed across the WHOLE program replays to the final
    // state (last change per key wins, deletes drop) — the lineage
    // crossed renames, native-write appends, banded and general
    // rewrites, and bloom-pruned merges
    val feed = Snapshots.changesAll(spark, url, "k")
      .select(col("k"), col("g"), col(valCol), col("_change"),
        col("_commit_version"))
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    val replayed = feed.groupBy(_._1).flatMap { case (k, rows) =>
      val last = rows.maxBy(_._5)
      if (last._4 == "delete") None else Some(k -> (last._2, last._3))
    }.toMap
    assert(replayed == model,
      "CDC replay of the whole program must equal the final state")
  }
}
