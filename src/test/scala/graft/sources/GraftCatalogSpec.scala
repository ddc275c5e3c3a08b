package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pure-SQL access through the V2 catalog: every snapshot store under
  * the warehouse root is a SQL table; VERSION AS OF / TIMESTAMP AS OF
  * resolve manifests; the catalog is read-only and refuses
  * MoR/renamed stores loudly (the raw parquet scan cannot translate
  * them). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = scratch(
      s"catalog/${java.util.UUID.randomUUID().toString.take(8)}")
    spark.conf.set("spark.sql.catalog.gcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.root",
      new java.io.File(r).getAbsolutePath)
    r
  }

  test("SQL select + pushdown, VERSION AS OF, TIMESTAMP AS OF, " +
      "listTables, evolution nulls") {
    Snapshots.create(spark, s"$root/events",
      (1L to 100L).map(i => (i, i * 2)).toDF("id", "v"), nFiles = 4)
    Snapshots.deleteWhere(spark, s"$root/events", "id", 1L, 40L)
    // latest = post-delete; VERSION AS OF 1 = the full version
    assert(spark.sql("SELECT count(*) AS n FROM gcat.events")
      .as[Long].head() == 60L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM gcat.events VERSION AS OF 1")
      .as[Long].head() == 100L)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM gcat.events WHERE id <= 50")
      .as[Long].head() == (41L to 50L).map(_ * 2).sum)
    // TIMESTAMP AS OF now → the latest version
    val nowIso = java.time.Instant.now().plusSeconds(2).toString
    assert(spark.sql(
      s"SELECT count(*) FROM gcat.events TIMESTAMP AS OF '$nowIso'")
      .as[Long].head() == 60L)
    // listing sees the store
    assert(spark.sql("SHOW TABLES IN gcat").collect()
      .map(_.getString(1)).contains("events"))
    // table properties surface the resolved version + op
    val props = spark.sql("SHOW TBLPROPERTIES gcat.events").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.version") == "2" &&
      props("graft.op") == "delete")
    // additive evolution: old files read the new column as null
    Snapshots.append(spark, s"$root/events",
      Seq((101L, 202L, "tagged")).toDF("id", "v", "tag"))
    val tags = spark.sql(
      "SELECT count(*) AS total, count(tag) AS tagged " +
        "FROM gcat.events").as[(Long, Long)].head()
    assert(tags == ((61L, 1L)))
  }

  test("read-only: INSERT/CREATE/DROP refuse; MoR and renamed " +
      "stores refuse with the Snapshots.read hint") {
    Snapshots.create(spark, s"$root/guard",
      (1L to 20L).map(i => (i, s"b$i")).toDF("id", "body"),
      nFiles = 1)
    intercept[Exception] {
      spark.sql("INSERT INTO gcat.guard VALUES (21, 'x')")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("DROP TABLE gcat.guard")
    }
    // MoR store: loud refusal naming the escape hatch
    Snapshots.deleteWhereMor(spark, s"$root/guard", "id", 1L, 2L)
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM gcat.guard").collect()
    }
    assert(e.getMessage.contains("purgeDv"))
    // renamed store: same doctrine
    Snapshots.create(spark, s"$root/renamed",
      Seq((1L, "a")).toDF("id", "t"), nFiles = 1)
    Snapshots.renameColumn(spark, s"$root/renamed", "t", "txt")
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.renamed").collect()
    }
    assert(e2.getMessage.contains("renamed columns"))
  }
}
