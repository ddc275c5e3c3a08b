package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Named refs (tags): immutable human-named version pins, the
  * reproducible-training-set primitive — and their vacuum contract
  * (a tagged version's manifest AND files survive any keepFrom). */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    scratch(s"tags_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  test("setTag pins, readTag reads the pin, immutability + unknown " +
      "names refuse loudly, deleteTag lifts the pin") {
    val url = fresh("basic")
    Snapshots.create(spark, url,
      (1L to 100L).map(i => (i, i * 2)).toDF("id", "v"), nFiles = 2)
    val v1 = Snapshots.latest(spark, url)
    assert(Snapshots.setTag(spark, url, "train-v1") == v1)
    Snapshots.append(spark, url,
      (101L to 150L).map(i => (i, i * 2)).toDF("id", "v"), nFiles = 1)
    // the tag keeps meaning v1 even as the head moves
    assert(Snapshots.readTag(spark, url, "train-v1").count() == 100L)
    assert(Snapshots.tagVersion(spark, url, "train-v1") == v1)
    assert(Snapshots.tags(spark, url) == Seq(("train-v1", v1)))
    // immutable pin: re-tagging the name is refused
    intercept[IllegalArgumentException] {
      Snapshots.setTag(spark, url, "train-v1")
    }
    // unknown names and bad names refuse loudly
    intercept[IllegalArgumentException] {
      Snapshots.readTag(spark, url, "nope")
    }
    intercept[IllegalArgumentException] {
      Snapshots.setTag(spark, url, "../evil")
    }
    intercept[IllegalArgumentException] {
      Snapshots.setTag(spark, url, "x", version = 99)
    }
    Snapshots.deleteTag(spark, url, "train-v1")
    assert(Snapshots.tags(spark, url).isEmpty)
    intercept[IllegalArgumentException] {
      Snapshots.deleteTag(spark, url, "train-v1") // already gone
    }
    // the name is reusable after deletion, at a new version
    val v2 = Snapshots.latest(spark, url)
    assert(Snapshots.setTag(spark, url, "train-v1") == v2)
    assert(Snapshots.readTag(spark, url, "train-v1").count() == 150L)
  }

  test("vacuum keeps a tagged version's manifest and files alive " +
      "below keepFrom; deleteTag makes it collectable again") {
    val url = fresh("vac")
    // v1: ids 1-100 | v2: +101-200 | v3: overwrite to 1-50
    Snapshots.create(spark, url,
      (1L to 100L).map(i => (i, i)).toDF("id", "v"), nFiles = 2)
    val v1 = Snapshots.latest(spark, url)
    Snapshots.setTag(spark, url, "pin", v1)
    Snapshots.append(spark, url,
      (101L to 200L).map(i => (i, i)).toDF("id", "v"), nFiles = 2)
    val v2 = Snapshots.latest(spark, url)
    Snapshots.overwrite(spark, url,
      (1L to 50L).map(i => (i, i)).toDF("id", "v"), nFiles = 1)
    val v3 = Snapshots.latest(spark, url)
    val (files, manifests) = Snapshots.vacuum(spark, url, v3, graceMs = 0L)
    // v2's exclusive files died with its manifest; v1 survived whole
    assert(manifests == 1, s"expected only v$v2 retired, got $manifests")
    assert(files > 0, "v2's exclusive files should have been collected")
    assert(Snapshots.versions(spark, url) == Seq(v1, v3))
    assert(Snapshots.readTag(spark, url, "pin").count() == 100L)
    assert(Snapshots.readAsOf(spark, url, v1)
      .agg(sum("v")).as[Long].head() == (1L to 100L).sum)
    // lift the pin: the next vacuum collects v1 too
    Snapshots.deleteTag(spark, url, "pin")
    val (_, m2) = Snapshots.vacuum(spark, url, v3, graceMs = 0L)
    assert(m2 == 1)
    assert(Snapshots.versions(spark, url) == Seq(v3))
    intercept[Exception] { Snapshots.readAsOf(spark, url, v1).count() }
  }
}
