package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Shallow-clone contract: zero-copy hard links on local
  * filesystems, full independence of the two stores afterwards, and
  * survival of the shared inodes across either side's vacuum. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(tag: String): String =
    scratch(s"clone_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  private def nlink(path: String): Int =
    java.nio.file.Files
      .getAttribute(java.nio.file.Paths.get(path), "unix:nlink")
      .asInstanceOf[Number].intValue()

  test("clone is zero-copy on file:// (hard links), reads the " +
      "source version exactly, and refuses a non-empty target") {
    val src = freshUrl("src"); val dst = freshUrl("dst")
    val base = (1L to 50L).map(i => (i, i * 7)).toDF("id", "x")
    Snapshots.create(spark, src, base, nFiles = 3)
    assert(Snapshots.cloneStore(spark, src, dst) == 1)
    assert(Snapshots.read(spark, dst).as[(Long, Long)].collect()
      .toSet == base.as[(Long, Long)].collect().toSet)
    // every cloned data file is the SAME inode (link count 2)
    val files = Snapshots.snap(spark, dst, 1).files
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(nlink(s"$dst/$f") == 2, s"$f should be hard-linked")
    }
    intercept[IllegalArgumentException] {
      Snapshots.cloneStore(spark, src, dst)
    }
  }

  test("clone diverges independently and vacuum on either side " +
      "never breaks the other (inode survives name unlink)") {
    val src = freshUrl("div_src"); val dst = freshUrl("div_dst")
    val base = (1L to 40L).map(i => (i, i)).toDF("id", "x")
    Snapshots.create(spark, src, base, nFiles = 2)
    Snapshots.cloneStore(spark, src, dst)
    // source rewrites everything, then vacuums away the shared files
    Snapshots.overwrite(spark, src,
      Seq((999L, 999L)).toDF("id", "x"), nFiles = 1)
    Snapshots.vacuum(spark, src, keepFrom = 2, graceMs = 0L)
    // the clone still reads every original row through its links
    assert(Snapshots.read(spark, dst).count() == 40L)
    // and the clone's own commits never appear in the source
    Snapshots.upsert(spark, dst,
      Seq((1L, 111L, false)).toDF("id", "x", "del"),
      "id", deleteCol = Some("del"))
    assert(Snapshots.read(spark, dst).filter(col("x") === 111L)
      .count() == 1L)
    assert(Snapshots.read(spark, src).count() == 1L)
  }

  test("clone of an earlier version pins that version's rows") {
    val src = freshUrl("ver_src"); val dst = freshUrl("ver_dst")
    Snapshots.create(spark, src,
      Seq((1L, "a")).toDF("id", "v"), nFiles = 1)
    Snapshots.append(spark, src,
      Seq((2L, "b")).toDF("id", "v"), nFiles = 1)
    Snapshots.cloneStore(spark, src, dst, version = 1)
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect()
      .toSet == Set((1L, "a")))
  }
}
