package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.schema.{FieldSpec, GraftSchema}
import graft.sources.{Materialize, RowGroupIndex}

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(bits: Int, vals: Seq[Long]): Long = {
    var out = 0L
    for (j <- vals.indices; i <- 0 until bits)
      out |= ((vals(j) >> i) & 1L) << (i * vals.length + j)
    out
  }

  test("zvalue matches the reference interleave bit for bit") {
    val rows = for (a <- 0L until 8L; b <- 0L until 8L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select($"a", $"b", Zorder.zvalue(3, $"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == refInterleave(3, Seq(a, b)), s"($a,$b)")
    }
    // 3-column interleave too
    val g3 = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
      .select(Zorder.zvalue(2, $"a", $"b", $"c")).as[Long].collect().head
    assert(g3 == refInterleave(2, Seq(1L, 2L, 3L)))
  }

  test("zvalue is monotone on rectangles and out-of-range raises") {
    // all points in the low quadrant sort before any in the high one
    val z = (a: Long, b: Long) => refInterleave(4, Seq(a, b))
    val low = for (a <- 0L until 8L; b <- 0L until 8L) yield z(a, b)
    val high = for (a <- 8L until 16L; b <- 8L until 16L) yield z(a, b)
    assert(low.max < high.min)
    val e = intercept[Exception] {
      Seq((0L, 16L)).toDF("a", "b")
        .select(Zorder.zvalue(4, $"a", $"b")).collect()
    }
    assert(e.getMessage.contains("out of"))
  }

  test("z-clustered store skips files on the SECOND dimension") {
    // 64x64 grid; 4096 rows into 8 files. Sorted by `a`, every file
    // spans all b values -> a b-selector admits everything. Z-ordered,
    // each file covers a sub-rectangle -> the same selector skips.
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val schema = GraftSchema("z", Seq(
      FieldSpec("a", LongType), FieldSpec("b", LongType)))
    def store(name: String, df: org.apache.spark.sql.DataFrame): (String, String) = {
      val u = scratch("zorder-" + name + "-" +
        java.util.UUID.randomUUID().toString.take(8))
      Materialize.materialize(
        df.repartitionByRange(8, col("__k")).sortWithinPartitions(col("__k"))
          .drop("__k"),
        u, schema, partitions = None)
      val ix = u + "-index"
      RowGroupIndex.build(spark, u, Seq(RowGroupIndex.Indexer("b")), ix)
      (u, ix)
    }
    val (aSorted, aIx) = store("asorted", grid.withColumn("__k", col("a")))
    val (zOrdered, zIx) = store("zord",
      grid.withColumn("__k", Zorder.zvalue(6, col("a"), col("b"))))
    val sel = RowGroupIndex.ValueIn("b", Seq(7L))
    val aFiles = RowGroupIndex.selectedFiles(spark, aSorted, aIx, sel).size
    val zFiles = RowGroupIndex.selectedFiles(spark, zOrdered, zIx, sel).size
    assert(aFiles == 8, s"a-sorted store admitted $aFiles of 8")
    assert(zFiles < aFiles, s"z store admitted $zFiles, expected < $aFiles")
    // and the read still returns exactly the right rows
    val rows = RowGroupIndex.readSelected(spark, zOrdered, zIx, sel)
      .filter($"b" === 7).select($"a").as[Long].collect().sorted
    assert(rows.toSeq == (0L until 64L))
  }
}
