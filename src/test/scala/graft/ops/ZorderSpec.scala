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

  test("stringKey is order-preserving under the engine's binary " +
      "collation (padding, control chars, multibyte, truncation)") {
    val vals = Seq("", "a", "a\t", "a ", "ab", "abc", "abcd",
      "abcde", "b", "ba", "\u00e9", "\u00e9a", "\u4e2d\u6587", "zz")
    val df = vals.toDF("s")
      .select(col("s"), Zorder.stringKey(col("s"), 3).as("k"))
    // the engine collation is UTF-8 BYTE order (what Spark sorts
    // and the prefix bands store) -- compare in it, not UTF-16
    def u8lt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    // ordering by the key never inverts a strict string ordering
    // (ties allowed -- truncation)
    val pairs = df.as[(String, Long)].collect()
    for (a <- pairs; b <- pairs if u8lt(a._1, b._1))
      assert(a._2 <= b._2, s"key order inverted: $a vs $b")
    // bounded for zvalue at bits = 24
    assert(pairs.forall(p => p._2 >= 0L && p._2 < (1L << 24)))
    // exact (collision-free) when strings fit the key
    val short = pairs.filter(_._1.getBytes("UTF-8").length <= 3)
    assert(short.map(_._2).distinct.length == short.length)
  }
}
