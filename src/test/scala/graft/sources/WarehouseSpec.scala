package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Warehouse sweep: one entry point drives recoverTxns →
  * compactSmall → vacuum per store, reports per-store outcomes, and
  * isolates a wedged store to its own error row. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("maintain recovers open txns, compacts epoch debris, vacuums " +
      "history (tag pins survive), and isolates a wedged store") {
    val root = scratch(
      s"wh/${java.util.UUID.randomUUID().toString.take(8)}")
    // store A: many tiny appends (streaming-epoch shape) + history
    val a = s"$root/a"
    Snapshots.create(spark, a,
      (1L to 50L).map(i => (i, i)).toDF("id", "v"), nFiles = 1)
    (1 to 4).foreach(k => Snapshots.append(spark, a,
      Seq((50L + k, 1L)).toDF("id", "v"), nFiles = 1))
    Snapshots.setTag(spark, a, "gold", 1)
    // store B: an open (crashed) txn journal
    val b = s"$root/b"
    Snapshots.create(spark, b,
      (1L to 10L).map(i => (i, i)).toDF("id", "v"), nFiles = 1)
    val v0 = Snapshots.latest(spark, b)
    val v1 = Snapshots.append(spark, b,
      (11L to 20L).map(i => (i, i)).toDF("id", "v"), 1)
    val added = Snapshots.snap(spark, b, v1).files
      .filterNot(Snapshots.snap(spark, b, v0).files.toSet)
    val bRoot = new org.apache.hadoop.fs.Path(b)
    val fs = bRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(bRoot,
      f"_snap/v$v1%08d.json"), false)
    Snapshots.writeTxnMarkers(spark, Snapshots.TxnPlan("whcrash",
      Seq(Snapshots.TxnPart(b, added))))
    // store C: wedged (corrupt manifest dir — a FILE where _snap
    // children parse fails)
    val c = s"$root/c"
    Snapshots.create(spark, c, Seq((1L, 1L)).toDF("id", "v"), 1)
    val cBad = new org.apache.hadoop.fs.Path(
      s"$c/_snap/v99999999.json")
    val out = fs.create(cBad, false)
    try out.write("not-json".getBytes("UTF-8")) finally out.close()

    val rep = Warehouse.maintain(spark, root, keepLast = 1,
      graceMs = 0L, smallBytes = 1L << 20)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet == Set("a", "b", "c"))
    // A: compacted + vacuumed, tag pin survives
    val ra = rep("a")
    assert(ra.getLong(2) == 1L, "small appends must compact")
    assert(ra.getLong(4) > 0L, "history must vacuum")
    assert(ra.getAs[String]("error") == null)
    assert(Snapshots.tags(spark, a) == Seq(("gold", 1)))
    assert(Snapshots.readTag(spark, a, "gold").count() == 50L)
    assert(Snapshots.read(spark, a).count() == 54L)
    // B: the open txn rolled forward, then vacuumed cleanly
    val rb = rep("b")
    assert(rb.getLong(1) == 1L, "open txn must recover")
    assert(rb.getAs[String]("error") == null)
    assert(Snapshots.read(spark, b).count() == 20L)
    assert(Snapshots.pendingTxns(spark, b).isEmpty)
    // C: errored in its own row; the sweep still served A and B
    assert(rep("c").getAs[String]("error") != null)
  }

  test("maintain sweeps stores CONCURRENTLY (bounded pool), report " +
      "stays per-store exact and deterministic in order") {
    val root = scratch(
      s"whp/${java.util.UUID.randomUUID().toString.take(8)}")
    val n = 12
    (0 until n).foreach { i =>
      val url = f"$root/s$i%02d"
      Snapshots.create(spark, url,
        (1L to 20L).map(k => (k, k + i)).toDF("id", "v"), nFiles = 1)
      // two tiny appends: compactable debris + vacuumable history
      Snapshots.append(spark, url, Seq((100L + i, 1L)).toDF("id", "v"),
        nFiles = 1)
      Snapshots.append(spark, url, Seq((200L + i, 2L)).toDF("id", "v"),
        nFiles = 1)
    }
    val rep = Warehouse.maintain(spark, root, keepLast = 1,
      graceMs = 0L, smallBytes = 1L << 20, parallelism = 6)
      .collect()
    // deterministic row order = sorted store names, one row each
    assert(rep.map(_.getString(0)).toSeq ==
      (0 until n).map(i => f"s$i%02d"))
    rep.foreach { r =>
      assert(r.getAs[String]("error") == null,
        s"store ${r.getString(0)} errored: ${r.getAs[String]("error")}")
      assert(r.getLong(2) == 1L,
        s"store ${r.getString(0)} must compact its debris")
    }
    // every store's data is intact and exact after the parallel sweep
    (0 until n).foreach { i =>
      val url = f"$root/s$i%02d"
      assert(Snapshots.read(spark, url).count() == 22L)
      assert(Snapshots.read(spark, url)
        .filter(col("id") === 1L).select(col("v")).as[Long]
        .head() == 1L + i)
    }
  }
}
