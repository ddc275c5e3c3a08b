package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** intervalJoin: stream/batch parity, cross-micro-batch pairing,
  * interval bounds, and the distinct-ts-name guard.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // clicks: (click_id, uid, click_ts) / purchases: (p_id, uid, p_ts)
  private val clickRows = Seq(
    (1L, 7L, ts(0)), (2L, 7L, ts(20)), (3L, 8L, ts(5)))
  private val purchaseRows = Seq(
    (10L, 7L, ts(3)),   // pairs with click 1 (within 5 min)
    (11L, 7L, ts(21)),  // pairs with click 2
    (12L, 7L, ts(30)),  // 10 min after click 2 → out of bound
    (13L, 8L, ts(4)),   // BEFORE click 3 → not paired
    (14L, 9L, ts(6)))   // no click for user 9

  private def joined(cl: DataFrame, pu: DataFrame): DataFrame =
    GraftStream.intervalJoin(cl, pu, "uid", "click_ts", "p_ts",
        watermarkDelay = "1 hour", bound = "5 minutes")
      .select(col("l.uid").as("uid"), col("click_id"), col("p_id"))

  private val expected = Set((7L, 1L, 10L), (7L, 2L, 11L))

  test("batch form: pairs exactly the in-window same-key rows") {
    val out = joined(
        clickRows.toDF("click_id", "uid", "click_ts"),
        purchaseRows.toDF("p_id", "uid", "p_ts"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == expected)
  }

  test("streaming form matches the batch answer (memory sink, append)") {
    val dir = scratch("sjoin-" + java.util.UUID.randomUUID().toString.take(8))
    clickRows.toDF("click_id", "uid", "click_ts").write
      .mode("overwrite").parquet(s"$dir/clicks")
    purchaseRows.toDF("p_id", "uid", "p_ts").write
      .mode("overwrite").parquet(s"$dir/purchases")
    val cl = spark.readStream.schema("click_id LONG, uid LONG, click_ts TIMESTAMP")
      .parquet(s"$dir/clicks")
    val pu = spark.readStream.schema("p_id LONG, uid LONG, p_ts TIMESTAMP")
      .parquet(s"$dir/purchases")
    val q = joined(cl, pu).writeStream.format("memory")
      .queryName("sjoin_parity")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("sjoin_parity")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == expected)
  }

  test("pairs land across micro-batches via buffered join state") {
    // clicks arrive in batch 1, purchases in batch 2 (newer file,
    // maxFilesPerTrigger=1): the match must come from the join's
    // buffered left state, not from co-arrival
    val dir = scratch("sjoin-xb-" + java.util.UUID.randomUUID().toString.take(8))
    val evDir = new java.io.File(s"$dir/events"); evDir.mkdirs()
    def land(name: String, modTime: Long, df: DataFrame): Unit = {
      val tmp = s"$dir/tmp-$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(evDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(modTime))
    }
    val t0 = System.currentTimeMillis() - 60000
    // unified event log: kind discriminates the two sides
    land("a.parquet", t0, clickRows.toDF("id", "uid", "ts")
      .withColumn("kind", lit("click")))
    land("b.parquet", t0 + 5000, purchaseRows.toDF("id", "uid", "ts")
      .withColumn("kind", lit("purchase")))
    val ev = spark.readStream
      .schema("id LONG, uid LONG, ts TIMESTAMP, kind STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(evDir.getAbsolutePath)
    val cl = ev.filter($"kind" === "click")
      .select($"id".as("click_id"), $"uid", $"ts".as("click_ts"))
    val pu = ev.filter($"kind" === "purchase")
      .select($"id".as("p_id"), $"uid", $"ts".as("p_ts"))
    val q = joined(cl, pu).writeStream.format("memory")
      .queryName("sjoin_xbatch")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("sjoin_xbatch")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == expected)
  }

  test("same-named time columns are refused") {
    val e = intercept[IllegalArgumentException] {
      GraftStream.intervalJoin(
        clickRows.toDF("click_id", "uid", "ts"),
        purchaseRows.toDF("p_id", "uid", "ts"),
        "uid", "ts", "ts", "1 hour", "5 minutes")
    }
    assert(e.getMessage.contains("named apart"))
  }
}
