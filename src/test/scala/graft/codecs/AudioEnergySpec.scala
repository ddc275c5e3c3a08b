package graft.codecs

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Pcm16FrameEnergy: exact integer energies, little-endian signed
  * decode, partial-frame drop, agreement with decodePcm16.
  */
class AudioEnergySpec extends SparkSpec {
  import spark.implicits._

  private def pcm(samples: Short*): Array[Byte] =
    samples.flatMap(s => Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte))
      .toArray

  private def run(bytes: Array[Byte], frame: Int): Seq[Long] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.pcm16FrameEnergy(col("b"), frame).as("e"))
      .as[Seq[Long]].head()

  test("exact sum of squares per frame, little-endian signed") {
    // frames of 2: [3,-4] -> 25; [100,-200] -> 50000
    assert(run(pcm(3, -4, 100, -200), 2) == Seq(25L, 50000L))
  }

  test("trailing partial frame and odd byte are dropped") {
    assert(run(pcm(5, 5, 7), 2) == Seq(50L))       // third sample dropped
    assert(run(pcm(5, 5) :+ 0x7F.toByte, 2) == Seq(50L)) // odd byte dropped
    assert(run(pcm(1), 2) == Seq.empty)            // sub-frame input
  }

  test("extreme samples do not overflow") {
    val e = run(pcm(Short.MinValue, Short.MaxValue), 2)
    assert(e == Seq(32768L * 32768L + 32767L * 32767L))
  }

  test("agrees with decodePcm16-then-fold for arbitrary bytes") {
    val bytes = Array.tabulate(64)(i => ((i * 37 + 11) % 256).toByte)
    val viaDecode = Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.decodePcm16(col("b")).as("s"))
      .as[Seq[Short]].head()
      .grouped(8).filter(_.length == 8)
      .map(_.map(v => v.toLong * v).sum).toSeq
    assert(run(bytes, 8) == viaDecode)
  }
}
