package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.codecs.{DecodeImage, DecodeTensor, EncodeImage, EncodeTensor}

/** Column-level facade over graft's custom Catalyst expressions
  * (Spark 4's `Column` hides `.expr` behind the classic bridge).
  */
object GraftFunctions {
  def expr(c: Column): Expression = ColumnBridge.expression(c)
  def column(e: Expression): Column = ColumnBridge.column(e)

  /** Encode an array column (+ dims) into a GRT1 binary tensor cell. */
  def encodeTensor(dims: Column, data: Column, dtype: String,
      compressed: Boolean = false): Column =
    column(EncodeTensor(expr(dims), expr(data), dtype, compressed))

  /** Decode a GRT1 binary cell → struct<dims: array<int>, data: array<T>>. */
  def decodeTensor(bin: Column, dtype: String): Column =
    column(DecodeTensor(expr(bin), dtype))

  /** Encode dims (H,W) or (H,W,3) + flat uint8 pixel array (stored as
    * short) into png/jpeg bytes. */
  def encodeImage(dims: Column, data: Column, format: String,
      quality: Int = 80): Column =
    column(EncodeImage(expr(dims), expr(data), format, quality))

  /** Decode png/jpeg bytes → struct<dims: array<int>, data: array<short>>. */
  def decodeImage(bin: Column): Column =
    column(DecodeImage(expr(bin)))

  /** Nearest-neighbor resize of a decoded image struct's pixels. */
  def resizeNearest(dims: Column, data: Column, newH: Int, newW: Int): Column =
    column(graft.codecs.ResizeNearest(expr(dims), expr(data), newH, newW))

  /** PCM16LE binary → array<short> samples. */
  def decodePcm16(bin: Column): Column =
    column(graft.codecs.DecodePcm16(expr(bin)))

  /** PCM16LE binary → array<long> per-frame sum of squared samples
    * (fixed windows, trailing partial frame dropped). */
  def pcm16FrameEnergy(bin: Column, frameSamples: Int): Column =
    column(graft.codecs.Pcm16FrameEnergy(expr(bin), frameSamples))

  /** PCM16LE binary → array<long> per-frame zero-crossing counts
    * (same windows as [[pcm16FrameEnergy]] — the VAD pair). */
  def pcm16FrameZcr(bin: Column, frameSamples: Int): Column =
    column(graft.codecs.Pcm16FrameZcr(expr(bin), frameSamples))

  /** NumPy `.npy` cell → array<int> shape (petastorm-store interop,
    * see [[graft.codecs.NpyCodec]]). */
  def npyShape(bin: Column): Column =
    column(graft.codecs.NpyShape(expr(bin)))

  /** NumPy `.npy` cell → dtype descr string (e.g. '<f4'). */
  def npyDescr(bin: Column): Column =
    column(graft.codecs.NpyDescr(expr(bin)))

  /** NumPy `.npy` integer/bool cell → array<long>, C order. */
  def npyLongs(bin: Column): Column =
    column(graft.codecs.NpyLongs(expr(bin)))

  /** NumPy `.npy` float cell → array<double>, C order. */
  def npyDoubles(bin: Column): Column =
    column(graft.codecs.NpyDoubles(expr(bin)))

  /** NumPy `.npy` string cell (`|Sn`, `<Un`) → array<string>. */
  def npyStrings(bin: Column): Column =
    column(graft.codecs.NpyStrings(expr(bin)))

  /** array<long> + dims → `.npy` cell bytes (np.save byte-parity;
    * integer/bool descrs, range-checked). */
  def npyFromLongs(data: Column, dims: Column, descr: String): Column =
    column(graft.codecs.NpyFromLongs(expr(data), expr(dims), descr))

  /** array<double> + dims → `.npy` cell bytes (`<f4`/`<f8`). */
  def npyFromDoubles(data: Column, dims: Column, descr: String): Column =
    column(graft.codecs.NpyFromDoubles(expr(data), expr(dims), descr))

  /** `.npy` bytes → `.npz` cell (the zip/deflate container
    * petastorm's CompressedNdarrayCodec reads; deterministic bytes,
    * see [[graft.codecs.NpzCodec]]). */
  def npzWrap(npy: Column): Column =
    column(graft.codecs.NpzWrap(expr(npy)))

  /** `.npz` cell → the contained `.npy` bytes (compose with the
    * `npy*` decode family). */
  def npzUnwrap(npz: Column): Column =
    column(graft.codecs.NpzUnwrap(expr(npz)))

  /** Inversion count (pairs i<j with a(i) > a(j)) of an array<long>
    * — mergesort kernel, see [[graft.codecs.RankMath]]. */
  def seqInversions(arr: Column): Column =
    column(graft.codecs.SeqInversions(expr(arr)))

  /** Pairs (x∈a, y∈b) with x > y over two ASCENDING-sorted
    * array<long> columns — two-pointer merge kernel. */
  def sortedMergeGreater(a: Column, b: Column): Column =
    column(graft.codecs.SortedMergeGreater(expr(a), expr(b)))

  /** Luhn mod-10 card-number check (separators tolerated). */
  def luhnValid(s: Column): Column =
    column(graft.ops.LuhnValid(expr(s)))

  /** Max-abs int8 quantization of a float/double vector →
    * struct<scale: double, q: array<tinyint>>. */
  def quantizeInt8(vec: Column): Column =
    column(graft.codecs.QuantizeInt8(expr(vec)))

  /** Exact integer dot product of two int8 vectors → long. */
  def dotI8(a: Column, b: Column): Column =
    column(graft.codecs.DotI8(expr(a), expr(b)))

  /** Codegen'd sum of an array<long> → long (the tight-loop form of
    * the interpreted `aggregate(arr, 0L, (a, x) -> a + x)` HOF). */
  def arraySumLong(arr: Column): Column =
    column(graft.codecs.ArraySumLong(expr(arr)))

  /** Weighted-sampling race key: min over t in [0, w) of the
    * double-hash mix (h1 + t·h2) mod 2^60 — see
    * [[graft.codecs.HashRace]]. */
  def ticketRaceMin(h1: Column, h2: Column, w: Column): Column =
    column(graft.codecs.TicketRaceMin(expr(h1), expr(h2), expr(w)))

  /** Element-wise `floor(x·1e6)` over a float/double vector →
    * array<long> — the exact-integer embedding space
    * [[graft.ops.SemanticDedup.kmeansInt]] clusters in. */
  def floorMicros(vec: Column): Column =
    column(graft.codecs.FloorMicros(expr(vec)))

  /** Nearest integer centroid by exact squared L2 (micros space) →
    * struct<cluster: int, dist: long>, ties to the lowest index. */
  def argMinL2M(vm: Column, centroids: Array[Array[Long]]): Column =
    column(graft.codecs.ArgMinL2M(expr(vm), centroids))

  /** Hashed n-gram bucket histogram of a token array → array<long>
    * of length `buckets` (the DSIR/fastText feature map). */
  def hashedGramCounts(toks: Column, n: Int, buckets: Int): Column =
    column(graft.codecs.HashedGramCounts(expr(toks), n, buckets))

  /** Broadcast linear scorer over a long histogram → long
    * (`Σ counts_i·w_i`, exact integers). */
  def linearScoreLong(counts: Column, weights: Array[Long]): Column =
    column(graft.codecs.LinearScoreLong(expr(counts), weights))

  /** Scan-speed membership probe against a serialized Bloom filter
    * (never a false negative) — the generic exchange prefilter behind
    * [[graft.ops.NearDedup.bloomContamination]]. */
  def bloomMightContain(s: Column, filterBytes: Array[Byte]): Column =
    column(graft.codecs.BloomMightContain(expr(s), filterBytes))
}
