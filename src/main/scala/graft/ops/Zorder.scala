package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for MULTI-dimensional data skipping.
  *
  * A store sorted by one column skips beautifully on that column and
  * not at all on any other: every file spans the full range of the
  * second dimension. Interleaving the bits of two or three bounded
  * integer keys into one sort key makes each written file cover a
  * sub-RECTANGLE of the key space, so min/max (or value-set) file
  * indexes prune on EITHER dimension — the standard lakehouse layout
  * trick, and the layout lever behind [[graft.sources.RowGroupIndex]]
  * at 100 TB when queries filter on more than one column.
  *
  * The z-value is composed from built-in shift/and/or expressions
  * (whole-stage codegen keeps the ~2·bits ops at scan speed; no
  * custom kernel needed) in pure integer arithmetic any engine
  * reproduces: bit i of column j lands at position `i·n + j`.
  * Inputs must sit in `[0, 2^bits)` — out-of-range values raise
  * rather than silently folding into a wrong cell. */
object Zorder {

  /** Morton interleave of the low `bits` bits of each column
    * (2 or 3 integral columns; `n·bits ≤ 63`). */
  def zvalue(bits: Int, cols: Column*): Column = {
    val n = cols.size
    require(n >= 2 && n <= 3, s"zvalue interleaves 2-3 columns, got $n")
    require(bits > 0 && n * bits <= 63,
      s"need bits in (0, ${63 / n}] for $n columns, got $bits")
    val lim = 1L << bits
    cols.zipWithIndex.map { case (c, j) =>
      val v0 = c.cast("long")
      val v = when(v0 < 0 || v0 >= lim, raise_error(concat(
          lit(s"zvalue input out of [0, $lim): "), v0.cast("string"))))
        .otherwise(v0)
      (0 until bits).map { i =>
        shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Order-preserving integer key for a STRING column: the first
    * `nBytes` UTF-8 bytes as an unsigned big-endian integer
    * (right-padded with NUL so shorter strings order below their
    * extensions, exactly like byte-wise string comparison). Byte
    * truncation is prefix-order-preserving, so
    * `a <= b ⇒ stringKey(a) <= stringKey(b)` under the engine's
    * UTF-8 binary collation — the property that lets a z-order
    * layout carry a name dimension: interleave `stringKey(name)`
    * with the numeric keys, cluster, and string prefix bands
    * ([[graft.sources.Snapshots.indexStats]]) prune on the name
    * while the numeric bands prune on the rest. Built-in
    * expressions only (codegen'd); `nBytes ≤ 7` keeps the value in
    * a positive long. Pair with [[zvalue]] at `bits = 8·nBytes`,
    * which bounds nBytes by the dimension count (2 dims → nBytes ≤ 3
    * at bits = 24; 3 dims → nBytes ≤ 2 at bits = 16 — prefix keys
    * this short still spread real name distributions fine, ties
    * fall to the z-sort's stability). */
  def stringKey(c: Column, nBytes: Int = 4): Column = {
    require(nBytes >= 1 && nBytes <= 7,
      s"nBytes in [1,7] (8·nBytes zvalue bits ≤ 63 with room), " +
        s"got $nBytes")
    conv(hex(substring(encode(rpad(c, nBytes, "\u0000"), "UTF-8"),
      1, nBytes)), 16, 10).cast("long")
  }

  /** Range-partition + sort `df` by the z-value of `cols` — write the
    * result ([[graft.sources.Materialize.materialize]] with
    * `partitions = None`) and each output file covers a z-contiguous
    * sub-rectangle; index either column and selectors skip files.
    * One range shuffle, fully parallel. */
  def cluster(df: DataFrame, bits: Int, cols: Column*): DataFrame = {
    val z = zvalue(bits, cols: _*)
    df.repartitionByRange(z).sortWithinPartitions(z)
  }
}
