package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single most recent
  * right row with `right.ts <= left.ts` in the same key group (the
  * time-series join Spark has no native operator for).
  *
  * Scale shape: tag and union both sides, then ONE hash shuffle on
  * the key with a running-frame window sweep ordered by
  * `(ts, side, tie)`: `last(payload, ignoreNulls)` over rows
  * unbounded-preceding..current carries the latest right payload into
  * every left row in a single O(n) pass per partition. No range
  * self-join, no per-row subquery, no broadcast nested loop; a
  * skewed key costs its partition's sort, nothing quadratic. This is
  * the union-sweep spelling of the classic merge-join as-of.
  *
  * Determinism: right rows sort BEFORE left rows at equal timestamps
  * (`<=` semantics), and among right rows with identical (key, ts)
  * the LAST payload in `rightPayload` order wins — pass a unique
  * column in `rightPayload` (e.g. an id) if right timestamps can
  * collide, otherwise the pick is still deterministic but
  * payload-order-defined.
  *
  * Output: every left row (all its columns) plus, for each payload
  * column `c`, `asof_c` — and `asof_ts`, the matched right timestamp
  * — all null when no right row precedes the left row.
  */
object AsOf {

  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asofBackward needs at least one key column")
    require(rightPayload.nonEmpty, "asofBackward needs payload columns")
    val leftRest = left.columns.toSeq.filterNot(keyCols.contains)
    val tsType = left.schema(leftTs).dataType
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).cast(tsType).as("__ts"), lit(1).as("__tag")) ++
        leftRest.map(col) ++
        rightPayload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) :+
        lit(null).cast(tsType).as("__p_ts"): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).cast(tsType).as("__ts"), lit(0).as("__tag")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__p_$c")) :+
        col(rightTs).cast(tsType).as("__p_ts"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts") +: col("__tag") +:
        rightPayload.map(c => col(s"__p_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightPayload.map(c => s"__p_$c" -> s"asof_$c") :+
      ("__p_ts" -> "asof_ts"))
    val swept = l.unionByName(r).select(
      (keyCols ++ Seq("__tag") ++ Seq(leftTs).filterNot(keyCols.contains) ++
        leftRest.filterNot(_ == leftTs)).map(col) ++
        carried.map { case (src, dst) =>
          last(col(src), ignoreNulls = true).over(w).as(dst)
        }: _*)
    swept.filter(col("__tag") === 1).drop("__tag")
  }
}
