package graft.codecs

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Ticket-race minimum for weighted sampling
  * ([[graft.ops.Sampling.weightedSample]]): a row with `w` tickets
  * draws ticket t's value as the DOUBLE-HASH mix
  *
  *   draw(t) = (h1 + t·h2) mod 2^60
  *
  * and races on the minimum draw. `h1`/`h2` are two independent
  * 60-bit uniforms from ONE md5 of the row key (hex digits 1-15 and
  * 17-31) — the classic "one strong hash, w cheap mixes" double
  * hashing construction, here chosen over per-ticket md5 because at
  * 10⁹ rows × 1000 tickets the per-ticket form is 10¹² md5 calls
  * (the r7 perf flag); the mix is one wrapping add + mask per ticket.
  *
  * Engine-portability of the arithmetic (the determinism contract):
  * Java's wrapping + is exact arithmetic mod 2^64, and powers of two
  * nest — (x mod 2^64) mod 2^60 = x mod 2^60 — so the masked
  * accumulator equals the mathematical (h1 + t·h2) mod 2^60, which an
  * oracle with big-integer arithmetic (DuckDB HUGEINT) reproduces
  * literally. The modulus must match the 60-bit range of h1 (ticket
  * 0's draw is h1 itself): mixing, say, 60-bit first draws with
  * 63-bit mixes would bias every row's minimum toward ticket 0 and
  * break weight-proportional odds.
  *
  * Statistical contract (the documented trade, r8 advice): a row's
  * draws form an arithmetic progression mod 2^60, not independent
  * uniforms — within-row minima are slightly more regular than iid
  * md5 draws, and a degenerate h2 (tiny, or sharing a large
  * power-of-two factor with 2^60) reduces dispersion, so selection
  * odds are only APPROXIMATELY weight-proportional. This is accepted
  * deliberately: the race must be replayable in integer SQL (the
  * q93 oracle) and priced at one md5 per row, and the bias is
  * second-order for sampling training data (both md5 halves are
  * full-strength uniforms; h2 = 0 or small has probability ~2^-60).
  * If tighter uniformity ever matters, re-hash `h1 + t·h2` through a
  * multiply-xor finalizer — still SQL-replayable — and update the
  * DuckDB oracle in the same change.
  */
object HashRace {
  /** 2^60 − 1: draws live in [0, 2^60). */
  val Mask: Long = (1L << 60) - 1

  /** min over t in [0, w) of ((h1 + t·h2) mod 2^60); callers
    * guarantee w ≥ 1 (rows without tickets never reach the race). */
  def raceMin(h1: Long, h2: Long, w: Long): Long = {
    var acc = h1
    var m = h1 & Mask
    var t = 1L
    while (t < w) {
      acc += h2 // wrapping: exact mod 2^64
      val d = acc & Mask // nested power of two: exact mod 2^60
      if (d < m) m = d
      t += 1
    }
    m
  }
}

/** `ticket_race_min(h1, h2, w)` → long (codegen'd tight loop). */
case class TicketRaceMin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(h1: Any, h2: Any, w: Any): Any =
    HashRace.raceMin(h1.asInstanceOf[Long], h2.asInstanceOf[Long],
      w.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h1, h2, w) =>
      s"graft.codecs.HashRace.raceMin($h1, $h2, $w)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): TicketRaceMin =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ticket_race_min"
}
