package graft.predicates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable row-predicate algebra.
  *
  * Parity with the reference's predicate surface
  * (/root/reference/petastorm/predicates.py:27-182): membership
  * (`in_set`), array-intersection (`in_intersection`), arbitrary
  * expression (`in_lambda` — here a Catalyst `Column`, so it stays
  * codegen'd instead of dropping to a closure), negation, AND/OR
  * reduction, and a deterministic hash-bucket dataset split
  * (`in_pseudorandom_split`).
  *
  * Every predicate compiles to a Catalyst `Column`, so Catalyst gets
  * to push it into the parquet scan (row-group stats / dictionary /
  * partition pruning) — the reference implements pushdown by hand
  * (reader.py:620-652, py_dict_reader_worker.py:197-262); here it is
  * free and works at any scale.
  */
sealed trait RowPredicate {
  /** Column-level compilation — attach with `df.filter(p.toColumn)`. */
  def toColumn: Column
  /** Fields the predicate reads (reference: `get_fields`). */
  def fields: Set[String]
  def &&(other: RowPredicate): RowPredicate = ReduceAnd(Seq(this, other))
  def ||(other: RowPredicate): RowPredicate = ReduceOr(Seq(this, other))
  def unary_! : RowPredicate = Negate(this)
}

/** field value ∈ values (predicates.py:44-55). */
final case class InSet(field: String, values: Seq[Any]) extends RowPredicate {
  def toColumn: Column = col(field).isin(values: _*)
  def fields: Set[String] = Set(field)
}

/** array-typed field has non-empty intersection with `values`
  * (predicates.py:58-71). */
final case class InIntersection(field: String, values: Seq[Any])
    extends RowPredicate {
  def toColumn: Column =
    arrays_overlap(col(field), array(values.map(lit): _*))
  def fields: Set[String] = Set(field)
}

/** Arbitrary boolean Column over named fields (predicates.py:74-100's
  * `in_lambda`, kept declarative). */
final case class InExpr(fieldSet: Set[String], expr: Column)
    extends RowPredicate {
  def toColumn: Column = expr
  def fields: Set[String] = fieldSet
}

/** TRUE-closure predicate over one typed field — the literal
  * `in_lambda` (predicates.py:74-100): an arbitrary Scala function,
  * composable through the same algebra (negate/and/or, `fields`
  * bookkeeping). Runs as a Scala UDF: the value is deserialized and
  * the closure is OPAQUE to Catalyst — no pushdown, no codegen — so
  * prefer [[InExpr]] whenever the logic is expressible as a Column;
  * this exists for the residue that genuinely is not (regex
  * libraries, custom parsers, model calls). Two-field closures:
  * [[InLambda2]]. */
final case class InLambda[A](field: String, f: A => Boolean)(
    implicit tt: scala.reflect.runtime.universe.TypeTag[A])
    extends RowPredicate {
  def toColumn: Column = udf(f).apply(col(field))
  def fields: Set[String] = Set(field)
}

/** [[InLambda]] over two fields. */
final case class InLambda2[A, B](fieldA: String, fieldB: String,
    f: (A, B) => Boolean)(
    implicit ta: scala.reflect.runtime.universe.TypeTag[A],
    tb: scala.reflect.runtime.universe.TypeTag[B])
    extends RowPredicate {
  def toColumn: Column = udf(f).apply(col(fieldA), col(fieldB))
  def fields: Set[String] = Set(fieldA, fieldB)
}

final case class Negate(p: RowPredicate) extends RowPredicate {
  def toColumn: Column = !p.toColumn
  def fields: Set[String] = p.fields
}

final case class ReduceAnd(ps: Seq[RowPredicate]) extends RowPredicate {
  def toColumn: Column = ps.map(_.toColumn).reduce(_ && _)
  def fields: Set[String] = ps.flatMap(_.fields).toSet
}

final case class ReduceOr(ps: Seq[RowPredicate]) extends RowPredicate {
  def toColumn: Column = ps.map(_.toColumn).reduce(_ || _)
  def fields: Set[String] = ps.flatMap(_.fields).toSet
}

/** Deterministic train/val/test split by hashing a key column into a
  * [0,1) fraction and keeping one CDF bucket
  * (predicates.py:144-182: md5(value) → int → fraction).
  *
  * The fraction is `md5(cast(key as string))`'s first 8 hex digits as
  * an unsigned 32-bit int over 2^32 — stable across Spark versions,
  * partitionings, and cluster sizes (unlike `rand()` or
  * `randomSplit`), and reproducible in any SQL engine, so a 100 TB
  * split assigns every row the same bucket forever.
  */
final case class PseudorandomSplit(field: String, ratios: Seq[Double],
    keep: Int) extends RowPredicate {
  require(ratios.nonEmpty && ratios.forall(_ >= 0) && ratios.sum > 0,
    s"split ratios must be non-negative with a positive sum: $ratios")
  require(keep >= 0 && keep < ratios.length,
    s"keep=$keep out of range for ${ratios.length} buckets")
  private val cum = ratios.scanLeft(0.0)(_ + _)
  private val total = cum.last
  val lo: Double = cum(keep) / total
  val hi: Double = cum(keep + 1) / total

  def toColumn: Column = {
    val frac = PseudorandomSplit.hashFraction(col(field))
    frac >= lit(lo) && frac < lit(hi)
  }
  def fields: Set[String] = Set(field)
}

object PseudorandomSplit {
  /** md5-derived fraction in [0,1); `conv(hex,16,10)` keeps it
    * unsigned. SQL-portable (DuckDB: ('0x'||substr(md5(..),1,8))::BIGINT). */
  def hashFraction(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
}
