package graft.sources

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EmptyRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WHERE-shape classifier for the SQL DML paths ([[GraftDml]],
  * [[GraftCatalog]]'s `DELETE FROM`): recognizes a conjunction of
  * bounds on ONE integral or string column and rewrites it as the
  * inclusive range the banded [[Snapshots.deleteWhere]] /
  * [[Snapshots.updateWhere]] flavors take, so a retention-shaped
  * SQL sweep prices its attribution from the `_stats` sidecar (one
  * O(files) metadata read) instead of the general-predicate
  * flavors' corpus scan — the 100 TB difference between pruning
  * megabytes and scanning the store. Anything the classifier cannot
  * PROVE equivalent returns None and the caller keeps the exact
  * general-predicate path: routing is an optimization, never a
  * semantics change (both sides delete/update exactly the rows the
  * predicate matches — NULLs survive under either, because a range
  * cannot match NULL and the general flavors coalesce to false).
  *
  * Recognized conjuncts (all on the same column): `=`, `>`, `>=`,
  * `<`, `<=`, `BETWEEN` (arrives as two bounds), plus the
  * `IS NOT NULL` Spark injects alongside a range (absorbed — a
  * range already cannot match NULL). Strict long bounds tighten by
  * ±1 (overflow refuses); a strict string LOWER bound tightens to
  * the binary-order successor `v + '\u0000'`; a strict string upper
  * bound has no predecessor and refuses. Date/timestamp and
  * floating columns refuse (their filter values would need the
  * band's epoch encoding — the general path handles them exactly).
  */
private[sources] object BandRoute {
  sealed trait Range { def field: String }
  final case class LongRange(field: String, lo: Long, hi: Long)
    extends Range
  final case class StrRange(field: String, lo: String, hi: String)
    extends Range

  /** (field, op, value) conjunct; op ∈ =,>,>=,<,<=,nn. */
  private type Conj = (String, String, Any)

  /** Classify a V2 `SupportsDelete` filter array (implicitly
    * AND-ed). */
  def ofFilters(schema: StructType,
      filters: Seq[sources.Filter]): Option[Range] = {
    val conjs = Seq.newBuilder[Conj]
    def walk(f: sources.Filter): Boolean = f match {
      case sources.And(l, r) => walk(l) && walk(r)
      case sources.EqualTo(a, v) => conjs += ((a, "=", v)); true
      case sources.GreaterThan(a, v) => conjs += ((a, ">", v)); true
      case sources.GreaterThanOrEqual(a, v) =>
        conjs += ((a, ">=", v)); true
      case sources.LessThan(a, v) => conjs += ((a, "<", v)); true
      case sources.LessThanOrEqual(a, v) =>
        conjs += ((a, "<=", v)); true
      case sources.IsNotNull(a) => conjs += ((a, "nn", null)); true
      case _ => false
    }
    if (filters.nonEmpty && filters.forall(walk))
      build(schema, conjs.result())
    else None
  }

  /** Classify a resolved catalyst predicate (the `UPDATE ... WHERE`
    * expression [[GraftUpdateCommand]] carries). Attribute types
    * come from the expression itself (resolved against the pinned
    * logical schema); the value side accepts any FOLDABLE
    * expression (an analyzer-inserted Cast around a literal has not
    * been constant-folded yet at resolution time). */
  def ofExpr(e: Expression): Option[Range] = {
    val conjs = Seq.newBuilder[Conj]
    var fieldType: Map[String, DataType] = Map.empty
    def attr(x: Expression): Option[String] = x match {
      case a: AttributeReference =>
        fieldType.get(a.name) match {
          case Some(dt) if dt != a.dataType => None
          case _ => fieldType += a.name -> a.dataType; Some(a.name)
        }
      case _ => None
    }
    def value(x: Expression): Option[Any] =
      if (x.foldable) Option(x.eval(EmptyRow)) else None
    def walk(x: Expression): Boolean = x match {
      case And(l, r) => walk(l) && walk(r)
      case EqualTo(a, v) if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, "=", value(v).get)); true
      case EqualTo(v, a) if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, "=", value(v).get)); true
      case GreaterThan(a, v)
          if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, ">", value(v).get)); true
      case GreaterThan(v, a)
          if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, "<", value(v).get)); true
      case GreaterThanOrEqual(a, v)
          if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, ">=", value(v).get)); true
      case GreaterThanOrEqual(v, a)
          if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, "<=", value(v).get)); true
      case LessThan(a, v) if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, "<", value(v).get)); true
      case LessThan(v, a) if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, ">", value(v).get)); true
      case LessThanOrEqual(a, v)
          if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, "<=", value(v).get)); true
      case LessThanOrEqual(v, a)
          if attr(a).isDefined && value(v).isDefined =>
        conjs += ((attr(a).get, ">=", value(v).get)); true
      case IsNotNull(a) if attr(a).isDefined =>
        conjs += ((attr(a).get, "nn", null)); true
      case _ => false
    }
    if (!walk(e)) return None
    val fields = fieldType.keys.toSeq
    if (fields.size != 1) return None
    build(StructType(fields.map(f =>
      StructField(f, fieldType(f)))), conjs.result())
  }

  private def build(schema: StructType,
      conjs: Seq[Conj]): Option[Range] = {
    val fields = conjs.map(_._1).distinct
    if (fields.size != 1) return None
    val field = fields.head
    if (!schema.fieldNames.contains(field)) return None
    // at least one real bound: a bare IS NOT NULL is not a range
    if (!conjs.exists(_._2 != "nn")) return None
    schema(field).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        var lo = Long.MinValue
        var hi = Long.MaxValue
        conjs.foreach { case (_, op, v0) =>
          val v = v0 match {
            case n: java.lang.Number => n.longValue
            case null => 0L // nn conjunct — unused
            case _ => return None
          }
          op match {
            case "=" => lo = math.max(lo, v); hi = math.min(hi, v)
            case ">=" => lo = math.max(lo, v)
            case "<=" => hi = math.min(hi, v)
            case ">" =>
              if (v == Long.MaxValue) return None
              lo = math.max(lo, v + 1)
            case "<" =>
              if (v == Long.MinValue) return None
              hi = math.min(hi, v - 1)
            case "nn" => ()
          }
        }
        Some(LongRange(field, lo, hi))
      case StringType =>
        var lo = ""
        var hi: String = null // null = unbounded above (refuses)
        def str(v0: Any): Option[String] = v0 match {
          case s: String => Some(s)
          case u: UTF8String => Some(u.toString)
          case _ => None
        }
        def maxCp(a: String, b: String): String =
          if (Snapshots.cpCompare(a, b) >= 0) a else b
        def minCp(a: String, b: String): String =
          if (a == null) b
          else if (Snapshots.cpCompare(a, b) <= 0) a else b
        conjs.foreach { case (_, op, v0) =>
          op match {
            case "nn" => ()
            case _ =>
              val v = str(v0).getOrElse(return None)
              op match {
                case "=" => lo = maxCp(lo, v); hi = minCp(hi, v)
                case ">=" => lo = maxCp(lo, v)
                case "<=" => hi = minCp(hi, v)
                // binary-order successor: t > v  ⟺  t >= v+""
                case ">" => lo = maxCp(lo, v + '\u0000')
                // no string predecessor exists — keep the exact path
                case "<" => return None
              }
          }
        }
        if (hi == null) None else Some(StrRange(field, lo, hi))
      case _ => None // date/timestamp/float/etc — exact path
    }
  }
}
