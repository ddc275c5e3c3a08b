package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.LongType

/** SQL `UPDATE` for [[GraftCatalog]] tables — the one DML verb
  * Spark's V2 machinery cannot hand a V1-backed table (its
  * group-based rewrite requires a native distributed writer): an
  * injected post-hoc resolution rule claims a resolved
  * [[UpdateTable]] whose relation is a graft table BEFORE Spark's
  * row-level rewrite would refuse it, and replaces it with an eager
  * command running [[Snapshots.updateWhereCond]] — the general
  * copy-on-write predicate update, so atomic commit, CDC, CHECK
  * constraints and safe-upcast assignment semantics all apply.
  * Wired through [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`), the same mechanism every lakehouse
  * engine uses for its DML surface. */
object GraftDml {

  final case class UpdateRule(session: SparkSession)
      extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperators {
        case u @ UpdateTable(rel, assignments, condition)
            if u.resolved =>
          rel.collectFirst {
            case r: DataSourceV2Relation
                if r.table.isInstanceOf[GraftSqlWrites] =>
              r.table.asInstanceOf[GraftSqlWrites]
          } match {
            case Some(t) =>
              require(t.writable,
                s"${t.label} is a pinned time-travel resolution — " +
                  "UPDATE targets the latest version")
              // a subquery's outer reference would rebind by NAME
              // against the SUBQUERY's scope, not the table's — the
              // silent-wrong class; refuse loudly
              (condition.toSeq ++ assignments.map(_.value)).foreach {
                e => require(!e.exists(_.isInstanceOf[
                  org.apache.spark.sql.catalyst.expressions
                    .SubqueryExpression]),
                  "graft UPDATE does not support subqueries in SET/" +
                    "WHERE — materialize the subquery and use " +
                    "Snapshots.upsert")
              }
              // the expressions are carried RESOLVED (CheckAnalysis
              // accepts resolved expressions on a leaf command) and
              // rebound BY NAME at run time against a fresh read
              val sets = assignments.map { a =>
                val name = a.key match {
                  case ar: AttributeReference => ar.name
                  case other => throw new UnsupportedOperationException(
                    s"UPDATE SET target $other — graft columns are " +
                      "top-level")
                }
                name -> a.value
              }
              GraftUpdateCommand(t.storeUrl, sets, condition)
            case None => u
          }
      }
  }
}

/** Eagerly-executed UPDATE: runs the copy-on-write predicate update
  * and returns the committed version (the current one on a no-match
  * no-op). The carried expressions' attribute ids belong to the
  * analyzed relation; [[run]] rewrites every attribute to a by-name
  * unresolved reference, which the store's fresh effective read
  * resolves (runtime-replaceable expressions evaluate through their
  * replacement child, which the rewrite reaches). */
case class GraftUpdateCommand(url: String,
    sets: Seq[(String, Expression)], cond: Option[Expression])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Nil

  private def rebind(e: Expression)
      : org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  override def run(session: SparkSession): Seq[Row] = {
    val setCols = sets.map { case (n, e) => n -> rebind(e) }.toMap
    val condCol = cond.map(rebind).getOrElse(lit(true))
    Seq(Row(Snapshots.updateWhereCond(session, url, condCol, setCols)
      .toLong))
  }
}
