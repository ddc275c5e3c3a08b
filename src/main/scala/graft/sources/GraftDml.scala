package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, Filter, InsertAction, Join, JoinHint, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
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

        case m: MergeIntoTable if m.resolved =>
          m.targetTable.collectFirst {
            case r: DataSourceV2Relation
                if r.table.isInstanceOf[GraftSqlWrites] =>
              r.table.asInstanceOf[GraftSqlWrites]
          } match {
            case Some(t) => translateMerge(t, m)
            case None => m
          }
      }
  }

  /** MERGE INTO → [[Snapshots.upsert]], for the shapes a keyed
    * snapshot store expresses natively (anything else refuses with
    * the shape named — a partial translation that silently
    * last-writer-wins would be the silent-wrong class). All require
    * an equality merge condition:
    *  - `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    *    INSERT *` — the classic upsert (fast path: the batch IS the
    *    projected source, no join);
    *  - `WHEN MATCHED [AND <cond>] THEN UPDATE SET <any>` with an
    *    optional `WHEN NOT MATCHED THEN INSERT <any>` — the general
    *    pair ([[GraftMergeCondCommand]]: σ(cond)(target ⋈ source)
    *    updates ∪ anti-join inserts, one atomic upsert);
    *  - `WHEN MATCHED [AND <cond>] THEN DELETE` — tombstone the
    *    matched (and condition-passing) keys.
    * Plans and expressions are carried ANALYZED and applied
    * unrebount — attribute ids stay bound, so SET may reference
    * both sides and names may collide across relations. */
  private def translateMerge(t: GraftSqlWrites,
      m: MergeIntoTable): LogicalPlan = {
    def refuse(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"graft MERGE INTO supports 'WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *' (keyed upsert), " +
          "'WHEN MATCHED [AND <cond>] THEN UPDATE SET ...' and " +
          "'WHEN MATCHED [AND <cond>] THEN DELETE' (matched-only " +
          "clauses), all with an equality merge condition — " +
          s"$why; use Snapshots.upsert for other shapes")
    require(t.writable,
      s"${t.label} is a pinned time-travel resolution — MERGE " +
        "targets the latest version")
    if (m.schemaEvolutionEnabled)
      refuse("WITH SCHEMA EVOLUTION is unsupported")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("NOT MATCHED BY SOURCE clauses are unsupported")
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    val (tKey, sKey) = m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(b) && sOut.contains(a) => (b, a)
      case other => refuse(s"merge condition $other is not a plain " +
        "target-key = source-key equality")
    }
    def subFree(e: Expression): Unit =
      require(!e.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
        "graft MERGE does not support subqueries in the source " +
          "assignments")
    (m.matchedActions, m.notMatchedActions) match {
      // ---- matched-only UPDATE (optionally conditional) ----
      // `WHEN MATCHED [AND cond] THEN UPDATE SET ...` with no insert
      // clause: the update batch is target ⋈ source on the merge
      // condition, filtered by the clause condition, projected to
      // the target schema with the SET expressions applied — then
      // ONE keyed copy-on-write upsert. The plans and expressions
      // are carried ANALYZED (attribute ids stay bound), so SET
      // expressions may reference BOTH sides and arbitrary clause
      // conditions compose — nothing rebinds by name.
      case (Seq(UpdateAction(cond, up, _)), Seq()) =>
        cond.foreach(subFree)
        val setMap = up.map(a => a.key match {
          case ar: AttributeReference =>
            subFree(a.value); ar.name -> a.value
          case other => refuse(s"UPDATE SET target $other is nested")
        }).toMap
        val outCols: Seq[(String, Expression)] =
          m.targetTable.output.map(a =>
            a.name -> setMap.getOrElse(a.name, a))
        GraftMergeCondCommand(t.storeUrl, tKey.name,
          m.targetTable, m.sourceTable, m.mergeCondition, cond,
          outCols, delete = false)
      // ---- conditional matched DELETE ----
      case (Seq(DeleteAction(Some(cond))), Seq()) =>
        subFree(cond)
        GraftMergeCondCommand(t.storeUrl, tKey.name,
          m.targetTable, m.sourceTable, m.mergeCondition, Some(cond),
          Seq(tKey.name -> tKey), delete = true)
      case (Seq(UpdateAction(cond, up, _)),
            Seq(InsertAction(None, ins))) =>
        // UPDATE + INSERT pair. Two translations:
        //  - CLASSIC upsert (unconditional, SET */INSERT * with the
        //    same source expressions): the batch IS the projected
        //    source — no join needed, the cheapest shape;
        //  - GENERAL (clause condition, partial SET, or differing
        //    assignments): conditional-matched updates from
        //    σ(cond)(target ⋈ source) UNIONED with the anti-join
        //    insert batch, one keyed upsert.
        cond.foreach(subFree)
        val insMap = ins.map(a => a.key match {
          case ar: AttributeReference => ar.name -> a.value
          case other => refuse(s"INSERT target $other is nested")
        }).toMap
        val upMap = up.map(a => a.key match {
          case ar: AttributeReference => ar.name -> a.value
          case other => refuse(s"UPDATE SET target $other is nested")
        }).toMap
        val targetCols = m.targetTable.output.map(_.name)
        targetCols.foreach { c =>
          if (!insMap.contains(c))
            refuse(s"column $c is not assigned by the INSERT clause")
          subFree(insMap(c)); upMap.get(c).foreach(subFree)
        }
        val classic = cond.isEmpty && targetCols.forall(c =>
          upMap.get(c).exists(_.canonicalized ==
            insMap(c).canonicalized))
        if (classic)
          GraftMergeCommand(t.storeUrl, tKey.name, m.sourceTable,
            targetCols.map(c => c -> insMap(c)), delete = false)
        else
          GraftMergeCondCommand(t.storeUrl, tKey.name,
            m.targetTable, m.sourceTable, m.mergeCondition, cond,
            m.targetTable.output.map(a =>
              a.name -> upMap.getOrElse(a.name, a)),
            delete = false,
            insertCols = Some(targetCols.map(c => c -> insMap(c))))
      case (Seq(DeleteAction(None)), Seq()) =>
        GraftMergeCommand(t.storeUrl, tKey.name, m.sourceTable,
          Seq(tKey.name -> sKey), delete = true)
      case (ma, na) => refuse(s"matched=$ma notMatched=$na")
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
    // band-able WHERE shapes route to the stats-priced flavors:
    // attribution reads the `_stats` sidecar (O(files) metadata)
    // instead of scanning the corpus — gated on the sidecar actually
    // covering the field, because an uncovered banded sweep
    // must-reads (and rewrites) EVERYTHING, strictly worse than the
    // general path's exact containment attribution. Assignment
    // semantics stay identical: [[Snapshots.upcastSets]] applies
    // the same safe-upcast probe updateWhereCond runs internally.
    val v = cond.flatMap(BandRoute.ofExpr) match {
      case Some(r) if Snapshots.statsCovers(session, url, r.field) =>
        val casted = Snapshots.upcastSets(session,
          Snapshots.headSchema(session, url), setCols)
        r match {
          case BandRoute.LongRange(f, lo, hi) =>
            Snapshots.updateWhere(session, url, f, lo, hi, casted)
          case BandRoute.StrRange(f, lo, hi) =>
            Snapshots.updateWhereStr(session, url, f, lo, hi, casted)
        }
      case _ =>
        val condCol = cond.map(rebind).getOrElse(lit(true))
        Snapshots.updateWhereCond(session, url, condCol, setCols)
    }
    Seq(Row(v.toLong))
  }
}

/** Eagerly-executed MERGE (the [[GraftDml.translateMerge]] shapes):
  * executes the carried source plan — whose attribute ids match the
  * carried expressions, so they apply unrebount — projects it to the
  * store's columns, and runs one keyed [[Snapshots.upsert]]
  * (`delete = true` tombstones the source's keys instead). Returns
  * the committed version. */
case class GraftMergeCommand(url: String, keyCol: String,
    source: LogicalPlan, outCols: Seq[(String, Expression)],
    delete: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graftbridge.ColumnBridge
      .ofPlan(session, source)
    // SQL has no bloomIndexUrl parameter slot, so MERGE DISCOVERS
    // the store's conventional key-bloom sidecar
    // ([[Snapshots.bloomSidecarUrl]], maintained by
    // [[Snapshots.indexBloom]]): with it, the copy-on-write upsert
    // rewrites only bloom-admitted files — a 2-key MERGE on a
    // 100k-file store touches the files that can hold those keys,
    // not the store. Absent or stale sidecars stay correct
    // (stageUpsert's coverage guard conservatively rewrites
    // uncovered files; no sidecar means the full rewrite as
    // before).
    val bloom = Snapshots.discoverBloom(session, url, keyCol)
    val v =
      if (delete) {
        // tombstone the source's keys: the update batch carries the
        // store rows of matching keys flagged for deletion (upsert
        // requires full-schema rows; unmatched source keys no-op by
        // never matching a store row... they would INSERT — so keep
        // only keys that exist in the store)
        val keys = src.select(graft.functions.GraftFunctions
          .column(outCols.head._2).as(keyCol)).distinct()
        val updates = Snapshots.read(session, url)
          .join(keys, Seq(keyCol), "left_semi")
          .withColumn("__merge_del", lit(true))
        if (updates.isEmpty) Snapshots.latest(session, url)
        else Snapshots.upsert(session, url, updates, keyCol,
          deleteCol = Some("__merge_del"), bloomIndexUrl = bloom)
      } else {
        val updates = src.select(outCols.map { case (n, e) =>
          graft.functions.GraftFunctions.column(e).as(n) }: _*)
        Snapshots.upsert(session, url, updates, keyCol,
          bloomIndexUrl = bloom)
      }
    Seq(Row(v.toLong))
  }
}

/** Eagerly-executed MATCHED-ONLY MERGE clause (optionally
  * conditional): `WHEN MATCHED [AND <cond>] THEN UPDATE SET ...` or
  * `WHEN MATCHED AND <cond> THEN DELETE`. The carried target and
  * source plans keep their analyzed attribute ids, so the merge
  * condition, the clause condition and the SET expressions apply
  * UNREBOUND over a constructed `σ(cond)(target ⋈ source)` plan —
  * SET may reference both sides, names may collide across the two
  * relations, nothing resolves by name. The filtered join projects
  * to the target schema (update) or the target key (delete) and
  * lands as ONE keyed copy-on-write [[Snapshots.upsert]] with the
  * discovered bloom sidecar pruning the rewrite. A source that
  * matches the same target key twice fails the upsert's duplicate-
  * key require — the standard MERGE cardinality error, surfaced
  * loudly instead of last-writer-wins. */
case class GraftMergeCondCommand(url: String, keyCol: String,
    target: LogicalPlan, source: LogicalPlan, mergeCond: Expression,
    clauseCond: Option[Expression], outCols: Seq[(String, Expression)],
    delete: Boolean,
    insertCols: Option[Seq[(String, Expression)]] = None)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val joined = Filter(clauseCond.getOrElse(Literal(true)),
      Join(target, source, Inner, Some(mergeCond), JoinHint.NONE))
    val proj = Project(outCols.map { case (n, e) =>
      Alias(e, n)() }, joined)
    val batch = org.apache.spark.sql.graftbridge.ColumnBridge
      .ofPlan(session, proj)
    val bloom = Snapshots.discoverBloom(session, url, keyCol)
    val v =
      if (delete) {
        val keys = batch.select(keyCol).distinct()
        val updates = Snapshots.read(session, url)
          .join(keys, Seq(keyCol), "left_semi")
          .withColumn("__merge_del", lit(true))
        if (updates.isEmpty) Snapshots.latest(session, url)
        else Snapshots.upsert(session, url, updates, keyCol,
          deleteCol = Some("__merge_del"), bloomIndexUrl = bloom)
      } else {
        // the NOT MATCHED insert batch (when present): source rows
        // with no key match, projected through the INSERT
        // assignments — analyzed separately and unioned by name, so
        // the analyzer's relation dedup handles target appearing in
        // both branches
        val full = insertCols match {
          case Some(ics) =>
            val anti = Join(source, target, LeftAnti,
              Some(mergeCond), JoinHint.NONE)
            val insBatch = org.apache.spark.sql.graftbridge
              .ColumnBridge.ofPlan(session, Project(
                ics.map { case (n, e) => Alias(e, n)() }, anti))
            batch.unionByName(insBatch)
          case None => batch
        }
        if (full.isEmpty) Snapshots.latest(session, url)
        else Snapshots.upsert(session, url, full, keyCol,
          bloomIndexUrl = bloom)
      }
    Seq(Row(v.toLong))
  }
}
