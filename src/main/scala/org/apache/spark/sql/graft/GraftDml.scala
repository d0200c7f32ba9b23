package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.command.{ExecutedCommandExec, LeafRunnableCommand}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.catalog.GraftCatalog
import graft.model.WriteMode
import graft.spark.{GraftDsv2, GraftTable}

/**
 * Planner strategy giving Graft tables SQL `UPDATE` and `MERGE INTO`
 * WITHOUT copy-on-write row-level rewrites: both map onto the catalog's
 * native merge machinery — UPDATE commits a full-row upsert delta of the
 * matched rows; MERGE commits an upsert (or equality-delete) delta of the
 * source frame. That is the LSM-native execution a lakehouse wants: the
 * "rewrite" is a delta commit plus (deferred) bucket compaction, never a
 * whole-file copy of untouched rows (reference analog: the MERGE/DELETE
 * write modes of catalog write_to_table, catalog/main/impl.py:627-650).
 *
 * Interception point: both nodes survive analysis fully resolved (star
 * forms are expanded and assignments aligned by the analyzer) and fail
 * only at planning when the table lacks SupportsRowLevelOperations — so a
 * planner strategy sees them first. By then the optimizer may have turned
 * the target relation into a column-pruned DataSourceV2ScanRelation, so
 * the commands never reuse its attributes: they re-read the table through
 * the catalog (merge-on-read — UPDATE works even with pending merges) and
 * rebind condition/assignment expressions onto the fresh frame BY NAME.
 * Registered automatically when [[graft.spark.GraftSparkCatalog]]
 * initializes, or via `spark.sql.extensions=graft.spark.GraftSparkExtensions`.
 *
 * Documented deviation from ANSI MERGE: multiple source rows hitting one
 * target key resolve last-writer-wins (the engine's merge order) instead
 * of raising a cardinality violation.
 */
object GraftDmlStrategy extends org.apache.spark.sql.execution.SparkStrategy {

  private def graftTable(plan: LogicalPlan): Option[GraftTable] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some(t)
        case _ => None
      }
      case s: DataSourceV2ScanRelation => s.relation.table match {
        case t: GraftTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u: UpdateTable if u.resolved =>
      graftTable(u.table) match {
        case Some(gt) =>
          ExecutedCommandExec(GraftUpdateCommand(gt, u.assignments, u.condition)) :: Nil
        case None => Nil
      }
    case m: MergeIntoTable if m.resolved =>
      graftTable(m.targetTable) match {
        case Some(gt) => ExecutedCommandExec(GraftMergeCommand(gt, m)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

private[graft] object GraftDml {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Re-point every attribute reference at the same-named attribute of a
    * fresh scan (the planner-time attributes belong to a column-pruned
    * scan relation that must not be reused). */
  def rebind(e: Expression, byName: Map[String, Attribute]): Expression =
    e.transform {
      case a: AttributeReference => byName.getOrElse(a.name,
        throw new IllegalStateException(s"cannot rebind column ${a.name}"))
    }

  def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }
}

/**
 * `UPDATE t SET col = expr, ... [WHERE cond]` — scan the matched rows
 * (SET values may reference the current row), project FULL rows with the
 * assigned columns replaced, and commit as an upsert delta. Full rows, not
 * just the SET columns: the partial-upsert read path coalesces null-valued
 * fields back to the old value, which would break `SET c = NULL`.
 */
final case class GraftUpdateCommand(
    gt: GraftTable, assignments: Seq[Assignment], condition: Option[Expression])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    require(!gt.isTimeTravel,
      s"cannot UPDATE ${gt.tableRef}: the table was resolved asOf a past snapshot")
    val keys = gt.mergeKeyNames
    if (keys.isEmpty) throw new UnsupportedOperationException(
      s"UPDATE requires merge keys on ${gt.tableRef} (rows are addressed by key)")
    val assignByName: Map[String, Expression] = assignments.map { a =>
      a.key match {
        case attr: Attribute => attr.name -> a.value
        case other => throw new UnsupportedOperationException(
          s"UPDATE of nested field $other is not supported")
      }
    }.toMap
    keys.find(assignByName.contains).foreach(k =>
      throw new UnsupportedOperationException(
        s"cannot UPDATE merge key $k of ${gt.tableRef} (keys address the row; " +
          "DELETE + INSERT instead)"))
    val cat = new GraftCatalog(session, gt.catalogRoot)
    val base = GraftDml.analyzed(cat.readTable(gt.tableRef))
    val byName = base.output.map(a => a.name -> a).toMap
    val filtered: LogicalPlan =
      condition.map(c => Filter(GraftDml.rebind(c, byName), base)).getOrElse(base)
    val cols: Seq[NamedExpression] = base.output.map { attr =>
      assignByName.get(attr.name) match {
        case Some(v) => Alias(GraftDml.rebind(v, byName), attr.name)()
        case None => attr
      }
    }
    val updated = GraftDml.ofRows(session, Project(cols, filtered))
    cat.writeToTable(updated, gt.tableRef, WriteMode.Merge)
    GraftDsv2.ensureReadOptimized(cat, gt.tableRef)
    Seq.empty
  }
}

/**
 * `MERGE INTO t USING s ON t.k = s.k ...` — supported clause shapes, all
 * unconditional (no `WHEN MATCHED AND extra`):
 *
 *  - UPDATE + INSERT with per-column source expressions that agree
 *    (the canonical `UPDATE SET * / INSERT *` upsert) → one Merge delta of
 *    the projected source frame.
 *  - INSERT only → Merge delta of the source rows whose keys are NOT in
 *    the target (anti-join).
 *  - UPDATE only → Merge delta of the source rows whose keys ARE in the
 *    target (semi-join).
 *  - DELETE only → equality-delete delta of the source keys (keys absent
 *    from the target are no-ops, matching MERGE's matched-only semantics).
 */
final case class GraftMergeCommand(gt: GraftTable, merge: MergeIntoTable)
    extends LeafRunnableCommand {

  private def unsupported(what: String): Nothing = throw new UnsupportedOperationException(
    s"MERGE INTO ${gt.tableRef}: $what. Supported: unconditional WHEN MATCHED THEN " +
      "UPDATE/DELETE and WHEN NOT MATCHED THEN INSERT with source-valued columns, " +
      "ON = merge-key equality")

  override def run(session: SparkSession): Seq[Row] = {
    require(!gt.isTimeTravel,
      s"cannot MERGE INTO ${gt.tableRef}: the table was resolved asOf a past snapshot")
    val keys = gt.mergeKeyNames
    if (keys.isEmpty) throw new UnsupportedOperationException(
      s"MERGE INTO requires merge keys on ${gt.tableRef}")
    if (merge.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE is not supported")

    val source = merge.sourceTable
    val sourceAttrs = AttributeSet(source.output)
    // Anything NOT from the source side is a target-row reference; resolve
    // targetness by exclusion so a pruned target scan shape cannot hide one.
    def sourceOnly(e: Expression): Boolean = e.references.subsetOf(sourceAttrs)

    // ON must be a conjunction of target-key = source-expression equalities
    // covering every merge key — that is what makes MERGE expressible as an
    // equality upsert/delete instead of a general join rewrite.
    val tableCols = gt.schema().fieldNames.toSet
    val keyToSource: Map[String, Expression] = GraftDml.splitAnd(merge.mergeCondition).map {
      case EqualTo(l, r) =>
        val (tgt, src) =
          if (!sourceOnly(l) && sourceOnly(r)) (l, r)
          else if (!sourceOnly(r) && sourceOnly(l)) (r, l)
          else unsupported(s"ON conjunct is not target-column = source-expression: " +
            EqualTo(l, r).sql)
        tgt match {
          case a: Attribute if keys.contains(a.name) && tableCols.contains(a.name) =>
            a.name -> src
          case other => unsupported(s"ON must equate a merge key, got ${other.sql}")
        }
      case other => unsupported(s"non-equality ON conjunct ${other.sql}")
    }.toMap
    keys.filterNot(keyToSource.contains) match {
      case Seq() => ()
      case missing => unsupported(s"ON does not constrain merge key(s) ${missing.mkString(", ")}")
    }

    /** Per-target-column source expressions of an action; values must be
      * computable from the source row alone. */
    def colExprs(cond: Option[Expression], as: Seq[Assignment], clause: String):
        Map[String, Expression] = {
      if (cond.isDefined) unsupported(s"conditional $clause")
      as.map { a =>
        val name = a.key match {
          case attr: Attribute => attr.name
          case other => unsupported(s"assignment to nested field $other")
        }
        if (!sourceOnly(a.value))
          unsupported(s"assignment $name = ${a.value.sql} references the target row")
        name -> a.value
      }.toMap
    }

    val cat = new GraftCatalog(session, gt.catalogRoot)
    // Keyed-consumer pin (the ReadOptions.denseResolve cookbook rule,
    // applied to the engine's OWN surface): this frame's immediate
    // downstream is a merge-key semi/anti join, so force the dense
    // resolve — its output is hash(mergeKeys)-partitioned and the join
    // reuses it, shuffling only the (small) MERGE source; the
    // partitioned-union read would report UnknownPartitioning and
    // re-shuffle the ENTIRE target key set instead. Same pin the zipper
    // applies ahead of its key-equality zip join. Plan-asserted in
    // Dsv2Spec ("MERGE INTO ... pins the dense resolve").
    def targetKeys: DataFrame = cat.readTable(gt.tableRef,
      graft.catalog.ReadOptions(denseResolve = true)).select(keys.head, keys.tail: _*)

    (merge.matchedActions, merge.notMatchedActions) match {
      // WHEN MATCHED THEN DELETE (alone): equality-delete the source keys.
      case (Seq(d: DeleteAction), Seq()) =>
        if (d.condition.isDefined) unsupported("conditional WHEN MATCHED AND ... THEN DELETE")
        val keyProjection: Seq[NamedExpression] = keys.map(k => Alias(keyToSource(k), k)())
        val delKeys = GraftDml.ofRows(session, Project(keyProjection, source))
          .dropDuplicates(keys)
        cat.writeToTable(delKeys, gt.tableRef, WriteMode.Delete)

      case (matched, notMatched) =>
        val upd = matched match {
          case Seq() => None
          case Seq(u: UpdateAction) =>
            Some(colExprs(u.condition, u.assignments, "WHEN MATCHED AND ... THEN UPDATE"))
          case _ => unsupported("multiple WHEN MATCHED actions")
        }
        val ins = notMatched match {
          case Seq() => None
          case Seq(i: InsertAction) =>
            Some(colExprs(i.condition, i.assignments, "WHEN NOT MATCHED AND ... THEN INSERT"))
          case _ => unsupported("multiple WHEN NOT MATCHED actions")
        }
        if (upd.isEmpty && ins.isEmpty) unsupported("no actions")
        // When both clauses exist, they must write the same values — one
        // upsert frame cannot carry two versions of a column.
        for (u <- upd; i <- ins; c <- u.keySet ++ i.keySet) {
          (u.get(c), i.get(c)) match {
            case (Some(a), Some(b)) if a.semanticEquals(b) => ()
            case (Some(a), Some(b)) =>
              unsupported(s"UPDATE and INSERT assign different values to $c " +
                s"(${a.sql} vs ${b.sql})")
            case _ => unsupported(s"UPDATE and INSERT assign different column sets ($c)")
          }
        }
        val exprs = upd.getOrElse(Map.empty) ++ ins.getOrElse(Map.empty)
        val cols: Seq[NamedExpression] = gt.schema().fieldNames.toSeq.map { name =>
          exprs.get(name) match {
            case Some(v) => Alias(v, name)()
            case None if keys.contains(name) => Alias(keyToSource(name), name)()
            case None => unsupported(s"column $name is not assigned")
          }
        }
        val full = GraftDml.ofRows(session, Project(cols, source))
        // Clause-specific row scoping: INSERT-only keeps keys absent from
        // the target; UPDATE-only keeps keys present. Both = plain upsert.
        val scoped = (upd.isDefined, ins.isDefined) match {
          case (true, true) => full
          case (false, true) => full.join(targetKeys, keys, "left_anti")
          case (true, false) => full.join(targetKeys, keys, "left_semi")
          case (false, false) => unsupported("no actions")
        }
        cat.writeToTable(scoped, gt.tableRef, WriteMode.Merge)
    }
    GraftDsv2.ensureReadOptimized(cat, gt.tableRef)
    Seq.empty
  }
}
