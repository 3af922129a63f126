package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.read.GraftFileIndex

/** Metadata-answered `count(*)`: a bare unfiltered count over a graft
  * snapshot/read-optimized scan collapses to a `LocalRelation` holding
  * the row count summed from commit metadata — zero file IO, zero tasks,
  * zero jobs. At a million files this turns a cluster-wide footer sweep
  * into a driver lookup (the same class of answer the reference serves
  * from timeline metadata in its CLI `commits show` totals).
  *
  * Strictly guarded: fires only when
  *  - the aggregate has NO grouping and every aggregate expression is a
  *    plain non-distinct, unfiltered `count(1)`/`count(*)`;
  *  - the child is the bare scan (possibly under column-pruning
  *    projections of plain attributes) — any Filter/Union/Window between
  *    aggregate and scan disables the rewrite;
  *  - the scan's `GraftFileIndex` can answer exactly
  *    ([[GraftFileIndex.exactRowCount]]: all base files, recorded row
  *    counts; delta-bearing MOR slices never qualify because the merge
  *    branch unions above the scan).
  */
object StatsAnswerRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(grouping, exprs, child, _)
        if grouping.isEmpty && exprs.nonEmpty && exprs.forall(isPlainCount) =>
      indexOf(child).flatMap(_.exactRowCount) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(exprs.map(_ => n))))
        case None => agg
      }
  }

  private def isPlainCount(ne: NamedExpression): Boolean = ne match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => true
        case _ => false
      })
    case _ => false
  }

  /** The scan's GraftFileIndex, if `p` is the bare scan (modulo
    * attribute-only projections).
    */
  private def indexOf(p: LogicalPlan): Option[GraftFileIndex] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g)
        case _ => None
      }
      case _ => None
    }
    case Project(projs, c) if projs.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(c)
    case _ => None
  }
}
