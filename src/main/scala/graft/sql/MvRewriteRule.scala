package graft.sql

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Cast, Coalesce, Divide, Expression, HllSketchEstimate, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Complete, Count, HllUnionAgg, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.core.MetaCols
import graft.read.Readers
import graft.spark.GraftRelation
import graft.table.{GraftTable, MaterializedView}
import graft.table.MaterializedView.ViewAgg

/** Aggregate navigation: answer a source-table aggregate from a
  * registered materialized view — the classic warehouse MV-rewrite
  * (Oracle/Calcite "aggregate navigation"; beyond the 0.x reference,
  * which has no view subsystem at all). At 100 TB this is the difference
  * between scanning the fact table and scanning a few MB of view state:
  * the rewritten plan reads ONLY the view's parquet.
  *
  * A rewrite fires only when ALL of:
  *  - the aggregate's child is a bare latest-snapshot graft scan
  *    (attribute-only projections and one Filter allowed; time-travel /
  *    incremental scans never qualify — [[GraftRelation.latestSnapshot]]);
  *  - the source has registered views and one is FRESH
  *    ([[MaterializedView.isFresh]]: its checkpoint covers every
  *    completed data instant — a concurrent writer simply disables the
  *    rewrite until the post-commit sync lands);
  *  - every query group expression matches a view group expression
  *    (a strict subset rolls up — the view's unique group rows
  *    re-aggregate, count -> sum of counts, min -> min of mins, HLL
  *    sketches union);
  *  - the query filter's conjuncts split into the view's own WHERE
  *    conjuncts (exact match) plus a residual that references only
  *    matched group expressions (remapped onto the view's group columns,
  *    where partition/file pruning applies);
  *  - every aggregate output derives from view state: count/sum/min/max/
  *    avg/approx_count_distinct, non-distinct and unfiltered.
  *
  * Sum/avg derivations inherit the view's DECIMAL(28,8) fold (the
  * documented order-independence trade: floating sums round at 8 dp).
  * `spark.graft.mv.rewrite=false` disables the rule.
  */
final case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg @ Aggregate(grouping, out, child, _) =>
        // any failure (unreadable view, unresolvable expr) falls back to
        // the original plan — the rewrite is an optimization, never a
        // correctness dependency
        try rewrite(grouping, out, child).getOrElse(agg)
        catch { case NonFatal(_) => agg }
    }
  }

  /** The child as (relation, optional filter) if it is a bare
    * latest-snapshot graft scan.
    */
  private def strip(p: LogicalPlan): Option[(LogicalRelation, GraftRelation, Option[Expression])] =
    p match {
      case lr: LogicalRelation => lr.relation match {
        case g: GraftRelation if g.latestSnapshot => Some((lr, g, None))
        case _ => None
      }
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) => strip(c)
      case Filter(cond, c) => strip(c) match {
        case Some((lr, g, None)) => Some((lr, g, Some(cond)))
        case _ => None
      }
      case _ => None
    }

  /** The child as a left-deep INNER-join tree of bare latest-snapshot
    * graft scans: every relation, the join-condition conjuncts, and the
    * filter conjuncts collected from above the joins and from any side
    * (the optimizer has already pushed dim predicates below the join by
    * the time this rule runs).
    */
  private def stripJoins(p: LogicalPlan): Option[(Seq[(LogicalRelation,
      GraftRelation)], Seq[Expression], Seq[Expression])] = p match {
    case Filter(c, ch) => stripJoins(ch).map {
      case (rels, jcs, fs) => (rels, jcs, fs ++ conjuncts(c)) }
    case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripJoins(ch)
    case Join(l, r, Inner, Some(cond), _) =>
      for {
        (lrels, ljcs, lfs) <- stripJoins(l)
        (rlr, rrel, rf) <- strip(r)
      } yield (lrels :+ ((rlr, rrel)), ljcs ++ conjuncts(cond),
        lfs ++ rf.toSeq.flatMap(conjuncts))
    case _ => strip(p).map { case (lr, g, f) =>
      (Seq((lr, g)), Seq.empty, f.toSeq.flatMap(conjuncts)) }
  }

  private def rewrite(grouping: Seq[Expression], out: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    strip(child) match {
      case Some((lr, rel, qFilter)) =>
        val source = rel.table
        val views = MaterializedView.registered(source)
        if (views.isEmpty) None
        else views.iterator
          .flatMap(p => tryView(p, source, lr, grouping, out, qFilter))
          .nextOption()
      case None => stripJoins(child).flatMap { case (rels, jconj, qcs) =>
        if (rels.size < 2) None
        else rels.indices.iterator.flatMap { fi =>
          // any relation may be the fact; the rest must match the dims
          val (flr, frel) = rels(fi)
          val dimRels = rels.patch(fi, Nil, 1)
          MaterializedView.registered(frel.table).iterator.flatMap(p =>
            tryStarView(p, frel.table, flr, dimRels, jconj, grouping, out, qcs))
        }.nextOption()
      }
    }

  /** Parse a view-definition expression and resolve it against the
    * query's own relation node(s), so canonicalized comparison against
    * the query's (already resolved) expressions sees the same attribute
    * ids.
    */
  private def resolveOn(lr: LogicalPlan, sql: String): Option[Expression] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, "_mv_r")()), lr)) match {
        case Project(Seq(Alias(e, _)), _) =>
          // fold constants so literals match the query side, which the
          // optimizer has already folded (SQL '2.0' arrives as a decimal
          // literal under a cast; the query plan holds a plain double)
          Some(e.transformUp {
            case f if f.foldable => Literal.create(f.eval(null), f.dataType)
          })
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def tryView(path: String, source: GraftTable, lr: LogicalRelation,
      grouping: Seq[Expression], out: Seq[NamedExpression],
      qFilter: Option[Expression]): Option[LogicalPlan] = {
    val view = GraftTable.load(spark, path)
    // star views never answer single-table queries: the dim INNER join
    // filters (and could multiply) fact rows, so even fact-only
    // expressions aggregate a different row set
    if (MaterializedView.dimsOf(view).nonEmpty) return None
    if (!MaterializedView.isFresh(view, source)) return None
    tryMatch(view, sql => resolveOn(lr, sql), grouping, out,
      qFilter.toSeq.flatMap(conjuncts))
  }

  /** Star-join navigation: answer `fact INNER JOIN dims GROUP BY ...`
    * from a star view whose dim tables AND join conditions match the
    * query's (dims paired by table path; join conjunct sets compared
    * canonically, with view expressions resolved under the view's own
    * aliases wrapped around the QUERY's relation nodes, so attribute ids
    * line up). Everything downstream — group matching, rollup, filter
    * split, aggregate derivation — is the shared [[tryMatch]]. Freshness
    * covers the dims: any dim write since the last sync reads as stale.
    */
  private def tryStarView(path: String, source: GraftTable,
      flr: LogicalRelation, dimRels: Seq[(LogicalRelation, GraftRelation)],
      joinConj: Seq[Expression], grouping: Seq[Expression],
      out: Seq[NamedExpression], qcs: Seq[Expression]): Option[LogicalPlan] = {
    val view = GraftTable.load(spark, path)
    val dims = MaterializedView.dimsOf(view)
    if (dims.isEmpty || dims.size != dimRels.size) return None
    // pair view dims to query relations by table path; ambiguous (same
    // dim joined twice) stays unanswered
    val byPath = dimRels.map(dr => dr._2.table.basePath.toString -> dr._1).toMap
    if (byPath.size != dimRels.size) return None
    val paired: Seq[(String, LogicalRelation, String)] = dims.map {
      case (al, p, cond) => byPath.get(p) match {
        case Some(dlr) => (al, dlr, cond)
        case None => return None
      }
    }
    if (!MaterializedView.isFresh(view, source)) return None
    val rplan = paired.foldLeft[LogicalPlan](
      SubqueryAlias(MaterializedView.factAliasOf(view), flr)) {
      case (acc, (al, dlr, _)) =>
        Join(acc, SubqueryAlias(al, dlr), Inner, None, JoinHint.NONE)
    }
    val resolve: String => Option[Expression] = sql => resolveOn(rplan, sql)
    val vjc = paired.flatMap { case (_, _, cond) =>
      conjuncts(resolve(cond).getOrElse(return None))
    }
    if (vjc.map(_.canonicalized).toSet !=
        joinConj.map(_.canonicalized).toSet) return None
    tryMatch(view, resolve, grouping, out, qcs)
  }

  private def tryMatch(view: GraftTable,
      resolve: String => Option[Expression], grouping: Seq[Expression],
      out: Seq[NamedExpression], qcs: Seq[Expression]): Option[LogicalPlan] = {
    val groups = MaterializedView.groupsOf(view)
    val aggs = MaterializedView.aggsOf(view)

    // resolve every view expression against the query's relation(s)
    val groupRes: Seq[(String, Expression)] = groups.map { case (n, e) =>
      n -> (resolve(e).getOrElse(return None))
    }
    val aggRes: Map[ViewAgg, Option[Expression]] = aggs.map { a =>
      a -> (if (a.expr == "*") None
            else Some(resolve(a.expr).getOrElse(return None)))
    }.toMap
    val vWhere = MaterializedView.whereOf(view)
      .map(w => resolve(w).getOrElse(return None))

    // the view's stored state (group cols + agg state cols), fresh plan
    val vplan = Readers.snapshot(view).drop(MetaCols.All: _*)
      .queryExecution.analyzed
    // function value, not a def: the non-local `return None` must exit
    // tryView (a nested def would capture the return instead)
    val vattr: String => Attribute = n =>
      vplan.output.find(_.name == n).getOrElse(return None)
    val gByCanon: Map[Expression, String] =
      groupRes.map { case (n, e) => e.canonicalized -> n }.toMap

    // filter admission: view WHERE conjuncts must appear verbatim in the
    // query filter; the residual must remap onto matched group columns
    val vcs = vWhere.toSeq.flatMap(conjuncts).map(_.canonicalized)
    if (!vcs.forall(v => qcs.exists(_.canonicalized == v))) return None
    val residual = qcs.filterNot(c => vcs.contains(c.canonicalized)).map { c =>
      val remapped = c.transformDown {
        case x if gByCanon.contains(x.canonicalized) => vattr(gByCanon(x.canonicalized))
      }
      if (!remapped.references.subsetOf(AttributeSet(vplan.output))) return None
      remapped
    }

    // every query grouping expression must be a view group column
    val gAttrs: Seq[Attribute] = grouping.map(g =>
      gByCanon.get(g.canonicalized).map(vattr).getOrElse(return None))

    def findAgg(kind: String, arg: Option[Expression]): Option[ViewAgg] =
      aggs.find(a => a.kind == kind && ((arg, aggRes(a)) match {
        case (None, None) => true
        case (Some(c), Some(r))  => c.canonicalized == r.canonicalized
        case _ => false
      }))
    def agg(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    def cast(e: Expression, o: NamedExpression): Expression =
      if (e.dataType == o.dataType) e else Cast(e, o.dataType, tz)

    def deriveAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case Count(Seq(Literal(_, _))) =>
        // a global rollup of an empty view must stay 0, not null
        findAgg("count", None).map(va =>
          Coalesce(Seq(agg(Sum(vattr(va.name))), Literal(0L))))
      case Count(Seq(e)) =>
        findAgg("count", Some(e)).map(va =>
          Coalesce(Seq(agg(Sum(vattr(va.name))), Literal(0L))))
      case s: Sum =>
        findAgg("sum", Some(s.child)).map(va => agg(Sum(vattr(va.name))))
      case m: Min =>
        findAgg("min", Some(m.child)).map(va => agg(Min(vattr(va.name))))
      case m: Max =>
        findAgg("max", Some(m.child)).map(va => agg(Max(vattr(va.name))))
      case a: Average =>
        findAgg("avg", Some(a.child)).map(va => Divide(
          Cast(agg(Sum(vattr(MaterializedView.sumCol(va)))),
            org.apache.spark.sql.types.DoubleType, tz),
          Cast(agg(Sum(vattr(MaterializedView.cntCol(va)))),
            org.apache.spark.sql.types.DoubleType, tz)))
      case h: HyperLogLogPlusPlus =>
        findAgg("approx_ndv", Some(h.child)).map(va =>
          HllSketchEstimate(agg(
            new HllUnionAgg(vattr(va.name), allowDifferentLgConfigK = false))))
      case _ => None
    }

    // derive an arbitrary output expression: aggregate calls map to view
    // state, group subexpressions map to view group columns, everything
    // around them (casts, arithmetic over aggs) is rebuilt as-is. Manual
    // recursion, NOT transformDown: the derived subtrees contain fresh
    // AggregateExpressions that a transform would re-visit and reject.
    // function value (like vattr): the non-local returns must exit tryView
    lazy val deriveExpr: Expression => Expression = {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        deriveAgg(ae.aggregateFunction).getOrElse(return None)
      case _: AggregateExpression => return None // distinct / filtered
      case x if gByCanon.contains(x.canonicalized) => vattr(gByCanon(x.canonicalized))
      case x if x.children.isEmpty => x
      case x => x.withNewChildren(x.children.map(deriveExpr))
    }

    val vAttrSet = AttributeSet(vplan.output)
    val outAliases: Seq[NamedExpression] = out.map { o =>
      val derived: Expression = o match {
        case a: AttributeReference =>
          gByCanon.get(a.canonicalized).map(vattr).getOrElse(return None)
        case Alias(e, _) => deriveExpr(e)
        case _ => return None
      }
      // any leftover source attribute means something didn't map
      if (!derived.references.subsetOf(vAttrSet)) return None
      Alias(cast(derived, o), o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }

    val filtered = residual.reduceOption(And).map(Filter(_, vplan)).getOrElse(vplan)
    logInfo(s"answering aggregate over ${view.cfg.prop(MaterializedView.SourceKey, "")} " +
      s"from materialized view ${view.basePath}")
    Some(Aggregate(gAttrs, outAliases, filtered))
  }
}
