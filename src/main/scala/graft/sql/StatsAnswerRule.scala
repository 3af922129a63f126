package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, GetStructField, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.read.GraftFileIndex

/** Metadata-answered aggregates: a bare unfiltered `count(*)` /
  * `count(col)` / `min(col)` / `max(col)` over a graft snapshot or
  * read-optimized scan collapses to a `LocalRelation` computed from the
  * commit-metadata column-stats index — zero file IO, zero tasks, zero
  * jobs. At a million files this turns a cluster-wide scan into a driver
  * fold over stats the write path already recorded (the data-skipping
  * index doing double duty as an answer index; the reference line serves
  * the count(*) class of this from timeline metadata in its CLI totals).
  *
  * Strictly guarded: fires only when
  *  - the aggregate has NO grouping and every aggregate expression is a
  *    plain non-distinct, unfiltered `count(1)`/`count(*)`,
  *    `count(attr)`, `min(attr)` or `max(attr)` on a directly-scanned
  *    column;
  *  - the child is the bare scan (possibly under column-pruning
  *    projections of plain attributes) — any Filter/Union/Window between
  *    aggregate and scan disables the rewrite;
  *  - the scan's `GraftFileIndex` can answer exactly
  *    ([[GraftFileIndex.exactRowCount]] / [[GraftFileIndex.exactColumnStats]]:
  *    all base files with recorded row counts, per-column null counts and
  *    min/max; delta-bearing MOR slices never qualify because the merge
  *    branch unions above the scan). A single unanswerable expression
  *    keeps the whole aggregate on the scan path.
  */
object StatsAnswerRule extends Rule[LogicalPlan] {

  /** Session kill-switch: `SET spark.graft.statsAnswer.enabled=false`
    * keeps every aggregate on the scan path (debugging aid / belt-and-
    * braces escape hatch — the answers are exact-or-bail by design).
    */
  private def enabled: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .forall(_.conf.get("spark.graft.statsAnswer.enabled", "true") == "true")

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case agg @ Aggregate(grouping, exprs, child, _)
        if grouping.isEmpty && exprs.nonEmpty && exprs.forall(isCandidate) =>
      indexOf(child) match {
        case Some((g, env)) =>
          val answers = exprs.map(answer(g, env, _))
          if (answers.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(answers.map(_.get))))
          else agg
        case None => agg
      }
    // SELECT DISTINCT col — exactly one grouping expression (a column or
    // a nested struct leaf) projected as itself — answers from the
    // dictionary value index when every file proves its distinct set
    // exhaustively (nested leaves record dictionary sets too, r16)
    case agg @ Aggregate(Seq(grpE), Seq(out), child, _)
        if (out match {
          case a: AttributeReference => a.semanticEquals(grpE)
          case Alias(e, _) => e.semanticEquals(grpE)
          case _ => false
        }) =>
      indexOf(child) match {
        case Some((g, env)) =>
          leafPath(grpE, env) match {
            case Some((key, dt)) if supportedDistinctType(dt) =>
              g.exactDistinctValues(key).flatMap { case (vs, hasNull) =>
                val decoded = vs.map(v => decode(Some(v), dt))
                if (decoded.forall(_.isDefined))
                  Some(LocalRelation(agg.output,
                    (decoded.map(_.get) ++ (if (hasNull) Seq(null) else Nil))
                      .map(v => InternalRow(v))))
                else None // a single undecodable value keeps the scan
              }.getOrElse(agg)
            case _ => agg
          }
        case None => agg
      }
  }

  /** The stats key of an aggregate operand: a plain column, a
    * `GetStructField` chain down struct nesting (dot-path — matching the
    * write side's nested footer stats), or a Project-introduced alias of
    * one (`env` carries alias → path from [[indexOf]]'s descent, so the
    * optimizer's extracted `_extract_x` attributes still resolve).
    * Returns the key plus the LEAF type. None = not stats-addressable.
    */
  private def leafPath(e: Expression, env: Map[ExprId, (String, DataType)]):
      Option[(String, DataType)] = e match {
    case a: AttributeReference => env.get(a.exprId).orElse(Some((a.name, a.dataType)))
    case g: GetStructField =>
      leafPath(g.child, env).map { case (p, _) => (s"$p.${g.extractFieldName}", g.dataType) }
    case _ => None
  }

  /** Types the dictionary index records exactly (UTF8 binary, int32
    * plain/date, int64 plain/timestamp-micros) — matching
    * WritePipeline.dictValueSets' physical-type gate.
    */
  private def supportedDistinctType(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** Shape gate (cheap, before any stats work): alias of a non-distinct,
    * unfiltered count/min/max over a literal, plain attribute or nested
    * struct-leaf chain (the stats-addressability itself is re-checked
    * against the env in [[answer]]).
    */
  private def isCandidate(ne: NamedExpression): Boolean = ne match {
    case Alias(ae: AggregateExpression, _) =>
      def pathish(e: Expression): Boolean = e match {
        case _: AttributeReference => true
        case g: GetStructField => pathish(g.child)
        case _ => false
      }
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => true
        case Count(Seq(e)) => pathish(e)
        case Min(e) => pathish(e)
        case Max(e) => pathish(e)
        case _ => false
      })
    case _ => false
  }

  /** The expression's exact answer as a Catalyst internal value (inside
    * Some(_); `Some(null)` is a legitimate all-null min/max). None = not
    * answerable from stats. `count(meta.st)` counts rows non-null at
    * EVERY level, exactly what the nested footer numNulls records.
    */
  private def answer(g: GraftFileIndex, env: Map[ExprId, (String, DataType)],
      ne: NamedExpression): Option[Any] =
    ne match {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => g.exactRowCount.map(identity[Any])
        case Count(Seq(e)) => leafPath(e, env).flatMap { case (k, dt) =>
          g.exactColumnStats(k, dt).map(_._3)
        }
        case Min(e) => leafPath(e, env).flatMap { case (k, dt) =>
          g.exactColumnStats(k, dt).flatMap { case (lo, _, _) => decode(lo, dt) }
        }
        case Max(e) => leafPath(e, env).flatMap { case (k, dt) =>
          g.exactColumnStats(k, dt).flatMap { case (_, hi, _) => decode(hi, dt) }
        }
        case _ => None
      }
      case _ => None
    }

  /** Stat string → internal value of `dt`. Timestamps are recorded as
    * epoch micros, dates as epoch days (the same encoding the pruning
    * comparisons use). `None` stat (zero non-null rows) answers SQL NULL;
    * a parse failure disables the rewrite instead of risking a wrong
    * answer.
    */
  private def decode(s: Option[String], dt: DataType): Option[Any] = s match {
    case None => Some(null)
    case Some(v) =>
      scala.util.Try[Any] {
        dt match {
          case StringType => UTF8String.fromString(v)
          case LongType => BigDecimal(v).toLongExact
          case IntegerType => BigDecimal(v).toIntExact
          case ShortType => BigDecimal(v).toShortExact
          case ByteType => BigDecimal(v).toByteExact
          case DoubleType => v.toDouble
          case FloatType => v.toFloat
          case TimestampType | TimestampNTZType => BigDecimal(v).toLongExact
          case DateType => BigDecimal(v).toIntExact
          case _ => throw new IllegalArgumentException(s"undecodable type $dt")
        }
      }.toOption
  }

  /** The scan's GraftFileIndex, if `p` is the bare scan (modulo
    * projections of plain attributes and struct-leaf extractions). SQL
    * temp-view / catalog names wrap the v1 [[graft.spark.GraftRelation]]
    * instead of the file-index scan — for a LATEST-snapshot relation over
    * pure base files (no MOR deltas, no bootstrap-adopted externals) the
    * same stats index is derivable from the live view, so
    * `SELECT min(...) FROM view_name` answers too.
    *
    * The returned env maps Project-introduced alias attributes (e.g. the
    * optimizer's nested-pruning `_extract_x`) to the underlying stats
    * dot-path + leaf type. A Project containing ANY other computed
    * expression disables the rewrite, preserving the strict shape guard.
    */
  private def indexOf(p: LogicalPlan): Option[(GraftFileIndex, Map[ExprId, (String, DataType)])] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some((g, Map.empty))
        case _ => None
      }
      case g: graft.spark.GraftRelation if g.latestSnapshot =>
        val slices = g.table.view.fileSlices(None)
        val pureBases = slices.forall(s =>
          s.deltaFiles.isEmpty && s.baseFile.isDefined &&
            !new org.apache.hadoop.fs.Path(s.baseFile.get.relPath).isAbsolute)
        if (!pureBases) None
        else Some((new GraftFileIndex(g.table.spark,
          new org.apache.hadoop.fs.Path(g.table.basePath.toString),
          slices.flatMap(_.baseFile)), Map.empty))
      case _ => None
    }
    case Project(projs, c) =>
      indexOf(c).flatMap { case (g, env) =>
        val ok = projs.forall {
          case _: AttributeReference => true
          case Alias(e, _) => leafPath(e, env).isDefined
          case _ => false
        }
        if (!ok) None
        else Some((g, env ++ projs.collect {
          case al @ Alias(e, _) if leafPath(e, env).isDefined =>
            al.exprId -> leafPath(e, env).get
        }))
      }
    case _ => None
  }
}
