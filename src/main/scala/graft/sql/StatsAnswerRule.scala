package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
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
        case Some(g) =>
          val answers = exprs.map(answer(g, _))
          if (answers.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(answers.map(_.get))))
          else agg
        case None => agg
      }
    // SELECT DISTINCT col — exactly one grouping attribute projected as
    // itself — answers from the dictionary value index when every file
    // proves its distinct set exhaustively
    case agg @ Aggregate(Seq(grp: AttributeReference),
        Seq(out: AttributeReference), child, _) if out.semanticEquals(grp) =>
      (supportedDistinctType(grp.dataType), indexOf(child)) match {
        case (true, Some(g)) =>
          g.exactDistinctValues(grp.name).flatMap { case (vs, hasNull) =>
            val decoded = vs.map(v => decode(Some(v), grp.dataType))
            if (decoded.forall(_.isDefined))
              Some(LocalRelation(agg.output,
                (decoded.map(_.get) ++ (if (hasNull) Seq(null) else Nil))
                  .map(v => InternalRow(v))))
            else None // a single undecodable value keeps the scan
          }.getOrElse(agg)
        case _ => agg
      }
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
    * unfiltered count/min/max over a literal or plain attribute.
    */
  private def isCandidate(ne: NamedExpression): Boolean = ne match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => true
        case Count(Seq(_: AttributeReference)) => true
        case Min(_: AttributeReference) => true
        case Max(_: AttributeReference) => true
        case _ => false
      })
    case _ => false
  }

  /** The expression's exact answer as a Catalyst internal value (inside
    * Some(_); `Some(null)` is a legitimate all-null min/max). None = not
    * answerable from stats.
    */
  private def answer(g: GraftFileIndex, ne: NamedExpression): Option[Any] =
    ne match {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => g.exactRowCount.map(identity[Any])
        case Count(Seq(a: AttributeReference)) =>
          g.exactColumnStats(a.name, a.dataType).map(_._3)
        case Min(a: AttributeReference) =>
          g.exactColumnStats(a.name, a.dataType)
            .flatMap { case (lo, _, _) => decode(lo, a.dataType) }
        case Max(a: AttributeReference) =>
          g.exactColumnStats(a.name, a.dataType)
            .flatMap { case (_, hi, _) => decode(hi, a.dataType) }
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
    * attribute-only projections). SQL temp-view / catalog names wrap the
    * v1 [[graft.spark.GraftRelation]] instead of the file-index scan —
    * for a LATEST-snapshot relation over pure base files (no MOR deltas,
    * no bootstrap-adopted externals) the same stats index is derivable
    * from the live view, so `SELECT min(...) FROM view_name` answers too.
    */
  private def indexOf(p: LogicalPlan): Option[GraftFileIndex] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g)
        case _ => None
      }
      case g: graft.spark.GraftRelation if g.latestSnapshot =>
        val slices = g.table.view.fileSlices(None)
        val pureBases = slices.forall(s =>
          s.deltaFiles.isEmpty && s.baseFile.isDefined &&
            !new org.apache.hadoop.fs.Path(s.baseFile.get.relPath).isAbsolute)
        if (!pureBases) None
        else Some(new GraftFileIndex(g.table.spark,
          new org.apache.hadoop.fs.Path(g.table.basePath.toString),
          slices.flatMap(_.baseFile)))
      case _ => None
    }
    case Project(projs, c) if projs.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(c)
    case _ => None
  }
}
