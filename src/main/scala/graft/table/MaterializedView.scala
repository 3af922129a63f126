package graft.table

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CommitMetadata, ConfigKeys, MetaCols, TableConfig, TableType}
import graft.read.Readers

/** Incrementally-maintained materialized aggregate views over graft
  * tables — beyond the 0.x reference (whose incremental queries leave
  * view maintenance to the user and drop the delete images doing it
  * right would need, IncrementalRelation.scala:60-178). The view is
  * itself a graft table keyed by the group columns, so it inherits the
  * whole table stack: snapshot/time-travel/incremental reads, OCC,
  * metrics, CLI.
  *
  * Maintenance is CDC-driven: each [[sync]] pulls the source's change
  * images for `(checkpoint, head]` via [[Readers.incrementalChanges]]
  * and folds them into the view state with one aggregation —
  * insert/update_after images count +1, delete/update_before count -1 —
  * so per-tick cost scales with the CHANGED rows, not the source size
  * (the 100 TB shape: a nightly full `GROUP BY` over the corpus is
  * exactly what this avoids). A group update that moves a row across
  * groups retracts from the old group and adds to the new one through
  * the same two images, no special casing.
  *
  * Aggregate kinds:
  *  - `count` / `sum` / `avg` are self-maintainable from deltas alone
  *    (avg persists sum+count state columns; [[read]] projects the
  *    quotient). Sums fold in DECIMAL(28,8) so incremental results are
  *    bit-identical to a from-scratch aggregate — addition of exact
  *    decimals is order-independent, double addition is not.
  *  - `min` / `max` are NOT delta-maintainable (deleting the minimum
  *    needs the runner-up), so the groups touched by the tick are
  *    re-aggregated from the source snapshot, semi-join-pruned to just
  *    those groups — bounded by the tick's group fan-out, and
  *    column-stats/dictionary file skipping prunes the scan when the
  *    group correlates with the layout.
  *
  * Crash safety: the source checkpoint instant is recorded in the SAME
  * view commit as the folded state (the DedupService discipline), so a
  * replayed tick either sees the advanced checkpoint (no-op) or re-pulls
  * the identical window against unchanged state — effectively-once
  * without multi-table transactions. Groups whose maintained row count
  * reaches zero are tombstoned through the delete-marker upsert, one
  * commit for the whole fold.
  */
object MaterializedView {

  val CheckpointKey = "graft.view.source.checkpoint"
  private val GroupsKey = "graft.view.groups"
  private val AggsKey = "graft.view.aggs"
  private val SourceKey = "graft.view.source.path"
  /** Internal per-group live-row count: detects vanished groups. */
  val RowsCol = "_mv_rows"

  /** One view aggregate: `name` is the output column, `kind` one of
    * count|sum|min|max|avg, `expr` a Spark SQL expression over the
    * source columns (`*` for count(*)).
    */
  final case class ViewAgg(name: String, kind: String, expr: String) {
    require(Seq("count", "sum", "min", "max", "avg").contains(kind),
      s"unsupported view aggregate kind '$kind' (count|sum|min|max|avg)")
  }

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)
  private def dec(s: String) = URLDecoder.decode(s, UTF_8)

  /** Create the view table and record its definition as table
    * properties (the stored definition is authoritative — every sync
    * reads it back, so call-site drift cannot corrupt the state).
    * `groupBy` maps output alias -> Spark SQL expression.
    */
  def create(spark: SparkSession, path: String, source: GraftTable,
      groupBy: Seq[(String, String)], aggs: Seq[ViewAgg]): GraftTable = {
    require(groupBy.nonEmpty, "materialized view needs group columns")
    require(aggs.nonEmpty, "materialized view needs aggregates")
    val names = groupBy.map(_._1) ++ aggs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate output column among ${names.mkString(", ")}")
    GraftTable.create(spark, path, TableConfig(
      "mv_" + source.cfg.tableName, TableType.CopyOnWrite,
      recordKeyFields = groupBy.map(_._1),
      partitionPathExpr = "", precombineField = "",
      props = Map(
        GroupsKey -> groupBy.map { case (n, e) => s"${enc(n)}:${enc(e)}" }.mkString(";"),
        AggsKey -> aggs.map(a => s"${enc(a.name)}:${a.kind}:${enc(a.expr)}" ).mkString(";"),
        SourceKey -> source.basePath.toString)))
  }

  private def groupsOf(view: GraftTable): Seq[(String, String)] =
    view.cfg.prop(GroupsKey, "").split(";").toSeq.filter(_.nonEmpty).map { p =>
      val Array(n, e) = p.split(":", 2); (dec(n), dec(e))
    }

  private def aggsOf(view: GraftTable): Seq[ViewAgg] =
    view.cfg.prop(AggsKey, "").split(";").toSeq.filter(_.nonEmpty).map { p =>
      val Array(n, k, e) = p.split(":", 3); ViewAgg(dec(n), k, dec(e))
    }

  /** Exact-fold input for sum/avg: decimal addition is associative and
    * commutative, so the incremental fold lands bit-identical to a
    * from-scratch aggregate regardless of batch boundaries.
    */
  private def decIn(e: String): Column = expr(e).cast("decimal(28,8)")

  /** Signed weight as a WIDTH-PINNED decimal: long(=decimal(20,0)) ×
    * decimal(28,8) overflows precision 38 and Spark silently drops the
    * scale to 6 — decimal(2,0) keeps the product at (31,8).
    */
  private def wDec: Column = col("_w").cast("decimal(2,0)")

  /** Canonical persisted type for sum state (folds re-cast to it so the
    * stored width never creeps toward the 38-digit precision cap).
    */
  private val SumType = "decimal(28,8)"

  private def sumCol(a: ViewAgg) = s"${a.name}__sum"
  private def cntCol(a: ViewAgg) = s"${a.name}__cnt"

  /** The view's persisted state columns for one aggregate. */
  private def stateCols(a: ViewAgg): Seq[String] = a.kind match {
    case "avg" => Seq(sumCol(a), cntCol(a))
    case _ => Seq(a.name)
  }

  /** From-scratch aggregate columns (initial sync and min/max repair). */
  private def fullAggs(aggs: Seq[ViewAgg]): Seq[Column] =
    aggs.flatMap { a =>
      a.kind match {
        case "count" if a.expr == "*" => Seq(count(lit(1)).as(a.name))
        case "count" => Seq(count(expr(a.expr)).as(a.name))
        case "sum" => Seq(sum(decIn(a.expr)).cast(SumType).as(a.name))
        case "min" => Seq(min(expr(a.expr)).as(a.name))
        case "max" => Seq(max(expr(a.expr)).as(a.name))
        case "avg" => Seq(sum(decIn(a.expr)).cast(SumType).as(sumCol(a)),
          count(expr(a.expr)).as(cntCol(a)))
      }
    } :+ count(lit(1)).as(RowsCol)

  /** Signed delta aggregate columns over change images carrying `_w`. */
  private def deltaAggs(aggs: Seq[ViewAgg]): Seq[Column] =
    aggs.flatMap { a =>
      def nn = when(expr(a.expr).isNotNull, col("_w").cast("long")).otherwise(lit(0L))
      a.kind match {
        case "count" if a.expr == "*" => Seq(sum(col("_w").cast("long")).as(a.name))
        case "count" => Seq(sum(nn).as(a.name))
        case "sum" => Seq(sum(wDec * coalesce(decIn(a.expr), lit(0).cast(SumType))).cast(SumType).as(a.name))
        case "min" | "max" => Seq.empty // repaired from source, not folded
        case "avg" => Seq(sum(wDec * coalesce(decIn(a.expr), lit(0).cast(SumType))).cast(SumType).as(sumCol(a)),
          sum(nn).as(cntCol(a)))
      }
    } :+ sum(col("_w").cast("long")).as(RowsCol)

  private def lastCheckpoint(view: GraftTable): Option[String] =
    view.timeline.completedDataInstants().reverse.iterator
      .map(i => CommitMetadata.fromJson(view.timeline.readContent(i)))
      .flatMap(_.extraMetadata.get(CheckpointKey))
      .take(1).toSeq.headOption

  /** Fold the source's changes since the last sync into the view.
    * Returns the view commit instant, or None when already up to date.
    */
  def sync(view: GraftTable, source: GraftTable): Option[String] = {
    val groups = groupsOf(view)
    val aggs = aggsOf(view)
    val head = source.timeline.lastCompleted().map(_.ts)
      .getOrElse(return None) // empty source: nothing to fold yet
    val ckpt = lastCheckpoint(view)
    if (ckpt.contains(head)) return None
    val groupCols = groups.map { case (n, e) => expr(e).as(n) }
    val names = groups.map(_._1)
    // reads pin to `head` (time travel), never "latest": a writer
    // landing a commit between checkpoint choice and the scan would
    // otherwise fold rows the checkpoint doesn't cover (double-counted
    // by the next sync)
    def sourceAt = Readers.timeTravel(source, head).drop(MetaCols.All: _*)
    val state = ckpt match {
      case None =>
        // first sync: one full aggregate is cheaper and has no
        // begin-side file-retention requirement
        val fa = fullAggs(aggs)
        sourceAt.groupBy(groupCols: _*).agg(fa.head, fa.tail: _*)
      case Some(begin) =>
        // no data instants inside the window -> no logical changes; skip
        // the read entirely (timeline-only check, zero Spark jobs)
        val hasData = source.timeline.completedDataInstants()
          .exists(i => i.ts > begin && i.ts <= head)
        if (!hasData) return None
        val changes = Readers.incrementalChanges(source, begin, Some(head))
        val w = when(col(Readers.ChangeTypeCol).isin("insert", "update_after"), lit(1))
          .otherwise(lit(-1))
        val da = deltaAggs(aggs)
        val delta = changes.withColumn("_w", w)
          .groupBy(groupCols: _*).agg(da.head, da.tail: _*)
        val old = Readers.snapshot(view).drop(MetaCols.All: _*)
        val d = names.foldLeft(delta)((df, n) => df.withColumnRenamed(n, s"_d_$n"))
          .withColumnsRenamed(
            aggs.flatMap(stateCols).map(c => c -> s"_d_$c").toMap + (RowsCol -> s"_d_$RowsCol"))
        val joined = d.join(old,
          names.map(n => d(s"_d_$n") <=> old(n)).reduce(_ && _), "left_outer")
        val newRows = coalesce(col(RowsCol), lit(0L)) + col(s"_d_$RowsCol")
        val folded0 = joined.select(
          names.map(n => col(s"_d_$n").as(n)) ++
            aggs.flatMap { a =>
              a.kind match {
                case "min" | "max" => stateCols(a).map(c => col(c)) // repaired below
                case "count" | "avg" | "sum" =>
                  // decimal(28,8)+decimal(28,8) widens to (29,8): pin sum
                  // state back so the stored width is fold-count-invariant
                  stateCols(a).map { c =>
                    val added = coalesce(col(c), lit(0)) + col(s"_d_$c")
                    val isSumState = a.kind == "sum" || c == sumCol(a)
                    (if (isSumState) added.cast(SumType) else added).as(c)
                  }
              }
            } :+ newRows.as(RowsCol): _*)
        val needRepair = aggs.exists(a => a.kind == "min" || a.kind == "max")
        val folded =
          if (!needRepair) folded0
          else {
            // re-aggregate min/max for the touched groups only: the scan
            // is semi-join-pruned to them (file skipping applies)
            val touched = folded0.select(names.map(col): _*)
            val mmAggs = aggs.filter(a => a.kind == "min" || a.kind == "max")
            val mm = mmAggs.map(a =>
              (if (a.kind == "min") min(col(s"_in_${a.name}"))
               else max(col(s"_in_${a.name}"))).as(a.name))
            val repaired = sourceAt
              .select(groupCols ++ mmAggs.map(a => expr(a.expr).as(s"_in_${a.name}")): _*)
              .join(touched, names, "left_semi")
              .groupBy(names.map(col): _*)
              .agg(mm.head, mm.tail: _*)
            val r = names.foldLeft(repaired)((df, n) => df.withColumnRenamed(n, s"_r_$n"))
              .withColumnsRenamed(mmAggs.map(a => a.name -> s"_r_${a.name}").toMap)
            folded0.join(r,
              names.map(n => folded0(n) <=> r(s"_r_$n")).reduce(_ && _), "left_outer")
              .select(names.map(folded0(_)) ++
                aggs.flatMap { a =>
                  a.kind match {
                    case "min" | "max" => Seq(col(s"_r_${a.name}").as(a.name))
                    case _ => stateCols(a).map(folded0(_))
                  }
                } :+ folded0(RowsCol): _*)
          }
        folded
    }
    // vanished groups tombstone through the same commit
    val upsertable = state.withColumn(MetaCols.DeleteFlag, col(RowsCol) <= 0L)
    Some(view.upsert(upsertable, extraMetadata = Map(CheckpointKey -> head)))
  }

  /** User-facing projection of the view state: avg becomes sum/count in
    * IEEE-754 double (both operands exact, so the quotient is
    * deterministic), internal state columns drop out.
    */
  def read(view: GraftTable): DataFrame = {
    val groups = groupsOf(view)
    val aggs = aggsOf(view)
    Readers.snapshot(view).select(
      groups.map { case (n, _) => col(n) } ++ aggs.map { a =>
        a.kind match {
          case "avg" => (col(sumCol(a)).cast("double") / col(cntCol(a)).cast("double")).as(a.name)
          case _ => col(a.name)
        }
      }: _*)
  }
}
