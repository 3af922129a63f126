package graft.sql

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.core.MetaCols
import graft.spark.GraftRelation
import graft.table.GraftTable

/** SQL DML for graft tables (reference HoodieSparkSessionExtension.scala:
  * 29-44 + HoodieAnalysis.scala:39-180): resolution rules rewrite Spark's
  * UPDATE / DELETE / MERGE INTO logical plans into commands running the
  * engine's native operations. Unlike the reference (which serializes the
  * merge actions and evaluates them per record through Janino-compiled
  * Avro payloads — ExpressionPayload.scala:53-160), the actions are
  * re-rendered as SQL over the target/source aliases and compiled by
  * Catalyst into the merge projection — one codegen'd plan, no
  * per-record interpretation.
  *
  * Activate with `.config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")`
  * and address tables through a view or catalog entry backed by
  * `format("graft")`. CREATE TABLE / CTAS / INSERT INTO need no rules:
  * they flow through the V1 source (CreatableRelationProvider /
  * InsertableRelation).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    // v2-catalog scans fold to v1 relations BEFORE the DML rules look
    e.injectResolutionRule(session => GraftV2FallbackRule(session))
    e.injectResolutionRule(session => GraftDmlRules(session))
    e.injectOptimizerRule(_ => StatsAnswerRule)
    e.injectOptimizerRule(session => MvRewriteRule(session))
    GraftFunctions.all.foreach(e.injectFunction)
  }
}

final case class GraftDmlRules(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // SQL time travel — see [[GraftTimeTravel]]; the parser hook handles
    // SQL text, this rule covers plans assembled programmatically
    case tt @ RelationTimeTravel(u: UnresolvedRelation, tsOpt, verOpt) =>
      GraftTimeTravel(spark, u.multipartIdentifier, tsOpt, verOpt).getOrElse(tt)

    case u @ UpdateTable(target, assignments, condition)
        if u.childrenResolved && graftOf(target).isDefined =>
      GraftUpdateCommand(graftOf(target).get,
        assignments.map(a => assignKey(a.key) -> renderPlain(a.value)).toMap,
        condition.map(renderPlain).getOrElse("true"))

    case d @ DeleteFromTable(target, condition)
        if d.childrenResolved && graftOf(target).isDefined =>
      GraftDeleteCommand(graftOf(target).get, renderPlain(condition))

    case m @ MergeIntoTable(target, source, _, matched, notMatched, notMatchedBySource, evolve)
        if m.childrenResolved && graftOf(target).isDefined =>
      val tOut = AttributeSet(target.output)
      val sOut = AttributeSet(source.output)
      def render(e: Expression): String = renderQualified(e, tOut, sOut)
      // NOT MATCHED BY SOURCE reuses the matched action shapes but applies
      // to the target-only side; tagged with nms_ kinds so the builder
      // routes them to the target anti-join path
      val nmsClauses = notMatchedBySource.map {
        case UpdateAction(cond, assigns, _) =>
          MergeClauseSpec("nms_update", cond.map(render),
            assigns.map(a => assignKey(a.key) -> render(a.value)).toMap)
        case DeleteAction(cond) =>
          MergeClauseSpec("nms_delete", cond.map(render), Map.empty)
        case other =>
          throw new IllegalArgumentException(
            s"unsupported NOT MATCHED BY SOURCE action: $other")
      }
      val clauses = (matched ++ notMatched).map {
        case UpdateAction(cond, assigns, _) =>
          MergeClauseSpec("update", cond.map(render),
            assigns.map(a => assignKey(a.key) -> render(a.value)).toMap)
        case UpdateStarAction(cond) =>
          MergeClauseSpec("update", cond.map(render), Map.empty)
        case DeleteAction(cond) =>
          MergeClauseSpec("delete", cond.map(render), Map.empty)
        case InsertAction(cond, assigns) =>
          MergeClauseSpec("insert", cond.map(render),
            assigns.map(a => assignKey(a.key) -> render(a.value)).toMap)
        case InsertStarAction(cond) =>
          MergeClauseSpec("insert", cond.map(render), Map.empty)
        case other =>
          throw new IllegalArgumentException(s"unsupported merge action: $other")
      }
      // WITH SCHEMA EVOLUTION: Spark's analyzer has already star-expanded
      // star actions over the (pre-evolution) target columns, so re-attach
      // the source-only columns as `c -> s.c` assignments — but ONLY to
      // actions that were stars (their assignment set covers every
      // pre-evolution target data column). Explicit partial clauses
      // (UPDATE SET price = s.price) must not silently gain new-column
      // writes: Spark/Delta evolution populates new columns via star or
      // explicit reference only. The builder widens the table schema.
      val finalClauses =
        if (!evolve) clauses
        else {
          val tgtNames = target.output.map(_.name).toSet
          val tgtData = tgtNames.filterNot(MetaCols.All.contains)
          val extra = source.output.map(_.name)
            .filterNot(n => tgtNames.contains(n) || MetaCols.All.contains(n))
          clauses.map {
            case c @ MergeClauseSpec(k, _, assigns)
                if (k == "update" || k == "insert") && assigns.nonEmpty &&
                  tgtData.forall(assigns.contains) =>
              c.copy(assignments = assigns ++
                extra.filterNot(assigns.contains).map(n => n -> s"s.`$n`"))
            case c => c
          }
        }
      GraftMergeCommand(graftOf(target).get, source,
        finalClauses ++ nmsClauses, evolve)
  }

  private def graftOf(plan: LogicalPlan): Option[GraftTable] =
    plan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
        lr.relation.asInstanceOf[GraftRelation].table
    }


  /** An assignment target as a (possibly dotted) column path: nested
    * struct targets (`SET meta.pri = x`) keep their FULL path so the
    * builder applies them as withField rewrites — truncating to the last
    * part (the old behavior) silently dropped the assignment.
    */
  private def assignKey(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute => u.nameParts.mkString(".")
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      s"${assignKey(g.child)}.${g.extractFieldName}"
    case other => other.sql
  }

  /** Render for single-table predicates: strip qualifiers so the SQL
    * re-parses against the snapshot frame.
    */
  private def renderPlain(e: Expression): String =
    e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql

  /** Render for merge actions: requalify attributes by originating side
    * so the SQL re-parses against the t/s join aliases.
    */
  private def renderQualified(e: Expression, tOut: AttributeSet, sOut: AttributeSet): String =
    e.transform {
      case a: AttributeReference if sOut.contains(a) => UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference if tOut.contains(a) => UnresolvedAttribute(Seq("t", a.name))
    }.sql
}

final case class MergeClauseSpec(kind: String, condition: Option[String],
    assignments: Map[String, String])

final case class GraftUpdateCommand(table: GraftTable,
    set: Map[String, String], condition: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.update(condition, set); Seq.empty
  }
}

final case class GraftDeleteCommand(table: GraftTable,
    condition: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.deleteWhere(condition); Seq.empty
  }
}

final case class GraftMergeCommand(table: GraftTable, source: LogicalPlan,
    clauses: Seq[MergeClauseSpec], evolve: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val sourceDf = GraftSqlBridge.ofRows(spark, source)
    val builder = table.mergeInto(sourceDf)
    if (evolve) builder.withSchemaEvolution()
    clauses.foreach {
      case MergeClauseSpec("update", cond, assigns) => builder.whenMatchedUpdate(cond, assigns)
      case MergeClauseSpec("delete", cond, _) => builder.whenMatchedDelete(cond)
      case MergeClauseSpec("insert", cond, assigns) => builder.whenNotMatchedInsert(cond, assigns)
      case MergeClauseSpec("nms_update", cond, assigns) =>
        builder.whenNotMatchedBySourceUpdate(cond, assigns)
      case MergeClauseSpec("nms_delete", cond, _) =>
        builder.whenNotMatchedBySourceDelete(cond)
      case other => throw new IllegalArgumentException(other.toString)
    }
    builder.execute()
    Seq.empty
  }
}

/** SQL time travel over graft tables (temp views and catalog tables):
  * `FROM t TIMESTAMP AS OF '2026-08-15 10:00:00'` (a wall-clock cutoff,
  * UTC like the instants themselves) or `FROM t VERSION AS OF
  * '20260815...'` (a raw commit instant). Spark parses the syntax for
  * every table but only resolves it for v2 catalogs; graft tables are v1
  * relations, so [[GraftSqlParser]] substitutes the as-of scan right
  * after parsing (and [[GraftDmlRules]] covers programmatic plans).
  * Non-graft names return None and keep Spark's own error.
  */
private[sql] object GraftTimeTravel {

  def apply(spark: SparkSession, parts: Seq[String], tsOpt: Option[Expression],
      verOpt: Option[String]): Option[LogicalPlan] =
    try {
      val path = graftPathOf(spark, parts).getOrElse(return None)
      val inst = verOpt.orElse(tsOpt.flatMap(instantOf)).getOrElse(return None)
      val df = spark.read.format("graft")
        .option("asOfInstant", inst).load(path)
      Some(SubqueryAlias(parts.last, df.queryExecution.analyzed))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Base path of the graft table behind a (temp-view, session-catalog,
    * or `cat.db.t` v2-catalog) name — the one resolver behind the whole
    * SQL admin surface (OPTIMIZE/VACUUM/DESCRIBE HISTORY/CALL/
    * table_changes/time travel).
    */
  private[sql] def graftPathOf(spark: SparkSession, parts: Seq[String]): Option[String] = {
    val cat = spark.sessionState.catalog
    val fromView = parts match {
      case Seq(name) => cat.getTempView(name).flatMap(_.collectFirst {
        case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
          lr.relation.asInstanceOf[GraftRelation].table.basePath.toString
      })
      case _ => None
    }
    fromView.orElse {
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ if parts.length >= 3 => // cat.ns….t (namespaces nest)
          return v2GraftPathOf(spark, parts.head,
            parts.slice(1, parts.length - 1).toArray, parts.last)
        case _ => return None
      }
      if (!cat.tableExists(ident)) None
      else {
        val meta = cat.getTableMetadata(ident)
        if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) None
        else meta.storage.locationUri.map(_.toString)
      }
    }
  }

  /** `cat.ns….t` through a registered DSv2 [[GraftCatalog]]. */
  private def v2GraftPathOf(spark: SparkSession, cat: String, ns: Array[String],
      t: String): Option[String] =
    try {
      spark.sessionState.catalogManager.catalog(cat) match {
        case tc: org.apache.spark.sql.connector.catalog.TableCatalog =>
          val id = org.apache.spark.sql.connector.catalog.Identifier
            .of(ns, t)
          if (!tc.tableExists(id)) None
          else tc.loadTable(id) match {
            case g: GraftV2Table => Some(g.basePath)
            case _ => None
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** An as-of instant from the TIMESTAMP AS OF expression: an all-digit
    * string passes through as a raw instant; anything else evaluates as a
    * UTC timestamp and formats to the instants' own yyyyMMddHHmmssSSS.
    */
  private def instantOf(e: Expression): Option[String] = {
    if (!e.resolved || !e.foldable) return None
    def fromMicros(us: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    e.dataType match {
      case org.apache.spark.sql.types.StringType =>
        val s = String.valueOf(e.eval(null))
        if (s.nonEmpty && s.forall(_.isDigit)) Some(s)
        else Option(Cast(e, org.apache.spark.sql.types.TimestampType, Some("UTC"))
          .eval(null)).map(v => fromMicros(v.asInstanceOf[Long]))
      case org.apache.spark.sql.types.TimestampType =>
        Option(e.eval(null)).map(v => fromMicros(v.asInstanceOf[Long]))
      case _ => None
    }
  }
}
