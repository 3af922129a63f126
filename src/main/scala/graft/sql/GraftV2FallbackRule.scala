package graft.sql

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.BooleanType

/** Analysis-time bridge from the DSv2 catalog to the engine's v1 plans:
  * a scan of [[GraftV2Table]] (resolved through [[GraftCatalog]]) is
  * replaced by the SAME `GraftRelation` that `format("graft")` produces,
  * and v2 write nodes over it fold back to the v1 `InsertableRelation`
  * insert command. One read/write path to keep correct — the catalog is
  * ergonomics (name resolution + DDL), not a second engine. The relation's
  * output attributes are REUSED (same ExprIds), so already-resolved parent
  * operators are untouched.
  *
  * Runs among the extension resolution rules BEFORE the DML rules, so
  * MERGE/UPDATE/DELETE over catalog names see the familiar v1 shape.
  *
  * Overwrite routing (reference SparkInsertOverwriteCommitActionExecutor
  * vs SparkInsertOverwriteTableCommitActionExecutor): the v2 fold
  * preserves the statement's scope —
  *  - `OverwriteByExpression` with a TRUE delete expression (plain
  *    `INSERT OVERWRITE t` under static mode) replaces the whole table;
  *  - a partition predicate (static `PARTITION (p='a')`, or a
  *    DataFrameWriterV2 `overwrite(cond)` touching only partition
  *    columns) becomes a partition-scoped replacecommit over exactly the
  *    matching partitions — untouched partitions keep their data;
  *  - any predicate that cannot be answered partition-by-partition
  *    refuses loudly instead of silently widening to the whole table;
  *  - `OverwritePartitionsDynamic` (dynamic partitionOverwriteMode)
  *    replaces exactly the partitions the batch writes into.
  */
final case class GraftV2FallbackRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftOf(r: DataSourceV2Relation): Option[GraftV2Table] =
    r.table match {
      case t: GraftV2Table => Some(t)
      case _ => None
    }

  /** The v1 replacement: the engine relation once data exists; before the
    * first commit, a GraftRelation over an empty frame with the DECLARED
    * schema — still an InsertableRelation, so the first `INSERT INTO`
    * lands through the same v1 write path as every later one.
    */
  private def toV1(r: DataSourceV2Relation, t: GraftV2Table): LogicalPlan = {
    val rel: org.apache.spark.sql.sources.BaseRelation =
      if (t.table.latestSchema.isEmpty) {
        val declared = t.schema()
        graft.spark.GraftRelation(spark.sqlContext, declared,
          () => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared),
          t.table, latestSnapshot = true)
      } else new graft.spark.GraftDataSource().createRelation(
        spark.sqlContext,
        Map("path" -> t.basePath, "includeMetaColumns" -> "false") ++
          t.readOptions) // queryType (_ro names) / asOfInstant (AS OF)
    if (rel.schema == r.schema)
      LogicalRelation(rel, r.output.map(_.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.AttributeReference]),
        None, isStreaming = false, None)
    else {
      // schema drifted between loadTable and now (concurrent evolution):
      // align by name; reads stay correct, v1 INSERT matching is forgone
      val v1 = LogicalRelation(rel, isStreaming = false)
      val byName = v1.output.map(a => a.name -> a).toMap
      Project(r.output.map(o => Alias(byName.getOrElse(o.name,
        throw new AnalysisException("USER_RAISED_EXCEPTION", Map("errorMessage" ->
          (s"column `${o.name}` of ${t.name()} was dropped by a concurrent " +
            "schema change; re-resolve the table")))), o.name)(exprId = o.exprId)), v1)
    }
  }

  /** The statement's delete expression rebound for evaluation against a
    * partition-value row (one slot per identity partition column, layout
    * order): defined iff the predicate references ONLY the table's
    * identity partition column(s) — single or multi-level — i.e. it can
    * be answered partition-by-partition without reading data. A
    * reference-FREE predicate (e.g. `overwrite(lit(false))`) is NOT a
    * partition predicate: it names no partitions, and treating it as one
    * would still replace the batch's touched partitions when the
    * condition authorized deleting nothing.
    */
  private def partitionPredicate(t: GraftV2Table, r: DataSourceV2Relation,
      pred: Expression): Option[Expression] = {
    val fs = t.partitionFields
    if (fs.isEmpty || pred.references.isEmpty) return None
    val slotOf = fs.zipWithIndex.flatMap { case (f, i) =>
      r.output.find(_.name.equalsIgnoreCase(f.name)).map(_.exprId -> i)
    }.toMap
    if (slotOf.size != fs.size) return None
    if (!pred.references.forall(a => slotOf.contains(a.exprId))) return None
    Some(pred.transform {
      case a: AttributeReference if slotOf.contains(a.exprId) =>
        BoundReference(slotOf(a.exprId), fs(slotOf(a.exprId)).dataType, nullable = true)
    })
  }

  private def insertEvolutionEnabled(t: GraftV2Table): Boolean =
    spark.sessionState.conf
      .getConfString("graft.sql.insert.schema.evolution", "false").toBoolean ||
      t.table.cfg.prop("graft.sql.insert.schema.evolution", "false").toBoolean

  /** True iff the query's shape differs from the table's ONLY by struct
    * drift the engine's additive merge accepts: column names/count line
    * up, every drifted pair either merges via
    * [[graft.table.SchemaEvolution.mergeEvolvedType]] (struct-bearing) or
    * upcasts losslessly (scalar), and at least one struct-bearing column
    * actually drifts (otherwise the plain ANSI path handles it). Requires
    * a committed table schema — pre-first-commit tables keep ANSI.
    */
  private def needsStructEvolution(t: GraftV2Table, query: LogicalPlan,
      byName: Boolean): Boolean = {
    if (t.table.latestSchema.isEmpty) return false
    val fields = t.schema().fields
    val in = query.schema.fields
    if (in.length != fields.length) return false
    val paired: Option[Seq[(org.apache.spark.sql.types.StructField,
        org.apache.spark.sql.types.StructField)]] =
      if (byName) {
        val have = in.map(f => f.name.toLowerCase -> f).toMap
        if (fields.forall(f => have.contains(f.name.toLowerCase)))
          Some(fields.toSeq.map(f => f -> have(f.name.toLowerCase)))
        else None
      } else Some(fields.toSeq.zip(in.toSeq))
    paired match {
      case None => false
      case Some(ps) =>
        import graft.table.SchemaEvolution
        var structDrift = false
        val allOk = ps.forall { case (tf, inf) =>
          if (tf.dataType == inf.dataType) true
          else if (SchemaEvolution.containsStruct(tf.dataType) ||
              SchemaEvolution.containsStruct(inf.dataType)) {
            structDrift = true
            scala.util.Try(SchemaEvolution.mergeEvolvedType(
              tf.name, tf.dataType, inf.dataType)).isSuccess
          } else org.apache.spark.sql.catalyst.expressions.Cast
            .canUpCast(inf.dataType, tf.dataType)
        }
        structDrift && allOk
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case r: DataSourceV2Relation if graftOf(r).isDefined =>
      toV1(r, graftOf(r).get)
    // V2WriteCommands hold their target OUT of the child list, so the
    // relation case above never reaches it — fold them to the v1 insert
    case a: AppendData if a.table.isInstanceOf[DataSourceV2Relation] &&
        graftOf(a.table.asInstanceOf[DataSourceV2Relation]).isDefined =>
      val r = a.table.asInstanceOf[DataSourceV2Relation]
      val t = graftOf(r).get
      // OPT-IN nested evolution for SQL INSERT (r16 directive): the
      // DEFAULT keeps ANSI semantics — a drifted struct refuses with
      // Spark's named EXTRA_STRUCT_FIELDS analysis error (pinned in
      // CatalogDdlSpec). With `graft.sql.insert.schema.evolution=true`
      // (session conf or table prop), an INSERT whose struct shapes
      // differ ADDITIVELY from the table's routes around the output
      // resolver into the engine's insert, whose batch alignment runs the
      // same SchemaEvolution.mergeEvolvedType merge every engine write
      // uses — SQL-only pipelines with drifting writers evolve instead of
      // failing, and non-additive drift still refuses with the engine's
      // named error.
      if (insertEvolutionEnabled(t) && a.query.resolved &&
          needsStructEvolution(t, a.query, a.isByName))
        GraftEvolvingInsertCommand(t, a.query, a.isByName)
      else
        InsertIntoStatement(toV1(r, t), Map.empty, Nil, a.query,
          overwrite = false, ifPartitionNotExists = false, byName = a.isByName)
    case o: OverwriteByExpression if o.table.isInstanceOf[DataSourceV2Relation] &&
        graftOf(o.table.asInstanceOf[DataSourceV2Relation]).isDefined &&
        o.query.resolved && o.deleteExpr.resolved =>
      val r = o.table.asInstanceOf[DataSourceV2Relation]
      val t = graftOf(r).get
      o.deleteExpr match {
        case Literal(true, BooleanType) =>
          InsertIntoStatement(toV1(r, t), Map.empty, Nil, o.query,
            overwrite = true, ifPartitionNotExists = false, byName = o.isByName)
        case pred => partitionPredicate(t, r, pred) match {
          case Some(bound) =>
            GraftOverwritePartitionsCommand(t, o.query, Some(bound), o.isByName)
          case None => throw new AnalysisException("USER_RAISED_EXCEPTION",
            Map("errorMessage" -> (s"INSERT OVERWRITE ${t.name()}: overwrite " +
              s"condition ${pred.sql} is not a partition predicate — graft " +
              "tables overwrite whole partitions (condition must reference " +
              "only partition columns, and at least one) or the whole table")))
        }
      }
    case d: OverwritePartitionsDynamic if d.table.isInstanceOf[DataSourceV2Relation] &&
        graftOf(d.table.asInstanceOf[DataSourceV2Relation]).isDefined &&
        d.query.resolved =>
      val r = d.table.asInstanceOf[DataSourceV2Relation]
      GraftOverwritePartitionsCommand(graftOf(r).get, d.query, None, d.isByName)
  }
}

/** SQL `INSERT INTO` with opt-in additive struct evolution
  * (`graft.sql.insert.schema.evolution=true`): bypasses the ANSI output
  * resolver (which refuses any struct drift) and lands the batch through
  * the engine's insert, whose batch alignment runs the SAME
  * `SchemaEvolution.mergeEvolvedType` contract as upsert/MERGE — additive
  * nested adds widen the commit schema, narrow batches pad typed nulls,
  * non-additive drift refuses with the nested path named. Scalar columns
  * still take the ANSI store-assignment cast.
  */
final case class GraftEvolvingInsertCommand(v2: GraftV2Table,
    query: LogicalPlan, byName: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, query)
    val fields = v2.schema().fields.toIndexedSeq
    val renamed =
      if (byName) {
        val have = df0.columns.map(c => c.toLowerCase -> c).toMap
        df0.select(fields.map(f => col(have(f.name.toLowerCase)).as(f.name)): _*)
      } else df0.toDF(fields.map(_.name): _*)
    val aligned = renamed.select(fields.map { f =>
      val cur = renamed.schema(f.name).dataType
      if (cur == f.dataType) col(f.name)
      else if (graft.table.SchemaEvolution.containsStruct(cur) ||
          graft.table.SchemaEvolution.containsStruct(f.dataType))
        col(f.name) // raw — the engine's additive merge evolves it
      else col(f.name).cast(f.dataType).as(f.name)
    }: _*)
    v2.table.insert(aligned)
    Seq.empty
  }
}

/** Partition-scoped `INSERT OVERWRITE` over a catalog name — the engine's
  * `insertOverwrite` replacecommit (reference
  * SparkInsertOverwriteCommitActionExecutor.java: replace file groups of
  * exactly the affected partitions). `boundPred` (static mode) selects
  * the partitions the STATEMENT names — they are replaced even if the
  * batch writes no rows into them; None (dynamic mode) replaces exactly
  * the batch's touched partitions.
  */
final case class GraftOverwritePartitionsCommand(v2: GraftV2Table,
    query: LogicalPlan, boundPred: Option[Expression], byName: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, query)
    val fields = v2.schema().fields.toIndexedSeq
    val aligned =
      if (byName) {
        val have = df0.columns.map(c => c.toLowerCase -> c).toMap
        df0.select(fields.map { f =>
          have.get(f.name.toLowerCase) match {
            case Some(c) => col(c).cast(f.dataType).as(f.name)
            case None => org.apache.spark.sql.functions.lit(null)
              .cast(f.dataType).as(f.name)
          }
        }: _*)
      } else {
        require(df0.columns.length == fields.length,
          s"INSERT OVERWRITE ${v2.name()}: query writes ${df0.columns.length} " +
            s"columns, table has ${fields.length}")
        df0.toDF(fields.map(_.name): _*)
          .select(fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      }
    val scope = boundPred match {
      case None => Set.empty[String] // dynamic: batch-touched partitions only
      case Some(p) =>
        if (v2.partitionFields.isEmpty) throw new IllegalStateException(
          s"${v2.name()} lost its partition columns") // guarded at analysis
        // static mode scopes the STATEMENT's partitions — and must refuse
        // a batch whose rows fall outside them (Delta's replaceWhere
        // check): insertOverwrite replaces scope ∪ batch-touched, so an
        // out-of-scope row would silently wipe a partition the statement
        // never named. The probe is the batch's DISTINCT partition paths
        // (metadata-bounded), rendered by the table's own keygen.
        val batchPaths = aligned.select(
            graft.keygen.KeyGen.partitionPathColFor(v2.table.cfg).as("p"))
          .distinct().collect().map(_.getString(0))
        val outside = batchPaths.filterNot(raw => p.eval(v2.pathToValues(raw)) == true)
        if (outside.nonEmpty) throw new AnalysisException("USER_RAISED_EXCEPTION",
          Map("errorMessage" -> (s"INSERT OVERWRITE ${v2.name()}: query rows " +
            s"fall outside the overwrite partition scope (partitions " +
            s"${outside.sorted.mkString(", ")}) — widen the condition or use " +
            "dynamic partitionOverwriteMode")))
        v2.table.view.partitions().filter(raw => p.eval(v2.pathToValues(raw)) == true)
          .toSet
    }
    v2.table.insertOverwrite(aligned, replaceScope = scope)
    Seq.empty
  }
}
