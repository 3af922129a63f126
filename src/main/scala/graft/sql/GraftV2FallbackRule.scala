package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

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
      Project(r.output.map(o => Alias(byName(o.name), o.name)(exprId = o.exprId)), v1)
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
      InsertIntoStatement(toV1(r, graftOf(r).get), Map.empty, Nil, a.query,
        overwrite = false, ifPartitionNotExists = false, byName = a.isByName)
    case o: OverwriteByExpression if o.table.isInstanceOf[DataSourceV2Relation] &&
        graftOf(o.table.asInstanceOf[DataSourceV2Relation]).isDefined =>
      val r = o.table.asInstanceOf[DataSourceV2Relation]
      InsertIntoStatement(toV1(r, graftOf(r).get), Map.empty, Nil, o.query,
        overwrite = true, ifPartitionNotExists = false, byName = o.isByName)
  }
}
