package graft.spark

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StructField, StructType}

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.streaming.Streaming
import graft.table.GraftTable

/** `format("graft")` integration — the analog of the reference's
  * DefaultSource (reference hudi-spark/.../DefaultSource.scala:48-172):
  *
  * Read:
  * {{{
  * spark.read.format("graft")
  *   .option("queryType", "snapshot" | "read_optimized" | "incremental")
  *   .option("asOfInstant", ts)          // time travel
  *   .option("beginInstant", ts)         // incremental range
  *   .option("endInstant", ts)
  *   .load(path)
  * }}}
  *
  * Write:
  * {{{
  * df.write.format("graft")
  *   .option("operation", "upsert" | "insert" | "bulk_insert" | "delete" |
  *                        "insert_overwrite" | "insert_overwrite_table")
  *   .option("recordKeyFields", "k1,k2")
  *   .option("partitionPathExpr", "date_format(ts,'yyyy')")
  *   .option("precombineField", "ts")
  *   .option("tableType", "COPY_ON_WRITE" | "MERGE_ON_READ")
  *   .mode(Append).save(path)
  * }}}
  *
  * Streaming sink (micro-batch upsert with replay-safe batch ids):
  * `df.writeStream.format("graft").option(...).start(path)`.
  *
  * The relation implements PrunedFilteredScan: pruning/filters re-enter
  * the underlying snapshot plan as Catalyst expressions, so parquet
  * pushdown still happens inside the wrapped plan.
  */
class GraftDataSource
    extends RelationProvider
    with SchemaRelationProvider
    with CreatableRelationProvider
    with StreamSinkProvider
    with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  // ---- streaming source: `spark.readStream.format("graft").load(path)` ----

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required"))
    val table = GraftTable.load(sqlContext.sparkSession, path)
    val s = schema.orElse(table.latestSchema).getOrElse(
      throw new IllegalArgumentException(
        s"table at $path has no commits yet — cannot infer stream schema"))
    // change-feed rows are meta-free data columns + the change kind
    val out =
      if (parameters.getOrElse("readChangeFeed", "false") == "true")
        StructType(s.fields.filterNot(f =>
            graft.core.MetaCols.All.contains(f.name)) :+
          StructField(Readers.ChangeTypeCol,
            org.apache.spark.sql.types.StringType, nullable = true))
      else s
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val path = parameters("path")
    val table = GraftTable.load(sqlContext.sparkSession, path)
    val s = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new graft.streaming.GraftStreamSource(sqlContext.sparkSession, table, s,
      maxCommitsPerTrigger =
        parameters.get("maxCommitsPerTrigger").map(_.toInt).getOrElse(Int.MaxValue),
      changeFeed = parameters.getOrElse("readChangeFeed", "false") == "true",
      maxBytesPerTrigger =
        parameters.get("maxBytesPerTrigger").map(_.toLong).getOrElse(Long.MaxValue))
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    createRelation(sqlContext, parameters, null)

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required"))
    val spark = sqlContext.sparkSession
    val table = GraftTable.load(spark, path)
    def mkDf(): DataFrame = parameters.getOrElse("queryType", "snapshot") match {
      case "snapshot" =>
        Readers.snapshot(table, asOf = parameters.get("asOfInstant"))
      case "read_optimized" =>
        Readers.readOptimized(table, asOf = parameters.get("asOfInstant"))
      case "incremental" =>
        Readers.incremental(table,
          parameters.getOrElse("beginInstant", "0"),
          parameters.get("endInstant"),
          partitionGlob = parameters.get("incrPathGlob"),
          fallbackFullScan =
            parameters.getOrElse("incrFallbackFullScan", "false") == "true")
      case "incremental_cdc" =>
        Readers.incrementalChanges(table,
          parameters.getOrElse("beginInstant", "0"),
          parameters.get("endInstant"))
      case other => throw new IllegalArgumentException(s"unknown queryType '$other'")
    }
    val df = mkDf()
    // a meta-column-free frame is what SQL views want: `INSERT *` in MERGE
    // expands over the target schema and must not demand meta columns.
    // Catalog tables pass their stored (meta-free) schema back in — honor it.
    def visible(frame: DataFrame): DataFrame =
      if (schema != null) frame.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      else if (parameters.getOrElse("includeMetaColumns", "true") == "false")
        frame.drop(graft.core.MetaCols.All: _*)
      else frame
    GraftRelation(sqlContext, visible(df).schema, () => visible(mkDf()), table,
      latestSnapshot = parameters.getOrElse("queryType", "snapshot") == "snapshot" &&
        !parameters.contains("asOfInstant"))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], df: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required"))
    val spark = sqlContext.sparkSession
    val table = loadOrCreate(spark, path, parameters)
    val op = parameters.getOrElse("operation",
      if (mode == SaveMode.Overwrite) "insert_overwrite_table"
      // keyless tables (uuid record keys) are append-only — upsert can
      // never match, so the natural default is insert
      else if (table.cfg.recordKeyFields.isEmpty) "insert"
      else "upsert")
    // user metadata rides in the commit, atomic with the data (reference
    // hoodie.datasource.write.commitmeta.key.prefix — DataSourceWriteOptions):
    // options prefixed `commitMeta.` land in extraMetadata under their
    // unprefixed key. Spark's option map is case-insensitive (keys arrive
    // lowercased), so metadata keys are lowercase by construction.
    val extraMeta: Map[String, String] = parameters.collect {
      case (k, v) if k.toLowerCase.startsWith("commitmeta.") =>
        k.substring("commitmeta.".length) -> v
    }
    op match {
      case "upsert" => table.upsert(df, extraMetadata = extraMeta)
      case "insert" => table.insert(df)
      case "bulk_insert" => table.bulkInsert(df)
      case "delete" => table.delete(df)
      case "insert_overwrite" => table.insertOverwrite(df, extraMetadata = extraMeta)
      case "insert_overwrite_table" => table.insertOverwriteTable(df)
      case other => throw new IllegalArgumentException(s"unknown operation '$other'")
    }
    // end-of-commit catalog sync, the reference's hive_sync.enable
    // convention (reference hudi-spark/.../HoodieSparkSqlWriter.scala
    // metaSync after commit): `option("catalogSyncDb", db)` publishes or
    // refreshes the db.table entry for this table — in the session
    // catalog by default, or a REAL Hive metastore when
    // `catalogSyncMetastore` names one (`embedded:<dir>` for the
    // in-process Derby HMS, `thrift://host:port` for a remote one — the
    // reference's hive_sync.metastore.uris)
    parameters.get("catalogSyncDb").foreach { db =>
      val target = parameters.get("catalogSyncMetastore").map {
        case uri if uri.startsWith("thrift://") => graft.sql.HiveCatalogTarget.thrift(uri)
        case dir => graft.sql.HiveCatalogTarget.embedded(dir.stripPrefix("embedded:"))
      }.orNull
      graft.sql.CatalogSync.sync(spark, path, db,
        parameters.getOrElse("catalogSyncTable", table.cfg.tableName),
        target = target)
    }
    // the relation a CTAS hands to the catalog defines the table's SQL
    // schema: keep it meta-free so INSERT INTO arity matches user columns
    def snap() = Readers.snapshot(table).drop(graft.core.MetaCols.All: _*)
    GraftRelation(sqlContext, snap().schema, () => snap(), table, latestSnapshot = true)
  }

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required"))
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // streaming hands us a streaming-tagged frame; re-root it as a
        // batch plan over the SAME distributed rows (no driver collect —
        // a large micro-batch must not OOM the driver)
        val spark = sqlContext.sparkSession
        val batch = org.apache.spark.sql.GraftSqlBridge.rebatch(data)
        val table = loadOrCreate(spark, path, parameters)
        // operation=cdc_apply consumes a change feed (deletes applied);
        // default sink behavior is the plain micro-batch upsert
        if (parameters.getOrElse("operation", "upsert") == "cdc_apply")
          Streaming.writeChangeBatch(table, batch, batchId)
        else Streaming.writeBatch(table, batch, batchId)
      }
      override def toString: String = s"GraftSink[$path]"
    }
  }

  private def loadOrCreate(spark: org.apache.spark.sql.SparkSession, path0: String,
      parameters: Map[String, String]): GraftTable = {
    val path = GraftTable.normalize(path0)
    if (TableConfig.exists(new org.apache.hadoop.fs.Path(path))) GraftTable.load(spark, path)
    else {
      // no recordKeyFields ⇒ KEYLESS table: uuid record keys (reference
      // UuidKeyGenerator — SQL tables without a primary key), append-only
      val keys = parameters.get("recordKeyFields")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
      GraftTable.create(spark, path, TableConfig(
        tableName = parameters.getOrElse("tableName", new java.io.File(path).getName),
        tableType = parameters.getOrElse("tableType", TableType.CopyOnWrite),
        recordKeyFields = keys,
        partitionPathExpr = parameters.getOrElse("partitionPathExpr", ""),
        precombineField = parameters.getOrElse("precombineField", ""),
        // every graft.* option becomes a persisted table property, so the
        // payload class, index type, file sizing, policies etc. are all
        // settable from the DataFrame/SQL surface (the reference reads its
        // hoodie.* write options the same way)
        props = parameters.filter { case (k, _) => k.startsWith("graft.") }))
    }
  }
}

/** Read relation: the frame is rebuilt per scan (`mkDf`), so catalog- or
  * view-cached relations always see the table's current snapshot — no
  * stale file lists after writes. Pruning + filter pushdown re-enter the
  * rebuilt plan; InsertableRelation routes catalog `INSERT INTO
  * [OVERWRITE]` to the engine's insert / insert_overwrite_table ops.
  */
final case class GraftRelation(sqlContext: SQLContext, schema: StructType,
    mkDf: () => DataFrame, table: GraftTable,
    // true only for latest-snapshot reads (no asOfInstant / incremental
    // options): the shapes MvRewriteRule may answer from a materialized
    // view — a time-travel or change scan must never be view-substituted
    latestSnapshot: Boolean = false)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** Live table bytes (base + delta), not BaseRelation's default
    * `spark.sql.defaultSizeInBytes` (≈ Long.MaxValue): without this a
    * small graft dim in a SQL join is never auto-broadcast and every
    * star join over catalog/temp-view names degrades to a sort-merge
    * shuffle of the fact. Live bytes are only an upper bound for the
    * LATEST snapshot: after deletes / insert-overwrites / restores shrink
    * the live set, an as-of or change-window scan reads not-yet-cleaned
    * OLD file versions that can far exceed it, and auto-broadcasting a
    * large historical scan would OOM the driver — so non-snapshot shapes
    * keep the conservative default (suppressing broadcast is always safe).
    */
  override def sizeInBytes: Long = {
    if (!latestSnapshot)
      return sqlContext.sparkSession.sessionState.conf.defaultSizeInBytes
    val slices = table.view.fileSlices(None)
    val total = slices.flatMap(_.baseFile).map(_.sizeBytes).sum +
      slices.map(_.totalDeltaBytes).sum
    // an empty table would otherwise report 0 and broadcast unconditionally
    // even after a first large write in the same plan; keep a tiny floor
    math.max(total, 1L)
  }

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    // catalog INSERT resolves by position: restore the table's data
    // column names before handing off
    val dataCols = schema.fieldNames
      .filterNot(graft.core.MetaCols.All.contains).toIndexedSeq
    val renamed = data.toDF(dataCols.take(data.columns.length): _*)
    if (overwrite) table.insertOverwriteTable(renamed) else table.insert(renamed)
  }

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.foldLeft(mkDf())((d, f) => translate(f).map(d.filter).getOrElse(d))
    val pruned =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    pruned.rdd
  }

  // minimal source-Filter → Column translation; unsupported filters are
  // simply left for Spark to re-apply above the scan
  private def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case And(l, r) => for (a <- translate(l); b <- translate(r)) yield a && b
    case Or(l, r) => for (a <- translate(l); b <- translate(r)) yield a || b
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
