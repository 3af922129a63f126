package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{ConfigKeys, Storage, TableConfig, TableType}
import graft.table.GraftTable

/** DSv2 `TableCatalog` for graft tables — the Delta/Iceberg catalog UX
  * (`CREATE TABLE cat.db.t (...) USING graft PARTITIONED BY (...)`,
  * ALTER/DROP/RENAME/SHOW TABLES) over path-addressed graft tables.
  * Register with `spark.sql.catalog.<name> = graft.sql.GraftCatalog`
  * (+ optional `spark.sql.catalog.<name>.warehouse = <dir>`).
  *
  * Layout: one directory level per namespace segment under the warehouse
  * (namespaces nest: `CREATE NAMESPACE a.b` ⇒ `<warehouse>/a/b`); a
  * MANAGED table is the graft table directory `<warehouse>/<ns…>/<t>`
  * itself, an EXTERNAL table (explicit LOCATION) is a pointer file
  * `<warehouse>/<ns…>/<t>.ptr` holding the base path — dropping it never
  * touches data, mirroring the external-table convention of the
  * reference's Hive sync (HiveSyncTool.java:113-357). There is no second
  * metadata store: existence IS the filesystem state, so the catalog
  * needs no sync step of its own.
  *
  * DDL arrives through Spark's v2 exec nodes (non-session catalogs always
  * route v2); SCANS resolve as [[GraftV2Table]] and are swapped to the
  * engine's v1 relation by [[GraftV2FallbackRule]] during analysis, so
  * reads/writes/MERGE run the exact same plan as `format("graft")` — no
  * second read path to keep correct.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val spark = SparkSession.active
    val root = Option(options.get("warehouse")).getOrElse(
      spark.sessionState.conf.warehousePath.stripSuffix("/") + s"/$name")
    warehouse = new Path(GraftTable.normalize(root))
    Storage.mkdirs(warehouse)
  }

  override def name(): String = catalogName

  // ------------------------------------------------------------ namespaces
  // Namespaces are NESTED (`a.b.c`), one warehouse directory level per
  // segment — the Delta/Iceberg multi-level catalog UX. A directory is a
  // namespace iff it is not a graft table (table dirs carry the table
  // config at their root; their partition subdirs are never visited).

  private def nsPath(ns: Array[String]): Path = {
    require(ns.nonEmpty, "graft catalog namespaces have at least one level")
    ns.foreach(s => require(s.nonEmpty && !s.contains("/") && s != ".." && s != ".",
      s"illegal namespace segment '$s' in ${ns.mkString(".")}"))
    new Path(warehouse.toString + ns.mkString("/", "/", ""))
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.nonEmpty && Storage.exists(nsPath(ns)) && !TableConfig.exists(nsPath(ns))

  private def childNamespaces(dir: Path): Array[String] =
    Storage.list(dir)
      .filter(s => s.isDirectory && !TableConfig.exists(s.getPath))
      .map(_.getPath.getName).toArray

  override def listNamespaces(): Array[Array[String]] =
    childNamespaces(warehouse).map(Array(_))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (namespaceExists(ns)) childNamespaces(nsPath(ns)).map(ns :+ _)
    else throw new NoSuchNamespaceException(ns)

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] =
    if (namespaceExists(ns)) Map("location" -> nsPath(ns).toString).asJava
    else throw new NoSuchNamespaceException(ns)

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(ns)) throw new NamespaceAlreadyExistsException(ns)
    Storage.mkdirs(nsPath(ns))
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces hold no mutable metadata")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    if (!cascade && (listTables(ns).nonEmpty || listNamespaces(ns).nonEmpty))
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    Storage.deleteRecursively(nsPath(ns))
    true
  }

  // ------------------------------------------------------------ tables

  private val PtrExt = ".ptr"

  private def managedDir(ident: Identifier): Path =
    nsPath(ident.namespace).suffix("/" + ident.name)
  private def ptrFile(ident: Identifier): Path =
    nsPath(ident.namespace).suffix("/" + ident.name + PtrExt)

  /** Base path of an existing entry: the managed dir when it holds a
    * graft table, else the pointer target. Probes with a namespace shape
    * this catalog can't hold (catalog APIs probe liberally during name
    * resolution) answer "absent" instead of throwing.
    */
  private def basePathOf(ident: Identifier): Option[Path] = {
    if (ident.namespace.isEmpty) return None
    val dir = managedDir(ident)
    if (TableConfig.exists(dir)) Some(dir)
    else if (Storage.exists(ptrFile(ident)))
      Some(new Path(GraftTable.normalize(Storage.readString(ptrFile(ident)).trim)))
    else None
  }

  override def tableExists(ident: Identifier): Boolean = basePathOf(ident).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Storage.list(nsPath(namespace)).flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && TableConfig.exists(st.getPath))
        Some(Identifier.of(namespace, n))
      else if (st.isFile && n.endsWith(PtrExt))
        Some(Identifier.of(namespace, n.stripSuffix(PtrExt)))
      else None
    }.toArray
  }

  override def loadTable(ident: Identifier): Table = basePathOf(ident) match {
    case Some(p) => GraftV2Table(SparkSession.active, ident, p.toString)
    case None =>
      // MOR view names, the reference's Hive-sync convention
      // (HiveSyncTool registers `<t>_ro` read-optimized and `<t>_rt`
      // real-time): resolve dynamically against the base table
      val n = ident.name
      val suffix = Seq("_ro", "_rt").find(n.endsWith)
        .getOrElse(throw new NoSuchTableException(ident))
      val base = Identifier.of(ident.namespace, n.stripSuffix(suffix))
      basePathOf(base) match {
        case Some(p) =>
          val t = GraftV2Table(SparkSession.active, ident, p.toString,
            readOptions =
              if (suffix == "_ro") Map("queryType" -> "read_optimized")
              else Map.empty)
          if (!t.table.cfg.isMor) throw new NoSuchTableException(ident)
          t
        case None => throw new NoSuchTableException(ident)
      }
  }

  /** SQL `VERSION AS OF '<instant>'` over a catalog name. */
  override def loadTable(ident: Identifier, version: String): Table =
    basePathOf(ident) match {
      case Some(p) => GraftV2Table(SparkSession.active, ident, p.toString,
        readOptions = Map("asOfInstant" -> version))
      case None => throw new NoSuchTableException(ident)
    }

  /** SQL `TIMESTAMP AS OF <ts>` over a catalog name (micros since epoch,
    * per the TableCatalog contract) — instants are UTC-stamped, so the
    * formatted wall time IS the as-of bound in instant order.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val inst = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(timestamp / 1000L))
    loadTable(ident, inst)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace)) createNamespace(ident.namespace, Map.empty.asJava)
    val props = properties.asScala.toMap
    props.get(TableCatalog.PROP_PROVIDER).foreach(p =>
      require(p.equalsIgnoreCase("graft"), s"graft catalog only creates graft tables, got USING $p"))
    val schema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    // PARTITIONED BY (a[, b]) — identity transforms only; multi-column
    // partitioning compiles to the documented multi-level '/' expression
    val partCols = partitions.map { t =>
      require(t.name == "identity" && t.references.length == 1,
        s"graft tables partition by column identity, got transform $t")
      t.references.head.fieldNames.mkString(".")
    }
    val partExpr = partCols.toSeq match {
      case Seq() => ""
      case Seq(one) => one
      case many => many.map(c => s"cast(`$c` as string)")
        .mkString("concat_ws('/', ", ", ", ")")
    }
    // option('k','v') and TBLPROPERTIES('k'='v') both configure the table;
    // OPTIONS arrive under TableCatalog.OPTION_PREFIX
    def opt(k: String): Option[String] =
      props.get(TableCatalog.OPTION_PREFIX + k).orElse(props.get(k))
    val location = props.get(TableCatalog.PROP_LOCATION)
    val base = location.map(l => new Path(GraftTable.normalize(l)))
      .getOrElse(managedDir(ident))
    if (!TableConfig.exists(base)) // an external graft table is ADOPTED as-is
      GraftTable.create(SparkSession.active, base.toString, TableConfig(
        tableName = ident.name,
        tableType = opt("tableType").getOrElse(TableType.CopyOnWrite),
        recordKeyFields = opt("recordKeyFields")
          .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
        partitionPathExpr = partExpr,
        precombineField = opt("precombineField").getOrElse(""),
        props = props.filter { case (k, _) => k.startsWith("graft.") } +
          // the declared schema answers reads/DESCRIBE before first write
          (ConfigKeys.CreateSchema -> schema.json)))
    if (location.isDefined && base != managedDir(ident))
      Storage.writeString(ptrFile(ident), base.toString)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val base = basePathOf(ident).getOrElse(throw new NoSuchTableException(ident))
    val t = GraftTable.load(SparkSession.active, base.toString)
    changes.foreach {
      // multi-part fieldNames are nested paths (`meta.flags`): the dotted
      // form routes through the engine's nested DDL, which shares the
      // write path's SchemaEvolution.mergeEvolvedType contract
      case a: TableChange.AddColumn =>
        t.addColumns(Seq(org.apache.spark.sql.types.StructField(
          a.fieldNames.mkString("."), a.dataType, a.isNullable)))
      case u: TableChange.UpdateColumnType =>
        t.changeColumn(u.fieldNames.mkString("."), u.newDataType)
      case d: TableChange.DeleteColumn =>
        t.dropColumn(d.fieldNames.mkString("."))
      case r: TableChange.RenameColumn =>
        // pinned refusal: renaming cannot be a schema-only commit (data
        // files address the old name) — declare the new field, backfill,
        // then drop the old one
        throw new UnsupportedOperationException(
          s"graft tables do not rename columns (${r.fieldNames.mkString(".")} " +
            s"-> ${r.newName}): a rename requires a data rewrite — " +
            "ADD the new column, backfill, then DROP the old one")
      case s: TableChange.SetProperty =>
        val cur = TableConfig.load(base)
        TableConfig.save(base, cur.copy(props = cur.props + (s.property -> s.value)))
      case r: TableChange.RemoveProperty =>
        val cur = TableConfig.load(base)
        TableConfig.save(base, cur.copy(props = cur.props - r.property))
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER for graft tables: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = basePathOf(ident) match {
    case None => false
    case Some(base) =>
      if (Storage.exists(ptrFile(ident)))
        Storage.deleteIfExists(ptrFile(ident)) // external: data untouched
      else Storage.deleteRecursively(base) // managed: drop removes data
      true
  }

  override def renameTable(from0: Identifier, to0: Identifier): Unit = {
    // `RENAME TO cat.db.t` keeps the catalog name in the identifier —
    // strip our own name so both spellings work
    def strip(i: Identifier): Identifier =
      if (i.namespace.length >= 2 && i.namespace.head == catalogName)
        Identifier.of(i.namespace.tail, i.name)
      else i
    val from = strip(from0)
    val to = strip(to0)
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    require(from.namespace.sameElements(to.namespace),
      "rename across namespaces is not supported")
    if (Storage.exists(ptrFile(from)))
      Storage.rename(ptrFile(from), ptrFile(to))
    else {
      // metadata-scale admin op; on an object store the directory rename
      // is a copy — external tables (pointer rename) avoid it
      Storage.rename(managedDir(from), managedDir(to))
      val cur = TableConfig.load(managedDir(to))
      TableConfig.save(managedDir(to), cur.copy(tableName = to.name))
    }
  }
}

/** The catalog's table handle. BATCH scans over it never execute as DSv2:
  * [[GraftV2FallbackRule]] replaces its `DataSourceV2Relation` with the
  * engine's v1 relation during analysis (same plan as `format("graft")`),
  * so `capabilities` is deliberately empty — if the swap ever fails to
  * fire, analysis fails loudly instead of reading wrong. STREAMING reads
  * (`spark.readStream.table("cat.db.t")`) take Spark's own
  * [[V2TableWithV1Fallback]] hook: the synthesized v1 CatalogTable
  * (provider=graft, path option) resolves to the engine's commit-offset
  * stream source, the same one `readStream.format("graft")` builds.
  */
final case class GraftV2Table(spark: SparkSession, ident: Identifier,
    basePath: String,
    // extra v1 read options: queryType (read_optimized for `_ro` names),
    // asOfInstant (SQL VERSION/TIMESTAMP AS OF over catalog names)
    readOptions: Map[String, String] = Map.empty)
    extends V1FallbackBridge with Table with TruncatableTable
    with SupportsPartitionManagement {

  lazy val table: GraftTable = GraftTable.load(spark, basePath)

  override def name(): String = ident.toString

  /** Meta-free data schema: committed schema once data exists, the
    * declared CREATE schema before the first write.
    */
  override def schema(): StructType =
    table.latestSchema
      .map(s => StructType(s.fields.filterNot(f => graft.core.MetaCols.All.contains(f.name))))
      .orElse(table.cfg.props.get(ConfigKeys.CreateSchema)
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType]))
      .getOrElse(new StructType())

  override def partitioning(): Array[Transform] =
    // identity columns (single or multi-level) surface as v2 transforms —
    // static `PARTITION (p1='a', p2='b')` resolution needs them declared;
    // true expression partitioning has no v2 transform form
    partitionFields.map(f =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(f.name)).toArray

  override def properties(): util.Map[String, String] =
    (table.cfg.props ++ Map(
      TableCatalog.PROP_PROVIDER -> "graft",
      TableCatalog.PROP_LOCATION -> basePath,
      "recordKeyFields" -> table.cfg.recordKeyFields.mkString(","),
      "partitionPathExpr" -> table.cfg.partitionPathExpr,
      "precombineField" -> table.cfg.precombineField,
      "tableType" -> table.cfg.tableType)).asJava

  override def capabilities(): util.Set[TableCapability] =
    // deliberately empty by DEFAULT (see class doc). Under the opt-in
    // `graft.sql.insert.schema.evolution` conf (session or table prop),
    // ACCEPT_ANY_SCHEMA makes the analyzer SKIP strict v2 output
    // resolution (the Delta schema-evolution mechanism), so a drifted
    // INSERT survives to [[GraftV2FallbackRule]], which routes additive
    // struct drift to the engine's merge and everything else back through
    // the v1 ANSI insert path.
    if (spark.sessionState.conf
        .getConfString("graft.sql.insert.schema.evolution", "false").toBoolean ||
        table.cfg.prop("graft.sql.insert.schema.evolution", "false").toBoolean)
      util.EnumSet.of(TableCapability.ACCEPT_ANY_SCHEMA)
    else util.Collections.emptySet()

  /** `TRUNCATE TABLE cat.db.t` — one replacecommit through the engine's
    * truncate (time-travel/incremental history preserved, like every
    * other write op).
    */
  override def truncateTable(): Boolean = {
    table.truncate()
    true
  }

  // ------------------------------------- SupportsPartitionManagement
  // Partition admin over catalog names (`ALTER TABLE ... DROP PARTITION
  // (col='v')`, native SHOW PARTITIONS). Graft partitions are IMPLICIT —
  // they materialize when data lands and disappear (logically, via
  // replacecommit) when dropped — so only the listing/drop half of the
  // contract is meaningful; ADD/metadata mutations refuse loudly, the
  // reference's Hive-sync convention (partitions sync FROM the table,
  // never INTO it). Identity single-column partitioning only: expression
  // partitioning has no v2 row form (partitionSchema is empty → Spark's
  // spec resolution fails cleanly).

  /** The table's identity partition COLUMNS, in layout order: a bare
    * column expression, or the exact multi-level form [[GraftCatalog]]
    * compiles `PARTITIONED BY (a, b)` into
    * (`concat_ws('/', cast(`a` as string), ...)`). Empty for true
    * expression partitioning — which has no v2 row form.
    */
  private[sql] def partitionFields: Seq[org.apache.spark.sql.types.StructField] = {
    val names = graft.keygen.KeyGen.identityPartitionCols(table.cfg.partitionPathExpr)
    val fields = names.flatMap(n => schema().fields.find(_.name.equalsIgnoreCase(n)))
    if (fields.size == names.size) fields else Seq.empty
  }

  private[sql] def partitionField: Option[org.apache.spark.sql.types.StructField] =
    partitionFields match {
      case Seq(one) => Some(one)
      case _ => None
    }

  override def partitionSchema(): StructType =
    StructType(partitionFields)

  /** Stored partition-path string → typed identifier row over
    * [[partitionFields]]: one directory level per column (the multi-level
    * layout contract), hive-style prefix stripped on the single-column
    * form.
    */
  private[sql] def pathToValues(raw: String): InternalRow = {
    val fs = partitionFields
    if (fs.isEmpty) InternalRow.empty
    else if (fs.size == 1) InternalRow(pathToValue(raw, fs.head))
    else {
      val hiveLevels = graft.keygen.KeyGen.hiveStyleLevelNames(table.cfg).isDefined
      val parts = raw.split("/", fs.size)
      InternalRow.fromSeq(fs.zipWithIndex.map { case (f, i) =>
        val s0 = if (i < parts.length) parts(i) else ""
        val s = if (hiveLevels && s0.startsWith(f.name + "="))
          s0.stripPrefix(f.name + "=") else s0
        org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(s),
            org.apache.spark.sql.types.StringType),
          f.dataType, Some("UTC")).eval(null)
      })
    }
  }

  /** Stored partition-path string → typed identifier value (hive-style
    * `name=` prefix stripped when the table writes it).
    */
  private[sql] def pathToValue(raw: String,
      f: org.apache.spark.sql.types.StructField): Any = {
    val hive = graft.keygen.KeyGen.hiveStyleNameOf(table.cfg)
    val s = hive match {
      case Some(n) if raw.startsWith(n + "=") => raw.stripPrefix(n + "=")
      case _ => raw
    }
    org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType),
      f.dataType, Some("UTC")).eval(null)
  }

  /** Typed identifier row (over [[partitionFields]]) → the partition-path
    * string the table layout uses (the exact keygen rendering: string
    * casts joined by '/', hive-style prefix on the single-column form).
    */
  private def valuesToPath(ident: InternalRow): String = {
    val fs = partitionFields
    def render(i: Int): String = {
      val f = fs(i)
      val s = org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          ident.get(i, f.dataType), f.dataType),
        org.apache.spark.sql.types.StringType, Some("UTC")).eval(null)
      if (s == null) "" else s.toString
    }
    graft.keygen.KeyGen.hiveStyleLevelNames(table.cfg) match {
      case Some(names) =>
        fs.indices.map(i => s"${names(i)}=${render(i)}").mkString("/")
      case None =>
        val raw = fs.indices.map(render).mkString("/")
        graft.keygen.KeyGen.hiveStyleNameOf(table.cfg) match {
          case Some(n) if fs.size == 1 => s"$n=$raw"
          case _ => raw
        }
    }
  }

  override def listPartitionIdentifiers(names: Array[String],
      ident: InternalRow): Array[InternalRow] = {
    val fs = partitionFields
    if (fs.isEmpty) return Array.empty
    val idx = names.map { n =>
      val i = fs.indexWhere(_.name.equalsIgnoreCase(n))
      require(i >= 0, s"unknown partition column $n")
      i
    }
    val all = table.view.partitions().map(pathToValues)
    all.filter(r => idx.indices.forall(j =>
      r.get(idx(j), fs(idx(j)).dataType) == ident.get(j, fs(idx(j)).dataType)))
      .toArray
  }

  /** `ALTER TABLE ... DROP PARTITION` — the engine's delete_partition
    * replacecommit; history stays time-travelable like every other write.
    */
  override def dropPartition(ident: InternalRow): Boolean = {
    if (partitionFields.isEmpty) throw new UnsupportedOperationException(
      "expression-partitioned graft tables manage partitions by predicate " +
        "(deletePartitions / DELETE WHERE), not by v2 partition idents")
    val path = valuesToPath(ident)
    if (!table.view.partitions().contains(path)) return false
    table.deletePartitions(Seq(path))
    true
  }

  override def createPartition(ident: InternalRow,
      properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft partitions materialize when data is written; ADD PARTITION is not a graft operation")

  override def replacePartitionMetadata(ident: InternalRow,
      properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft partitions hold no mutable metadata")

  override def loadPartitionMetadata(ident: InternalRow): util.Map[String, String] = {
    val fs = partitionFields
    if (fs.isEmpty)
      throw new UnsupportedOperationException("table is not identity-partitioned")
    if (listPartitionIdentifiers(fs.map(_.name).toArray, ident).isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchPartitionException(
        name(), ident, partitionSchema())
    util.Collections.emptyMap() // partitions hold no metadata of their own
  }

  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    CatalogTable(
      identifier = org.apache.spark.sql.catalyst.TableIdentifier(
        ident.name, ident.namespace.headOption),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new java.net.URI(basePath)),
        properties = Map("path" -> basePath)),
      schema = schema(),
      provider = Some("graft"))
  }
}
