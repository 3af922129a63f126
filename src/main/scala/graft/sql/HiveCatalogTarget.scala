package graft.sql

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.{HiveMetaStoreClient, IMetaStoreClient}
import org.apache.hadoop.hive.metastore.api.{AlreadyExistsException, Database, FieldSchema, NoSuchObjectException, Partition, SerDeInfo, StorageDescriptor, Table => HTable}

import org.apache.spark.sql.types.{StructField, StructType}

/** [[CatalogTarget]] over a REAL Hive metastore, driven through the same
  * `IMetaStoreClient` surface the reference's sync tool uses (reference
  * hudi-sync/hudi-hive-sync/.../HoodieHiveClient.java — create/alter/
  * partition calls against the metastore client; step order from
  * HiveSyncTool.java:113-357). Point it at a Thrift HMS
  * (`hive.metastore.uris`) for a shared warehouse, or run it EMBEDDED
  * (in-process HMS over a local Derby store — [[HiveCatalogTarget.embedded]])
  * for a zero-daemon durable catalog: entries survive driver restarts,
  * the durability Hive sync buys the reference.
  *
  * Published shape follows the reference's external-table convention:
  *  - `TableType.EXTERNAL_TABLE` + `EXTERNAL=TRUE` — dropping the entry
  *    never deletes table data;
  *  - storage descriptor advertises the parquet input/output/serde
  *    classes, so Hive/Trino-style engines read the base files as a
  *    plain parquet table (the reference's read-optimized contract);
  *  - identity partition columns become metastore PARTITION KEYS and
  *    every table partition registers with its typed value + location
  *    (`syncPartitions`) — engines that prune through the metastore get
  *    the real partition list, not a directory crawl;
  *  - Spark-native metadata rides in table parameters
  *    (`spark.sql.sources.provider` = graft + the full schema JSON), so a
  *    hive-catalog Spark session resolves the entry back to this engine's
  *    own relation — with the EXACT pre-publication schema (the stored
  *    JSON, not a lossy hive-type round trip) answering the sync
  *    orchestrator's drift comparison.
  */
final class HiveCatalogTarget(val client: IMetaStoreClient) extends CatalogTarget {

  private val ProviderKey = "spark.sql.sources.provider"
  private val SchemaKey = "spark.sql.sources.schema"
  private val OptionPrefix = "graft.sync.option."

  override def ensureDatabase(db: String, location: Option[String]): Unit = {
    try client.getDatabase(db)
    catch {
      case _: NoSuchObjectException =>
        val d = new Database(db, "synced by graft", location.orNull,
          new java.util.HashMap[String, String]())
        try client.createDatabase(d)
        catch { case _: AlreadyExistsException => () } // concurrent sync
    }
  }

  override def existing(db: String, table: String): Option[CatalogTarget.Entry] = {
    val t =
      try client.getTable(db, table)
      catch { case _: NoSuchObjectException => return None }
    val params: scala.collection.Map[String, String] =
      Option(t.getParameters).map(_.asScala).getOrElse(Map.empty[String, String])
    val schema = params.get(SchemaKey)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse {
        // a foreign (non-Spark-written) entry: reassemble from hive cols +
        // partition keys; catalogString is the shared dialect both ways
        val all = t.getSd.getCols.asScala ++ t.getPartitionKeys.asScala
        StructType.fromDDL(all.map(f => s"`${f.getName}` ${f.getType}").mkString(", "))
      }
    Some(CatalogTarget.Entry(params.get(ProviderKey), schema,
      Option(t.getSd.getLocation)))
  }

  private def hiveCols(fields: Seq[StructField]): java.util.List[FieldSchema] =
    fields.map(f => new FieldSchema(f.name, f.dataType.catalogString, null)).asJava

  private def storageDescriptor(dataCols: Seq[StructField],
      location: String): StorageDescriptor = {
    val serdeParams = new java.util.HashMap[String, String]()
    serdeParams.put("path", location)
    serdeParams.put("serialization.format", "1")
    val serde = new SerDeInfo("graft",
      "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe", serdeParams)
    val sd = new StorageDescriptor()
    sd.setCols(new java.util.ArrayList[FieldSchema](hiveCols(dataCols)))
    sd.setLocation(location)
    sd.setInputFormat("org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat")
    sd.setOutputFormat("org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat")
    sd.setSerdeInfo(serde)
    sd
  }

  override def createTable(db: String, table: String, schema: StructType,
      location: String, options: Map[String, String],
      partitionCols: Seq[StructField]): Unit = {
    val partNames = partitionCols.map(_.name.toLowerCase).toSet
    val dataCols = schema.fields.toSeq.filterNot(f => partNames.contains(f.name.toLowerCase))
    val t = new HTable()
    t.setDbName(db)
    t.setTableName(table)
    t.setTableType(org.apache.hadoop.hive.metastore.TableType.EXTERNAL_TABLE.toString)
    t.setSd(storageDescriptor(dataCols, location))
    t.setPartitionKeys(new java.util.ArrayList[FieldSchema](hiveCols(partitionCols)))
    // HMS mutates parameter maps in place (transient_lastDdlTime etc.) —
    // they must be MUTABLE java maps, never asJava wrappers
    val params = new java.util.HashMap[String, String]()
    params.put("EXTERNAL", "TRUE")
    params.put(ProviderKey, "graft")
    params.put(SchemaKey, schema.json)
    options.foreach { case (k, v) => params.put(OptionPrefix + k, v) }
    t.setParameters(params)
    client.createTable(t)
  }

  override def replaceTable(db: String, table: String, schema: StructType,
      location: String, options: Map[String, String],
      partitionCols: Seq[StructField]): Unit = {
    // external entry: dropping discards metadata only (HiveSyncTool's
    // recreate-on-incompatible-drift path); deleteData stays false for
    // belt and suspenders
    client.dropTable(db, table, /*deleteData=*/ false, /*ignoreUnknown=*/ true)
    createTable(db, table, schema, location, options, partitionCols)
  }

  /** The metastore's own name for a partition — Hive's escaping
    * (`Warehouse.makePartName` → `FileUtils.escapePathName`: space stays
    * `%20`-style, NOT URLEncoder's `+`), so the diff against
    * `listPartitionNames` compares like with like and a special-char
    * value never re-adds (and never aborts the batch) on re-sync.
    */
  private def partName(t: HTable, values: Seq[String]): String =
    org.apache.hadoop.hive.metastore.Warehouse.makePartName(
      t.getPartitionKeys, values.asJava)

  override def addPartitions(db: String, table: String,
      partitions: Seq[CatalogTarget.PartitionRef]): Unit = {
    if (partitions.isEmpty || partitions.forall(_.values.isEmpty)) return
    val t = client.getTable(db, table)
    if (t.getPartitionKeys.isEmpty) return // published unpartitioned
    // diff against what the metastore already holds (HoodieHiveClient
    // scans existing partitions and adds only the delta) — add_partitions
    // on a known partition would otherwise abort the batch
    val known = client.listPartitionNames(db, table, -1).asScala.toSet
    val fresh = partitions.filter(p => !known.contains(partName(t, p.values)))
    if (fresh.isEmpty) return
    val now = (System.currentTimeMillis() / 1000L).toInt
    val objs = fresh.map { p =>
      val sd = new StorageDescriptor(t.getSd)
      sd.setLocation(t.getSd.getLocation.stripSuffix("/") + "/" + p.path)
      new Partition(new java.util.ArrayList[String](p.values.asJava), db,
        table, now, now, sd, new java.util.HashMap[String, String]())
    }
    // ifNotExists: belt and suspenders under concurrent syncs — a racing
    // add must not abort the whole batch
    client.add_partitions(objs.asJava, /*ifNotExists=*/ true, /*needResults=*/ false)
  }

  /** Names per `drop_partitions_req` batch — bounds one Thrift message
    * (a TTL sweep expiring 100k calendar partitions is ~100 RPCs, not
    * 100k serial round trips).
    */
  private val DropBatchSize = 1000

  /** Drop RPCs issued by the LAST [[dropDeadPartitions]] call — test
    * observability for the batching contract (no production reads).
    */
  @volatile private[graft] var lastDropRpcs: Int = 0

  override def dropDeadPartitions(db: String, table: String,
      live: Seq[CatalogTarget.PartitionRef]): Unit = {
    lastDropRpcs = 0
    val t = client.getTable(db, table)
    if (t.getPartitionKeys.isEmpty) return
    // every live ref valueless = identity-column RESOLUTION failed (config
    // drift without a schema change), NOT an empty table — treating it as
    // everything-dead would strip all registered partitions from a table
    // that still declares partition keys (mirrors addPartitions' guard)
    if (live.nonEmpty && live.forall(_.values.isEmpty)) return
    val liveNames = live.filter(_.values.nonEmpty)
      .map(p => partName(t, p.values)).toSet
    val dead = client.listPartitionNames(db, table, -1).asScala
      .filterNot(liveNames.contains)
    if (dead.isEmpty) return
    // deleteData=false: the entry is metadata — the table's cleaner owns
    // byte reclamation (and as-of reads may still need the files).
    // Batched: one drop_partitions_req per DropBatchSize names when the
    // client exposes the raw Thrift surface (the real-HMS case); a
    // foreign IMetaStoreClient falls back to per-name drops.
    thriftIface match {
      case Some(iface) =>
        dead.grouped(DropBatchSize).foreach { chunk =>
          val req = new org.apache.hadoop.hive.metastore.api.DropPartitionsRequest(
            db, table,
            org.apache.hadoop.hive.metastore.api.RequestPartsSpec.names(
              new java.util.ArrayList[String](chunk.asJava)))
          req.setDeleteData(false)
          req.setIfExists(true) // concurrent sync may have won some names
          req.setNeedResult(false)
          iface.drop_partitions_req(req)
          lastDropRpcs += 1
        }
      case None =>
        dead.foreach { name =>
          try { client.dropPartition(db, table, name, /*deleteData=*/ false); lastDropRpcs += 1 }
          catch { case _: NoSuchObjectException => lastDropRpcs += 1 } // concurrent sync won
        }
    }
  }

  /** The raw Thrift iface behind a [[HiveMetaStoreClient]] (its `client`
    * field is package-private — reflection, cached). None for foreign
    * IMetaStoreClient implementations.
    */
  private lazy val thriftIface
      : Option[org.apache.hadoop.hive.metastore.api.ThriftHiveMetastore.Iface] =
    client match {
      case h: HiveMetaStoreClient =>
        scala.util.Try {
          val f = classOf[HiveMetaStoreClient].getDeclaredField("client")
          f.setAccessible(true)
          f.get(h).asInstanceOf[org.apache.hadoop.hive.metastore.api.ThriftHiveMetastore.Iface]
        }.toOption.filter(_ != null)
      case _ => None
    }

  override def refresh(db: String, table: String): Unit = ()
}

object HiveCatalogTarget {

  /** An embedded metastore: in-process HMS handler over a local Derby
    * store at `metastoreDir` — no daemon, zero network, durable across
    * JVMs (subsequent sessions reopen the same Derby files). One embedded
    * store per JVM: Derby is single-process and the metastore's
    * persistence layer caches its connection per JVM, so later calls with
    * a DIFFERENT dir reuse the first store (refused here rather than
    * silently cross-wired).
    */
  @volatile private var opened: Option[(String, HiveCatalogTarget)] = None

  def embedded(metastoreDir: String): HiveCatalogTarget = synchronized {
    val norm = new java.io.File(metastoreDir).getAbsolutePath
    opened match {
      case Some((dir, t)) =>
        require(dir == norm,
          s"embedded metastore already open at $dir; one Derby store per JVM")
        t
      case None =>
        new java.io.File(norm).mkdirs()
        System.setProperty("derby.system.home", norm)
        System.setProperty("derby.stream.error.file", s"$norm/derby.log")
        val conf = new HiveConf()
        conf.set("javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=$norm/metastore_db;create=true")
        conf.set("javax.jdo.option.ConnectionDriverName",
          "org.apache.derby.jdbc.EmbeddedDriver")
        conf.set("hive.metastore.warehouse.dir", s"$norm/warehouse")
        conf.set("hive.metastore.schema.verification", "false")
        conf.set("datanucleus.schema.autoCreateAll", "true")
        conf.set("hive.metastore.uris", "") // in-process handler, no Thrift
        val t = new HiveCatalogTarget(new HiveMetaStoreClient(conf))
        opened = Some((norm, t))
        t
    }
  }

  /** A remote Thrift metastore (`thrift://host:9083`) — the shared-HMS /
    * Glue-compatible deployment shape.
    */
  def thrift(uris: String): HiveCatalogTarget = {
    val conf = new HiveConf()
    conf.set("hive.metastore.uris", uris)
    new HiveCatalogTarget(new HiveMetaStoreClient(conf))
  }
}
