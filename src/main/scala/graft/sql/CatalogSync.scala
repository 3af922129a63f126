package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.types.StructType

import graft.core.{Storage, TableConfig}
import graft.table.GraftTable

/** One catalog-metastore registration step, as seen by the sync
  * orchestrator. The call sequence mirrors the reference's Hive sync
  * (reference hudi-sync/hudi-hive-sync/.../HiveSyncTool.java:113-357):
  * ensure database → create table / schema-drift alter → partition add →
  * refresh. [[SessionCatalogTarget]] implements it against the Spark
  * session catalog (in-memory or hive-backed); a Thrift HMS / Glue
  * implementation is a drop-in for mixed-engine shops — it only needs
  * these six operations (the reference's `HoodieHiveClient` surface),
  * none of which assume a live SparkSession on the metastore side.
  */
trait CatalogTarget {
  def ensureDatabase(db: String, location: Option[String]): Unit
  /** The existing entry under the name, if any — its STORED metadata,
    * never a resolved relation (resolving masks schema drift).
    */
  def existing(db: String, table: String): Option[CatalogTarget.Entry]
  /** `partitionCols` names the schema fields the table partitions by
    * (identity partitioning only — expression partitioning publishes an
    * unpartitioned entry); a metastore target declares them as partition
    * keys, the session catalog lets the graft source partition internally.
    */
  def createTable(db: String, table: String, schema: StructType,
      location: String, options: Map[String, String],
      partitionCols: Seq[org.apache.spark.sql.types.StructField]): Unit
  /** Re-publish the entry after schema or location drift (the reference's
    * `syncSchema` alter-table path).
    */
  def replaceTable(db: String, table: String, schema: StructType,
      location: String, options: Map[String, String],
      partitionCols: Seq[org.apache.spark.sql.types.StructField]): Unit
  /** Register partitions (the reference's `syncPartitions`). Targets
    * whose query engines prune through their own listing (the session
    * catalog: pruning runs inside GraftFileIndex) may no-op; a metastore
    * serving OTHER engines must record them. Receives the table's current
    * partition list (relative path + parsed identifier values) — an
    * implementation tracking a last-synced watermark may diff against it.
    */
  def addPartitions(db: String, table: String,
      partitions: Seq[CatalogTarget.PartitionRef]): Unit
  /** Reconcile REMOVALS: drop registered partitions that are no longer in
    * `live` (the table's full current partition list — the same list
    * [[addPartitions]] received). Without this, `delete_partition` /
    * partition-TTL leaves a foreign engine listing (and reading, until
    * clean reclaims the files) a logically-dead partition. Metadata-only
    * — a target must never delete data. Default no-op for targets that
    * don't hold a partition list. (The 0.9 reference's HiveSyncTool adds
    * only; the drop direction is this engine's extension.)
    */
  def dropDeadPartitions(db: String, table: String,
      live: Seq[CatalogTarget.PartitionRef]): Unit = ()
  /** Invalidate any cached relation/file-list for the entry. */
  def refresh(db: String, table: String): Unit
}

object CatalogTarget {
  /** Stored metadata of an existing catalog entry. */
  final case class Entry(provider: Option[String], schema: StructType,
      location: Option[String])
  /** One table partition as the sync sees it: the storage-relative path
    * and the partition-key values parsed from it (hive-style `k=` prefixes
    * stripped, one value per declared partition column; empty when the
    * table publishes unpartitioned).
    */
  final case class PartitionRef(path: String, values: Seq[String])
}

/** Catalog registration for graft tables — the in-engine analog of the
  * reference's Hive sync (reference hudi-sync/hudi-hive-sync/.../
  * HiveSyncTool.java:113-357): after a write, publish/refresh the table
  * in the session catalog so SQL addresses it as `db.table` instead of a
  * path or a manually registered temp view.
  *
  * Where the reference talks the Thrift metastore protocol from a
  * sidecar tool, here registration is a catalog-API concern and the
  * metastore choice is the session's: with the default in-memory catalog
  * the registration lives for the JVM; with
  * `spark.sql.catalogImplementation=hive` (embedded Derby or a remote
  * metastore) it persists across driver restarts — the same durability
  * Hive sync buys the reference, minus the extra daemon. Tables register
  * as EXTERNAL (`LOCATION` = table base path), so dropping the catalog
  * entry never deletes data, matching `HiveSyncTool`'s external-table
  * convention.
  *
  * Wiring: the write path runs sync at end-of-commit when the write
  * carries `option("catalogSyncDb", db)` (the reference's
  * `hoodie.datasource.hive_sync.enable` convention —
  * HoodieSparkSqlWriter runs HiveSyncTool after a successful commit);
  * `sync`/`syncAll` are also direct entry points for restore-on-startup.
  *
  * Schema sync: the catalog's STORED schema (not a live relation —
  * resolving one would re-apply the stored column list and mask drops)
  * is compared against the current meta-free snapshot schema. On drift
  * the entry is dropped and re-created (the reference's `syncSchema`
  * alter-table path); on no-change re-sync only the relation cache is
  * refreshed.
  *
  * Safety: an existing same-name entry is only ever dropped when it is
  * a graft entry. A non-graft table under the target name makes sync
  * refuse (dropping it could delete managed data); a graft entry
  * pointing at a different location is re-pointed at `path`.
  */
object CatalogSync {

  /** Register (or refresh) the graft table at `path` as `db.table` on the
    * given [[CatalogTarget]] (the session catalog by default). Idempotent;
    * replaces the entry when the table's schema or location changed since
    * the last sync. The step sequence is HiveSyncTool's:
    * database → create-or-alter → partitions → refresh.
    *
    * @param dbLocation optional explicit database location (defaults to
    *   `spark.sql.warehouse.dir`); only used when the database is first
    *   created. The database directory holds no table data — tables are
    *   external at their own base paths.
    */
  def sync(spark: SparkSession, path: String, db: String, table: String,
      dbLocation: Option[String] = None,
      target: CatalogTarget = null): Unit = {
    val tgt = Option(target).getOrElse(new SessionCatalogTarget(spark))
    val norm = GraftTable.normalize(path)
    require(TableConfig.exists(new org.apache.hadoop.fs.Path(norm)), s"no graft table at $norm")
    val t = GraftTable.load(spark, norm)
    val current = graft.read.Readers.snapshot(t)
      .drop(graft.core.MetaCols.All: _*).schema
    tgt.ensureDatabase(db, dbLocation)
    // identity partition column(s) — single bare column or the compiled
    // multi-level concat_ws('/') form — become declared metastore
    // partition keys; true expression partitioning publishes
    // unpartitioned (the engine prunes through its own file index either
    // way — keys matter to OTHER engines reading the metastore,
    // HiveSyncTool's audience)
    val names = graft.keygen.KeyGen.identityPartitionCols(t.cfg.partitionPathExpr)
    val resolved = names.flatMap(n => current.fields.find(_.name.equalsIgnoreCase(n)))
    val partCols = if (resolved.size == names.size) resolved else Seq.empty
    val hivePrefix = graft.keygen.KeyGen.hiveStyleNameOf(t.cfg).map(_ + "=")
    // metadata-only partition listing (no file IO beyond the commit view)
    val partitions = t.view.fileSlices(None).map(_.partitionPath).distinct.sorted
      .filter(_.nonEmpty)
      .map { p =>
        val values =
          if (partCols.isEmpty) Seq.empty[String]
          else if (partCols.size == 1)
            Seq(hivePrefix.filter(p.startsWith).map(p.stripPrefix).getOrElse(p))
          else {
            // one directory level per column (the multi-level contract),
            // each level's hive-style `name=` prefix stripped when the
            // layout writes them
            val levelNames = graft.keygen.KeyGen.hiveStyleLevelNames(t.cfg)
            val parts = p.split("/", partCols.size)
            partCols.indices.map { i =>
              val s = if (i < parts.length) parts(i) else ""
              levelNames.map(_(i) + "=").filter(s.startsWith)
                .map(s.stripPrefix).getOrElse(s)
            }
          }
        CatalogTarget.PartitionRef(p, values)
      }
    def publish(name: String, options: Map[String, String]): Unit = {
      tgt.existing(db, name) match {
        case None => tgt.createTable(db, name, current, norm, options, partCols)
        case Some(e) =>
          require(e.provider.exists(_.equalsIgnoreCase("graft")),
            s"refusing to sync over existing non-graft table $db.$name " +
              s"(provider=${e.provider.getOrElse("none")})")
          val sameLoc = e.location.exists(u => GraftTable.normalize(u) == norm)
          if (e.schema != current || !sameLoc)
            tgt.replaceTable(db, name, current, norm, options, partCols)
      }
      tgt.addPartitions(db, name, partitions)
      tgt.dropDeadPartitions(db, name, partitions)
      tgt.refresh(db, name)
    }
    publish(table, Map.empty)
    // MOR tables additionally publish the reference's Hive-sync pair
    // (HiveSyncTool: `<t>_ro` read-optimized, `<t>_rt` real-time); the
    // bare name stays the snapshot view, so COW and MOR read uniformly
    if (t.cfg.isMor) {
      publish(table + "_ro", Map("queryType" -> "read_optimized"))
      publish(table + "_rt", Map.empty)
    }
  }

  /** Sync every graft table found one level under `root` (directory name
    * = table name) into `db`. The restore-on-startup path: one call
    * re-publishes a warehouse of path-addressed tables into a fresh
    * session's catalog. Returns the synced table names. Directory names
    * the session catalog cannot hold (`SessionCatalog.validateName`
    * allows only `[A-Za-z0-9_]`) are skipped — one bad directory must
    * not abort the restore of a whole warehouse.
    */
  def syncAll(spark: SparkSession, root: String, db: String,
      dbLocation: Option[String] = None): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(GraftTable.normalize(root))
    val found = Storage.listPaths(dir)
      .filter(TableConfig.exists)
      .map(_.getName)
      .filter(_.matches("[A-Za-z0-9_]+")).sorted
    found.foreach(n => sync(spark, s"$dir/$n", db, n, dbLocation))
    found
  }

  /** Backtick-quote an identifier (handles dots/dashes in names; internal
    * backticks double per the SQL dialect).
    */
  private[sql] def ident(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Escape a string for a single-quoted SQL literal. */
  private[sql] def sqlLit(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")
}

/** [[CatalogTarget]] over the Spark session catalog. */
final class SessionCatalogTarget(spark: SparkSession) extends CatalogTarget {
  import CatalogSync.{ident, sqlLit}

  override def ensureDatabase(db: String, location: Option[String]): Unit = {
    val loc = location.map(l => s" LOCATION '${sqlLit(l)}'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${ident(db)}$loc")
  }

  override def existing(db: String, table: String): Option[CatalogTarget.Entry] = {
    val id = TableIdentifier(table, Some(db))
    val catalog = spark.sessionState.catalog
    if (!catalog.tableExists(id)) None
    else {
      // the catalog's stored metadata, NOT spark.table(...): materializing
      // the relation re-selects the stored column list (AnalysisException
      // on a dropped column) and reports current types, masking both
      // kinds of drift
      val meta = catalog.getTableMetadata(id)
      Some(CatalogTarget.Entry(meta.provider, meta.schema,
        meta.storage.locationUri.map(_.toString)))
    }
  }

  override def createTable(db: String, table: String, schema: StructType,
      location: String, options: Map[String, String],
      partitionCols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
    // the graft source partitions internally — the session entry never
    // declares PARTITIONED BY (Spark would route the v1 relation through
    // its own partition handling)
    val opts = (options + ("includeMetaColumns" -> "false"))
      .toSeq.sorted.map { case (k, v) => s"$k '${sqlLit(v)}'" }.mkString(", ")
    spark.sql(
      s"""CREATE TABLE ${ident(db)}.${ident(table)} USING graft
         |OPTIONS ($opts)
         |LOCATION '${sqlLit(location)}'""".stripMargin)
  }

  override def replaceTable(db: String, table: String, schema: StructType,
      location: String, options: Map[String, String],
      partitionCols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
    spark.sql(s"DROP TABLE ${ident(db)}.${ident(table)}")
    createTable(db, table, schema, location, options, partitionCols)
  }

  // pruning happens inside GraftFileIndex against the table's own
  // file-system view, so the session catalog never holds a partition list
  // that could go stale; a metastore target serving other engines records
  // these (HiveSyncTool.syncPartitions)
  override def addPartitions(db: String, table: String,
      partitions: Seq[CatalogTarget.PartitionRef]): Unit = ()

  override def refresh(db: String, table: String): Unit =
    // V1 relations are cached per catalog identifier; a re-sync after
    // writes must not leave a stale file list behind the cached plan
    spark.sessionState.catalog.refreshTable(TableIdentifier(table, Some(db)))
}
