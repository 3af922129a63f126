package graft.sql

import org.apache.spark.sql.SparkSession

import graft.core.{MetaCols, TableConfig}
import graft.read.Readers
import graft.table.GraftTable

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
  * Schema sync: the catalog entry stores the current meta-free snapshot
  * schema. On re-sync after schema evolution the entry is dropped and
  * re-created (the reference's `syncSchema` alter-table path); on
  * no-change re-sync only the relation cache is refreshed. Partition
  * sync (`syncAllPartitions` in the reference) is intentionally absent:
  * pruning happens inside [[graft.read.GraftFileIndex]] against the
  * table's own file-system view, so the catalog never holds a partition
  * list that could go stale.
  */
object CatalogSync {

  /** Register (or refresh) the graft table at `path` as `db.table` in
    * the session catalog. Idempotent; drops + re-creates the entry when
    * the table's schema evolved since the last sync.
    *
    * @param dbLocation optional explicit database location (defaults to
    *   `spark.sql.warehouse.dir`); only used when the database is first
    *   created. The database directory holds no table data — tables are
    *   external at their own base paths.
    */
  def sync(spark: SparkSession, path: String, db: String, table: String,
      dbLocation: Option[String] = None): Unit = {
    val norm = GraftTable.normalize(path)
    require(TableConfig.exists(java.nio.file.Paths.get(norm)),
      s"no graft table at $norm")
    val loc = dbLocation.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`$loc")
    val full = s"`$db`.`$table`"
    val current = Readers.snapshot(GraftTable.load(spark, norm))
      .drop(MetaCols.All: _*).schema
    val exists = spark.catalog.tableExists(s"$db.$table")
    val changed = exists && spark.table(full).schema != current
    if (changed) spark.sql(s"DROP TABLE $full")
    if (!exists || changed)
      spark.sql(
        s"""CREATE TABLE $full USING graft
           |OPTIONS (includeMetaColumns 'false')
           |LOCATION '$norm'""".stripMargin)
    // V1 relations are cached per catalog identifier; a re-sync after
    // writes must not leave a stale file list behind the cached plan
    spark.catalog.refreshTable(s"$db.$table")
  }

  /** Sync every graft table found one level under `root` (directory name
    * = table name) into `db`. The restore-on-startup path: one call
    * re-publishes a warehouse of path-addressed tables into a fresh
    * session's catalog. Returns the synced table names.
    */
  def syncAll(spark: SparkSession, root: String, db: String,
      dbLocation: Option[String] = None): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(GraftTable.normalize(root))
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    val stream = java.nio.file.Files.list(dir)
    val found =
      try stream.iterator().asScala
        .filter(p => TableConfig.exists(p))
        .map(_.getFileName.toString).toSeq.sorted
      finally stream.close()
    found.foreach(n => sync(spark, s"$dir/$n", db, n, dbLocation))
    found
  }
}
