package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

import graft.core.{Storage, TableConfig}
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
  * refreshed. Partition sync (`syncAllPartitions` in the reference) is
  * intentionally absent: pruning happens inside
  * [[graft.read.GraftFileIndex]] against the table's own file-system
  * view, so the catalog never holds a partition list that could go
  * stale.
  *
  * Safety: an existing same-name entry is only ever dropped when it is
  * a graft entry. A non-graft table under the target name makes sync
  * refuse (dropping it could delete managed data); a graft entry
  * pointing at a different location is re-pointed at `path`.
  */
object CatalogSync {

  /** Register (or refresh) the graft table at `path` as `db.table` in
    * the session catalog. Idempotent; drops + re-creates the entry when
    * the table's schema or location changed since the last sync.
    *
    * @param dbLocation optional explicit database location (defaults to
    *   `spark.sql.warehouse.dir`); only used when the database is first
    *   created. The database directory holds no table data — tables are
    *   external at their own base paths.
    */
  def sync(spark: SparkSession, path: String, db: String, table: String,
      dbLocation: Option[String] = None): Unit = {
    val norm = GraftTable.normalize(path)
    require(TableConfig.exists(new org.apache.hadoop.fs.Path(norm)), s"no graft table at $norm")
    val loc = dbLocation.map(l => s" LOCATION '${sqlLit(l)}'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${ident(db)}$loc")
    val id = TableIdentifier(table, Some(db))
    val full = s"${ident(db)}.${ident(table)}"
    val catalog = spark.sessionState.catalog
    val current = graft.read.Readers.snapshot(GraftTable.load(spark, norm))
      .drop(graft.core.MetaCols.All: _*).schema
    val exists = catalog.tableExists(id)
    val changed = exists && {
      // the catalog's stored metadata, NOT spark.table(full): materializing
      // the relation re-selects the stored column list (AnalysisException on
      // a dropped column) and reports current types, masking both kinds of
      // drift
      val meta = catalog.getTableMetadata(id)
      require(meta.provider.exists(_.equalsIgnoreCase("graft")),
        s"refusing to sync over existing non-graft table $full " +
          s"(provider=${meta.provider.getOrElse("none")})")
      val sameLoc = meta.storage.locationUri
        .exists(u => GraftTable.normalize(u.toString) == norm)
      meta.schema != current || !sameLoc
    }
    if (changed) spark.sql(s"DROP TABLE $full")
    if (!exists || changed)
      spark.sql(
        s"""CREATE TABLE $full USING graft
           |OPTIONS (includeMetaColumns 'false')
           |LOCATION '${sqlLit(norm)}'""".stripMargin)
    // V1 relations are cached per catalog identifier; a re-sync after
    // writes must not leave a stale file list behind the cached plan
    catalog.refreshTable(id)
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
  private def ident(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Escape a string for a single-quoted SQL literal. */
  private def sqlLit(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")
}
