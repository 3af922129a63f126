package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sql.{CatalogSync, HiveCatalogTarget}

/** CatalogSync against a REAL Hive metastore — the embedded in-process
  * HMS over Derby (the jars Spark ships with), driven through the same
  * IMetaStoreClient surface the reference's HiveSyncTool/HoodieHiveClient
  * uses against a Thrift HMS. One embedded store for the whole suite
  * (Derby is single-process); each test uses its own database/table.
  */
class HiveCatalogTargetSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private lazy val storeDir = tmpDir("hms_store").toString
  private lazy val target = HiveCatalogTarget.embedded(storeDir)
  private def client = target.client

  private def writeTable(dir: String, rows: Seq[(Long, Long, Double, String)],
      extra: Map[String, String] = Map.empty): Unit = {
    var w = rows.toDF("id", "ver", "price", "yr")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("partitionPathExpr", "yr")
      .option("operation", "upsert")
    extra.foreach { case (k, v) => w = w.option(k, v) }
    w.save(dir)
  }

  test("sync publishes an external parquet-readable entry with real partitions") {
    val dir = tmpDir("hms_t1").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995"), (2L, 1L, 20.0, "1996")))
    CatalogSync.sync(spark, dir, "hdb1", "t", target = target)

    assert(client.getDatabase("hdb1") != null)
    val t = client.getTable("hdb1", "t")
    // HiveSyncTool's external-table convention: dropping metadata never
    // deletes data
    assert(t.getTableType === "EXTERNAL_TABLE")
    assert(t.getParameters.get("EXTERNAL") === "TRUE")
    assert(t.getParameters.get("spark.sql.sources.provider") === "graft")
    assert(t.getSd.getLocation.endsWith("/t"))
    // partition column is a declared KEY, not a data column
    assert(t.getPartitionKeys.asScala.map(_.getName) === Seq("yr"))
    assert(!t.getSd.getCols.asScala.map(_.getName).contains("yr"))
    // hive-dialect types for foreign engines
    assert(t.getSd.getCols.asScala.map(c => c.getName -> c.getType).toMap ===
      Map("id" -> "bigint", "ver" -> "bigint", "price" -> "double"))
    // real partition registration with typed values and locations
    val parts = client.listPartitions("hdb1", "t", -1).asScala
    assert(parts.map(_.getValues.asScala.head).sorted === Seq("1995", "1996"))
    assert(parts.forall(p =>
      p.getSd.getLocation === t.getSd.getLocation + "/" + p.getValues.asScala.head))
  }

  test("re-sync is idempotent; new data adds only the delta partitions") {
    val dir = tmpDir("hms_t2").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995")))
    CatalogSync.sync(spark, dir, "hdb2", "t", target = target)
    val created = client.getTable("hdb2", "t").getCreateTime
    // no drift: entry untouched (same createTime), partitions unchanged
    CatalogSync.sync(spark, dir, "hdb2", "t", target = target)
    assert(client.getTable("hdb2", "t").getCreateTime === created)
    assert(client.listPartitionNames("hdb2", "t", -1).asScala === Seq("yr=1995"))
    // second write, new partition: only the delta registers
    writeTable(dir, Seq((2L, 1L, 20.0, "1996")))
    CatalogSync.sync(spark, dir, "hdb2", "t", target = target)
    assert(client.getTable("hdb2", "t").getCreateTime === created)
    assert(client.listPartitionNames("hdb2", "t", -1).asScala.sorted ===
      Seq("yr=1995", "yr=1996"))
  }

  test("schema drift recreates the entry and keeps the exact Spark schema") {
    val dir = tmpDir("hms_t3").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995")))
    CatalogSync.sync(spark, dir, "hdb3", "t", target = target)
    // widen via upsert schema evolution
    Seq((2L, 1L, 20.0, "1996", "x")).toDF("id", "ver", "price", "yr", "memo")
      .write.format("graft").mode("append")
      .option("operation", "upsert").save(dir)
    CatalogSync.sync(spark, dir, "hdb3", "t", target = target)
    val t = client.getTable("hdb3", "t")
    assert(t.getSd.getCols.asScala.map(_.getName).contains("memo"))
    // the drift comparison reads back the STORED Spark schema, bit-exact
    val entry = target.existing("hdb3", "t").get
    val current = graft.read.Readers.snapshot(
        graft.table.GraftTable.load(spark, dir))
      .drop(graft.core.MetaCols.All: _*).schema
    assert(entry.schema === current)
    // partitions survived the recreate (re-registered by the same sync)
    assert(client.listPartitionNames("hdb3", "t", -1).asScala.sorted ===
      Seq("yr=1995", "yr=1996"))
  }

  test("MOR tables publish the _ro/_rt pair like the reference's Hive sync") {
    val dir = tmpDir("hms_t4").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995")),
      extra = Map("tableType" -> graft.core.TableType.MergeOnRead))
    CatalogSync.sync(spark, dir, "hdb4", "t", target = target)
    val names = client.getAllTables("hdb4").asScala.toSet
    assert(names === Set("t", "t_ro", "t_rt"))
    assert(client.getTable("hdb4", "t_ro").getParameters
      .get("graft.sync.option.queryType") === "read_optimized")
  }

  test("write-path option syncs into the metastore at end of commit") {
    target // force the embedded store open under storeDir first
    val dir = tmpDir("hms_t6").toString + "/t"
    Seq((1L, 1L, 10.0, "1995")).toDF("id", "ver", "price", "yr")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("partitionPathExpr", "yr").option("operation", "upsert")
      .option("catalogSyncDb", "hdb6").option("catalogSyncTable", "t")
      .option("catalogSyncMetastore", storeDir)
      .save(dir)
    assert(client.getTable("hdb6", "t").getParameters
      .get("spark.sql.sources.provider") === "graft")
    assert(client.listPartitionNames("hdb6", "t", -1).asScala === Seq("yr=1995"))
  }

  test("delete_partition and partition TTL drop dead partitions from the metastore") {
    val dir = tmpDir("hms_t7").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995"), (2L, 1L, 20.0, "1996"),
      (3L, 1L, 30.0, "1997")))
    CatalogSync.sync(spark, dir, "hdb7", "t", target = target)
    assert(client.listPartitionNames("hdb7", "t", -1).asScala.sorted ===
      Seq("yr=1995", "yr=1996", "yr=1997"))
    val t = graft.table.GraftTable.load(spark, dir)
    // explicit partition drop: the HMS entry must stop listing it
    t.deletePartitions(Seq("1995"))
    CatalogSync.sync(spark, dir, "hdb7", "t", target = target)
    assert(client.listPartitionNames("hdb7", "t", -1).asScala.sorted ===
      Seq("yr=1996", "yr=1997"))
    // partition TTL expiry: same reconciliation path
    val expired = graft.table.Services.expirePartitions(
      graft.table.GraftTable.load(spark, dir), keepLast = 1)
    assert(expired === Seq("1996"))
    CatalogSync.sync(spark, dir, "hdb7", "t", target = target)
    assert(client.listPartitionNames("hdb7", "t", -1).asScala === Seq("yr=1997"))
    // drops are metadata-only: the expired partitions' files still exist
    // until the table's own cleaner reclaims them (as-of the first commit
    // still reads all three partitions)
    val t2 = graft.table.GraftTable.load(spark, dir)
    assert(graft.read.Readers.timeTravel(t2,
      t2.timeline.completedDataInstants().head.ts).count() === 3)
  }

  test("special-char partition values escape Hive-style: re-sync idempotent, drops work") {
    val dir = tmpDir("hms_t8").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "y 1"), (2L, 1L, 20.0, "plain")))
    CatalogSync.sync(spark, dir, "hdb8", "t", target = target)
    val names1 = client.listPartitionNames("hdb8", "t", -1).asScala.sorted
    assert(names1.size === 2 && names1.exists(_.startsWith("yr=plain")))
    // re-sync: the diff must recognize the escaped name (URLEncoder's '+'
    // never matches Hive's escaping, which re-added + aborted the batch)
    CatalogSync.sync(spark, dir, "hdb8", "t", target = target)
    assert(client.listPartitionNames("hdb8", "t", -1).asScala.sorted === names1)
    // and the drop direction resolves the same escaped name
    graft.table.GraftTable.load(spark, dir).deletePartitions(Seq("y 1"))
    CatalogSync.sync(spark, dir, "hdb8", "t", target = target)
    assert(client.listPartitionNames("hdb8", "t", -1).asScala ===
      names1.filter(_.startsWith("yr=plain")))
  }

  test("multi-level identity partitions register as typed two-key HMS partitions") {
    val dir = tmpDir("hms_t9").toString + "/t"
    Seq((1L, 1L, 10.0, "1995", "eu"), (2L, 1L, 20.0, "1995", "us"),
      (3L, 1L, 30.0, "1996", "eu"))
      .toDF("id", "ver", "price", "yr", "region")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("partitionPathExpr",
        "concat_ws('/', cast(`yr` as string), cast(`region` as string))")
      .option("operation", "upsert")
      .save(dir)
    CatalogSync.sync(spark, dir, "hdb9", "t", target = target)
    val t = client.getTable("hdb9", "t")
    // BOTH columns are declared keys, neither is a data column
    assert(t.getPartitionKeys.asScala.map(_.getName) === Seq("yr", "region"))
    assert(!t.getSd.getCols.asScala.map(_.getName).exists(
      n => n == "yr" || n == "region"))
    val parts = client.listPartitions("hdb9", "t", -1).asScala
    assert(parts.map(_.getValues.asScala.toSeq).toSet ===
      Set(Seq("1995", "eu"), Seq("1995", "us"), Seq("1996", "eu")))
    assert(parts.forall(p => p.getSd.getLocation ===
      t.getSd.getLocation + "/" + p.getValues.asScala.mkString("/")))
    // drop reconciliation resolves the two-level names too
    graft.table.GraftTable.load(spark, dir).deletePartitions(Seq("1995/us"))
    CatalogSync.sync(spark, dir, "hdb9", "t", target = target)
    assert(client.listPartitionNames("hdb9", "t", -1).asScala.sorted ===
      Seq("yr=1995/region=eu", "yr=1996/region=eu"))
  }

  test("hive-style multi-level layouts sync typed values (prefixes stripped)") {
    val dir = tmpDir("hms_t10").toString + "/t"
    Seq((1L, 1L, "1995", "eu"), (2L, 1L, "1996", "us"))
      .toDF("id", "ver", "yr", "region")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("partitionPathExpr",
        "concat_ws('/', cast(`yr` as string), cast(`region` as string))")
      .option("graft.hive.style.partitioning", "true")
      .option("operation", "upsert")
      .save(dir)
    CatalogSync.sync(spark, dir, "hdb10", "t", target = target)
    val parts = client.listPartitions("hdb10", "t", -1).asScala
    // typed VALUES carry no k= prefix; locations keep the on-disk layout
    assert(parts.map(_.getValues.asScala.toSeq).toSet ===
      Set(Seq("1995", "eu"), Seq("1996", "us")))
    assert(parts.map(_.getSd.getLocation).exists(_.endsWith("/yr=1995/region=eu")))
    assert(client.listPartitionNames("hdb10", "t", -1).asScala.sorted ===
      Seq("yr=1995/region=eu", "yr=1996/region=us"))
    // idempotent re-sync (the HMS name diff sees the same escaped names)
    CatalogSync.sync(spark, dir, "hdb10", "t", target = target)
    assert(client.listPartitions("hdb10", "t", -1).asScala.size === 2)
  }

  test("many dead partitions drop in ONE batched metastore RPC") {
    val dir = tmpDir("hms_t11").toString + "/t"
    writeTable(dir, (0 until 8).map(i => (i.toLong, 1L, 10.0 + i, (1990 + i).toString)))
    CatalogSync.sync(spark, dir, "hdb11", "t", target = target)
    assert(client.listPartitionNames("hdb11", "t", -1).asScala.size === 8)
    // a TTL-style sweep: 7 of 8 partitions die in one sync — the
    // reconciliation must batch them into a single drop_partitions_req,
    // not 7 serial round trips
    graft.table.GraftTable.load(spark, dir)
      .deletePartitions((0 until 7).map(i => (1990 + i).toString))
    CatalogSync.sync(spark, dir, "hdb11", "t", target = target)
    assert(client.listPartitionNames("hdb11", "t", -1).asScala === Seq("yr=1997"))
    assert(target.lastDropRpcs === 1,
      s"7 dead partitions took ${target.lastDropRpcs} drop RPCs; expected 1 batch")
  }

  test("valueless live refs (resolution failure) never read as everything-dead") {
    val dir = tmpDir("hms_t12").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995"), (2L, 1L, 20.0, "1996")))
    CatalogSync.sync(spark, dir, "hdb12", "t", target = target)
    assert(client.listPartitionNames("hdb12", "t", -1).asScala.size === 2)
    // a live list whose refs ALL carry empty values models an
    // identity-column resolution failure (config drift, unchanged
    // schema): the sync must keep every registered partition rather than
    // interpret the failure as an empty table
    target.dropDeadPartitions("hdb12", "t", Seq(
      graft.sql.CatalogTarget.PartitionRef("1995", Seq.empty),
      graft.sql.CatalogTarget.PartitionRef("1996", Seq.empty)))
    assert(client.listPartitionNames("hdb12", "t", -1).asScala.size === 2)
    // a genuinely-empty live list still means everything-dead
    target.dropDeadPartitions("hdb12", "t", Seq.empty)
    assert(client.listPartitionNames("hdb12", "t", -1).asScala.isEmpty)
  }

  test("refuses to drop a same-named non-graft metastore entry") {
    val dir = tmpDir("hms_t5").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0, "1995")))
    CatalogSync.sync(spark, dir, "hdb5", "t", target = target)
    // hand-plant a foreign parquet entry under the next name
    val foreign = client.getTable("hdb5", "t").deepCopy()
    foreign.setTableName("occupied")
    foreign.getParameters.put("spark.sql.sources.provider", "parquet")
    client.createTable(foreign)
    val e = intercept[IllegalArgumentException] {
      CatalogSync.sync(spark, dir, "hdb5", "occupied", target = target)
    }
    assert(e.getMessage.contains("non-graft"))
    assert(client.getTable("hdb5", "occupied") != null)
  }
}
