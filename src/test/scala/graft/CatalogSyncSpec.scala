package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sql.CatalogSync

class CatalogSyncSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def writeTable(dir: String, rows: Seq[(Long, Long, Double)]): Unit =
    rows.toDF("id", "ver", "price")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "upsert")
      .save(dir)

  test("CatalogTarget contract: create -> drift alter -> partition add, in order") {
    import graft.sql.CatalogTarget
    import org.apache.spark.sql.types.StructType
    // recording stub: what a Thrift HMS / Glue target would receive
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    var stored: Option[CatalogTarget.Entry] = None
    val stub = new CatalogTarget {
      override def ensureDatabase(db: String, location: Option[String]): Unit =
        calls += s"db:$db"
      override def existing(db: String, table: String) = { calls += "existing"; stored }
      override def createTable(db: String, table: String, schema: StructType,
          location: String, options: Map[String, String],
          partitionCols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
        calls += s"create:$db.$table[${partitionCols.map(_.name).mkString(",")}]"
        stored = Some(CatalogTarget.Entry(Some("graft"), schema, Some(location)))
      }
      override def replaceTable(db: String, table: String, schema: StructType,
          location: String, options: Map[String, String],
          partitionCols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
        calls += s"replace:$db.$table[${partitionCols.map(_.name).mkString(",")}]"
        stored = Some(CatalogTarget.Entry(Some("graft"), schema, Some(location)))
      }
      override def addPartitions(db: String, table: String,
          partitions: Seq[CatalogTarget.PartitionRef]): Unit =
        calls += s"partitions:${partitions.map(p => p.path + "=" + p.values.mkString(",")).mkString("|")}"
      override def refresh(db: String, table: String): Unit = calls += "refresh"
    }
    val dir = tmpDir("csync_stub").toString + "/t"
    Seq((1L, 1L, 10.0, "1995"), (2L, 1L, 20.0, "1996"))
      .toDF("id", "ver", "price", "yr")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("partitionPathExpr", "yr")
      .option("operation", "upsert").save(dir)

    CatalogSync.sync(spark, dir, "hms_db", "t", target = stub)
    assert(calls.toSeq === Seq("db:hms_db", "existing", "create:hms_db.t[yr]",
      "partitions:1995=1995|1996=1996", "refresh"), s"first sync sequence: $calls")

    // no drift: neither create nor replace
    calls.clear()
    CatalogSync.sync(spark, dir, "hms_db", "t", target = stub)
    assert(calls.toSeq === Seq("db:hms_db", "existing",
      "partitions:1995=1995|1996=1996", "refresh"), s"no-drift sequence: $calls")

    // schema drift (new column) + new partition -> replace + wider list
    calls.clear()
    Seq((3L, 1L, 30.0, "1997", "note"))
      .toDF("id", "ver", "price", "yr", "memo")
      .write.format("graft").mode("append")
      .option("operation", "upsert").save(dir)
    CatalogSync.sync(spark, dir, "hms_db", "t", target = stub)
    assert(calls.toSeq === Seq("db:hms_db", "existing", "replace:hms_db.t[yr]",
      "partitions:1995=1995|1996=1996|1997=1997", "refresh"), s"drift sequence: $calls")

    // a non-graft occupant makes the orchestrator refuse before any drop
    stored = Some(CatalogTarget.Entry(Some("parquet"),
      stored.get.schema, stored.get.location))
    calls.clear()
    val e = intercept[IllegalArgumentException] {
      CatalogSync.sync(spark, dir, "hms_db", "t", target = stub)
    }
    assert(e.getMessage.contains("non-graft"))
    assert(!calls.exists(_.startsWith("replace")) && !calls.exists(_.startsWith("create")))
  }

  test("sync registers db.table, re-sync refreshes after new writes") {
    val dir = tmpDir("csync").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0), (2L, 1L, 20.0)))
    CatalogSync.sync(spark, dir, "cs_db", "t1")
    assert(spark.sql("SELECT count(*) FROM cs_db.t1").first().getLong(0) === 2)

    writeTable(dir, Seq((3L, 1L, 30.0)))
    CatalogSync.sync(spark, dir, "cs_db", "t1")
    val got = spark.sql("SELECT id, price FROM cs_db.t1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got === Array((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // even without a re-sync, the relation rebuilds per scan: a write
    // after the last sync is still visible through the catalog name
    writeTable(dir, Seq((4L, 1L, 40.0)))
    assert(spark.sql("SELECT count(*) FROM cs_db.t1").first().getLong(0) === 4)
  }

  test("MERGE INTO a catalog-named graft table in SQL") {
    val dir = tmpDir("csync_m").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0), (2L, 1L, 20.0)))
    CatalogSync.sync(spark, dir, "cs_db", "tm")
    Seq((2L, 2L, 99.0), (9L, 1L, 90.0)).toDF("id", "ver", "price")
      .createOrReplaceTempView("cs_src")
    spark.sql("""
      MERGE INTO cs_db.tm t USING cs_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET price = s.price, ver = s.ver
      WHEN NOT MATCHED THEN INSERT *
    """)
    CatalogSync.sync(spark, dir, "cs_db", "tm")
    val got = spark.sql("SELECT id, price FROM cs_db.tm ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got === Array((1L, 10.0), (2L, 99.0), (9L, 90.0)))
  }

  test("schema evolution drops and re-creates the catalog entry") {
    val dir = tmpDir("csync_e").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0)))
    CatalogSync.sync(spark, dir, "cs_db", "te")
    assert(spark.table("cs_db.te").schema.fieldNames.toSeq ===
      Seq("id", "ver", "price"))
    // widen: a new column arrives via upsert schema evolution
    Seq((2L, 1L, 20.0, "x")).toDF("id", "ver", "price", "tag")
      .write.format("graft").option("recordKeyFields", "id")
      .option("precombineField", "ver").option("operation", "upsert")
      .save(dir)
    CatalogSync.sync(spark, dir, "cs_db", "te")
    assert(spark.table("cs_db.te").schema.fieldNames.contains("tag"))
    assert(spark.sql("SELECT count(*) FROM cs_db.te").first().getLong(0) === 2)
  }

  test("refuses to drop a same-named non-graft table") {
    val dir = tmpDir("csync_r").toString + "/t"
    writeTable(dir, Seq((1L, 1L, 10.0)))
    spark.sql("CREATE DATABASE IF NOT EXISTS cs_db")
    spark.sql("DROP TABLE IF EXISTS cs_db.tp")
    spark.sql("CREATE TABLE cs_db.tp (id BIGINT, ver BIGINT, price DOUBLE) USING parquet")
    val e = intercept[IllegalArgumentException] {
      CatalogSync.sync(spark, dir, "cs_db", "tp")
    }
    assert(e.getMessage.contains("non-graft"))
    // the parquet table survived the refused sync
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("tp", Some("cs_db")))
      .provider.exists(_.equalsIgnoreCase("parquet")))
    spark.sql("DROP TABLE cs_db.tp")
  }

  test("re-points a graft entry whose location moved") {
    val d1 = tmpDir("csync_l1").toString + "/t"
    val d2 = tmpDir("csync_l2").toString + "/t"
    writeTable(d1, Seq((1L, 1L, 10.0)))
    writeTable(d2, Seq((1L, 1L, 10.0), (2L, 1L, 20.0)))
    CatalogSync.sync(spark, d1, "cs_db", "tl")
    assert(spark.sql("SELECT count(*) FROM cs_db.tl").first().getLong(0) === 1)
    // same schema, different path: must re-point, not silently keep d1
    CatalogSync.sync(spark, d2, "cs_db", "tl")
    assert(spark.sql("SELECT count(*) FROM cs_db.tl").first().getLong(0) === 2)
  }

  test("MOR sync publishes the _ro/_rt pair (HiveSyncTool convention)") {
    val dir = tmpDir("csync_mor").toString + "/t"
    val t = graft.table.GraftTable.create(spark, dir, graft.core.TableConfig(
      "cs_mor", graft.core.TableType.MergeOnRead, Seq("id"), "", "ver",
      Map("graft.compact.inline" -> "false")))
    t.bulkInsert(Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("id", "ver", "price"))
    t.upsert(Seq((2L, 2L, 99.0)).toDF("id", "ver", "price")) // delta file
    CatalogSync.sync(spark, dir, "cs_db", "tmor")
    // real-time (and the bare name) merge deltas; read-optimized sees
    // only the base files until compaction folds them in
    def price(tbl: String) = spark.sql(
      s"SELECT price FROM $tbl WHERE id = 2").head().getDouble(0)
    assert(price("cs_db.tmor") === 99.0)
    assert(price("cs_db.tmor_rt") === 99.0)
    assert(price("cs_db.tmor_ro") === 20.0)
    assert(graft.table.Services.compact(t).isDefined)
    CatalogSync.sync(spark, dir, "cs_db", "tmor")
    assert(price("cs_db.tmor_ro") === 99.0)
  }

  test("syncAll restores a warehouse directory, skipping unsyncable names") {
    val root = tmpDir("csync_all").toString
    writeTable(s"$root/alpha", Seq((1L, 1L, 1.0)))
    writeTable(s"$root/beta", Seq((1L, 1L, 1.0), (2L, 1L, 2.0)))
    // the session catalog refuses names outside [A-Za-z0-9_]; one such
    // directory must not abort the whole warehouse restore
    writeTable(s"$root/my-table", Seq((1L, 1L, 1.0)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/not_a_table"))
    val synced = CatalogSync.syncAll(spark, root, "cs_wh")
    assert(synced === Seq("alpha", "beta"))
    assert(spark.sql("SELECT count(*) FROM cs_wh.beta").first().getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM cs_wh.alpha").first().getLong(0) === 1)
  }

  test("sync survives a table path containing a quote") {
    val dir = tmpDir("csync_esc").toString + "/it's here/t"
    writeTable(dir, Seq((1L, 1L, 7.0)))
    CatalogSync.sync(spark, dir, "cs_db", "tq")
    assert(spark.sql("SELECT price FROM cs_db.tq").first().getDouble(0) === 7.0)
  }

  test("write option catalogSyncDb syncs at end of commit") {
    val dir = tmpDir("csync_opt").toString + "/t"
    Seq((1L, 1L, 5.0)).toDF("id", "ver", "price")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "upsert")
      .option("catalogSyncDb", "cs_db").option("catalogSyncTable", "topt")
      .save(dir)
    assert(spark.sql("SELECT price FROM cs_db.topt").first().getDouble(0) === 5.0)
  }
}
