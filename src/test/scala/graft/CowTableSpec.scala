package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, Services}
import graft.read.Readers

class CowTableSpec extends AnyFunSuite {
  import SparkTestBase._

  private def ordersCfg = TableConfig(
    tableName = "orders_t",
    tableType = TableType.CopyOnWrite,
    recordKeyFields = Seq("o_orderkey"),
    partitionPathExpr = "date_format(o_orderdate, 'yyyy')",
    precombineField = "o_orderdate")

  test("bulk_insert then snapshot matches source") {
    val dir = tmpDir("cow_bulk")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val snap = Readers.snapshot(t)
    assert(snap.count() === src.count())
    // meta columns present and populated
    assert(snap.columns.take(5) === MetaCols.All.toArray)
    assert(snap.filter(col(MetaCols.RecordKey).isNull).count() === 0)
    // data round-trips
    val a = src.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").collect()
    val b = snap.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("upsert updates existing and inserts new keys; snapshot reflects latest") {
    val dir = tmpDir("cow_upsert")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val updates = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(9999.0))
    val news = src.filter(col("o_orderkey") % 10 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    t.upsert(updates.unionByName(news))
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count() + news.count())
    assert(snap.filter(col("o_totalprice") === 9999.0).count() === updates.count())
    // key uniqueness preserved
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    snap.unpersist()
  }

  test("upsert is idempotent on replay") {
    val dir = tmpDir("cow_idem")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val updates = src.filter(col("o_orderkey") % 7 === 0).withColumn("o_totalprice", lit(1.0))
    t.upsert(updates)
    val c1 = Readers.snapshot(t).count()
    t.upsert(updates) // replay
    val snap = Readers.snapshot(t)
    assert(snap.count() === c1)
    assert(snap.filter(col("o_totalprice") === 1.0).count() === updates.count())
  }

  test("delete removes keys; deleting missing keys is a no-op") {
    val dir = tmpDir("cow_del")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val toDelete = src.filter(col("o_orderkey") % 5 === 0)
    t.delete(toDelete)
    val snap = Readers.snapshot(t)
    assert(snap.count() === src.count() - toDelete.count())
    assert(snap.filter(col("o_orderkey") % 5 === 0).count() === 0)
    t.delete(toDelete) // again: no-op
    assert(Readers.snapshot(t).count() === src.count() - toDelete.count())
  }

  test("precombine picks highest ordering value among batch duplicates") {
    val dir = tmpDir("cow_pre")
    import spark.implicits._
    val cfg = TableConfig("ev", TableType.CopyOnWrite, Seq("id"), "", "ver")
    val t = GraftTable.create(spark, dir.toString, cfg)
    val batch = Seq((1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (2L, 1L, "x"))
      .toDF("id", "ver", "v")
    t.upsert(batch)
    val got = Readers.snapshot(t).select("id", "ver", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got === Array((1L, 3L, "c"), (2L, 1L, "x")))
  }

  test("time travel and incremental see commit boundaries") {
    val dir = tmpDir("cow_tt")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    val c1 = t.bulkInsert(src)
    val updates = src.filter(col("o_orderkey") % 10 === 0).withColumn("o_totalprice", lit(-5.0))
    val c2 = t.upsert(updates)
    // time travel to c1: original prices
    val asOf = Readers.timeTravel(t, c1)
    assert(asOf.count() === src.count())
    assert(asOf.filter(col("o_totalprice") === -5.0).count() === 0)
    // incremental (c1, c2]: exactly the updated rows, new values
    val inc = Readers.incremental(t, c1, Some(c2))
    assert(inc.count() === updates.count())
    assert(inc.filter(col("o_totalprice") =!= -5.0).count() === 0)
    // incremental from 0: full latest state of changed records
    val all = Readers.incremental(t, "0")
    assert(all.count() === src.count())
    // partition glob (incr.path.glob analog) prunes the pull to matching
    // partitions from commit metadata, before any file IO
    val year = src.select(date_format(col("o_orderdate"), "yyyy").as("y"))
      .distinct().orderBy("y").head().getString(0)
    val globbed = Readers.incremental(t, "0", partitionGlob = Some(year))
    assert(globbed.count() ===
      src.filter(date_format(col("o_orderdate"), "yyyy") === year).count())
    assert(Readers.incremental(t, "0", partitionGlob = Some("19?*")).count()
      === src.filter(date_format(col("o_orderdate"), "yyyy") < "2000").count())
    assert(Readers.incremental(t, "0", partitionGlob = Some("nope")).count() === 0)
  }

  test("insert packs small files instead of spawning new groups") {
    val dir = tmpDir("cow_pack")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    val groupsBefore = t.view.fileSlices(None).size
    t.insert(src.filter(col("o_orderkey") % 2 === 1))
    val groupsAfter = t.view.fileSlices(None).size
    assert(groupsAfter === groupsBefore) // all inserts packed into small files
    assert(Readers.snapshot(t).count() === src.count())
  }

  test("insert_overwrite replaces touched partitions only") {
    val dir = tmpDir("cow_iow")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val part = Readers.snapshot(t).select(MetaCols.PartitionPath).distinct()
      .orderBy(MetaCols.PartitionPath).first().getString(0)
    val replacement = src.filter(date_format(col("o_orderdate"), "yyyy") === part).limit(10)
    t.insertOverwrite(replacement)
    val snap = Readers.snapshot(t).cache()
    assert(snap.filter(col(MetaCols.PartitionPath) === part).count() === 10)
    val otherSrc = src.filter(date_format(col("o_orderdate"), "yyyy") =!= part)
    assert(snap.filter(col(MetaCols.PartitionPath) =!= part).count() === otherSrc.count())
    snap.unpersist()
  }

  test("delete_partition drops a partition logically") {
    val dir = tmpDir("cow_dp")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val part = t.view.partitions(None).head
    t.deletePartitions(Seq(part))
    val snap = Readers.snapshot(t)
    assert(snap.filter(col(MetaCols.PartitionPath) === part).count() === 0)
    assert(snap.count() > 0)
  }

  test("rollback undoes the last commit; restore returns to a savepoint") {
    val dir = tmpDir("cow_rb")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    val c1 = t.bulkInsert(src)
    Services.savepoint(t, c1)
    val n1 = Readers.snapshot(t).count()
    t.upsert(src.limit(100).withColumn("o_orderkey", col("o_orderkey") + 500000000L))
    assert(Readers.snapshot(t).count() === n1 + 100)
    t.upsert(src.limit(50).withColumn("o_orderkey", col("o_orderkey") + 900000000L))
    Services.restore(t, c1)
    assert(Readers.snapshot(t).count() === n1)
  }

  test("schema evolution: new nullable column appears, old rows read as null") {
    val dir = tmpDir("cow_evo")
    import spark.implicits._
    val cfg = TableConfig("evo", TableType.CopyOnWrite, Seq("id"), "", "ver")
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v"))
    t.upsert(Seq((3L, 1L, "c", 42.0)).toDF("id", "ver", "v", "extra"))
    val snap = Readers.snapshot(t).orderBy("id")
    assert(snap.columns.contains("extra"))
    val rows = snap.select("id", "extra").collect()
    assert(rows.map(r => if (r.isNullAt(1)) -1.0 else r.getDouble(1)).toSeq === Seq(-1.0, -1.0, 42.0))
  }

  test("clean removes superseded files but keeps retained snapshots readable") {
    val dir = tmpDir("cow_clean")
    import spark.implicits._
    val cfg = TableConfig("cl", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.MaxFileSize -> (1024L * 1024).toString))
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert((1L to 100L).map(i => (i, 0L, s"v$i")).toDF("id", "ver", "v"))
    (1 to 4).foreach { k =>
      t.upsert((1L to 100L).map(i => (i, k.toLong, s"v$i-$k")).toDF("id", "ver", "v"))
    }
    val cleaned = Services.clean(t, retainCommits = 2)
    assert(cleaned.isDefined)
    val snap = Readers.snapshot(t)
    assert(snap.count() === 100)
    assert(snap.filter(col("ver") === 4L).count() === 100)

    // an incremental consumer whose checkpoint predates the cleaned files
    // fails loudly by default, and recovers via the full-scan fallback
    // (reference incr.fallback.fulltablescan.enable) with the latest state
    intercept[IllegalArgumentException] { Readers.incremental(t, "0").count() }
    val fb = Readers.incremental(t, "0", fallbackFullScan = true)
      .select("id", "ver").as[(Long, Long)].collect().toMap
    assert(fb.size === 100)
    assert(fb.values.forall(_ === 4L))
  }

  test("TableAdmin.fileSizes reports live base-file distribution") {
    val dir = tmpDir("admfs")
    val t = GraftTable.create(spark, dir.toString,
      TableConfig("afs", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    t.bulkInsert(spark.read.parquet(s"$sf001/orders.parquet"))
    val fs = graft.table.TableAdmin.fileSizes(t).collect().head
    val live = t.view.fileSlices(None).flatMap(_.baseFile)
    assert(fs.getAs[Long]("num_files") === live.size.toLong)
    assert(fs.getAs[Long]("min_bytes") <= fs.getAs[Long]("p50_bytes"))
    assert(fs.getAs[Long]("p50_bytes") <= fs.getAs[Long]("p90_bytes"))
    assert(fs.getAs[Long]("p90_bytes") <= fs.getAs[Long]("max_bytes"))
    assert(fs.getAs[Long]("max_bytes") === live.map(_.sizeBytes).max)
  }
}
