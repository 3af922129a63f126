package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.table.{GraftTable, TableAdmin}

class SymlinkManifestSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def rows(n: Int) =
    (1 to n).map(i => (i.toLong, 1L, i * 1.0, s"p${i % 2}")).toDF("id", "ver", "price", "part")

  test("COW: manifest-listed files read to the exact snapshot, old versions excluded") {
    val dir = tmpDir("symlink_cow").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "sm_cow", TableType.CopyOnWrite, Seq("id"), "part", "ver"))
    t.bulkInsert(rows(100))
    t.upsert(rows(100).filter(col("id") % 4 === 0).withColumn("price", lit(-1.0)))
    val n = TableAdmin.generateSymlinkManifest(t)
    val files = TableAdmin.manifestFiles(t)
    assert(files.size === n)
    // every listed URI resolves; the plain read equals the engine snapshot
    val plain = spark.read.parquet(files: _*)
      .select("id", "ver", "price", "part").orderBy("id")
    val snap = graft.read.Readers.snapshot(t)
      .select("id", "ver", "price", "part").orderBy("id")
    assert(plain.collect() === snap.collect())
    assert(plain.filter(col("price") === -1.0).count() === 25)
    // one line per live file group — superseded pre-upsert versions absent
    assert(files.distinct.size === files.size)
  }

  test("MOR: manifest is the read-optimized view (base files only)") {
    val dir = tmpDir("symlink_mor").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "sm_mor", TableType.MergeOnRead, Seq("id"), "part", "ver"))
    t.bulkInsert(rows(50))
    t.upsert(rows(50).filter(col("id") % 5 === 0).withColumn("price", lit(-2.0)))
    TableAdmin.generateSymlinkManifest(t)
    val plain = spark.read.parquet(TableAdmin.manifestFiles(t): _*)
      .select("id", "ver", "price", "part").orderBy("id")
    val ro = graft.read.Readers.readOptimized(t)
      .select("id", "ver", "price", "part").orderBy("id")
    assert(plain.collect() === ro.collect())
    // deltas not represented: the -2.0 updates live only in log files
    assert(plain.filter(col("price") === -2.0).count() === 0)
  }

  test("regeneration after clustering lists the replacement files") {
    val dir = tmpDir("symlink_cl").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "sm_cl", TableType.CopyOnWrite, Seq("id"), "part", "ver"))
    t.bulkInsert(rows(60))
    t.insert(rows(60).withColumn("id", col("id") + 1000L))
    graft.table.Services.cluster(t)
    TableAdmin.generateSymlinkManifest(t)
    val plain = spark.read.parquet(TableAdmin.manifestFiles(t): _*)
    assert(plain.count() === 120)
  }
}
