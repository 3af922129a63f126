package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{ConfigKeys, Storage, TableConfig, TableType}
import graft.core.Storage.PathOps
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** The table-format core must run entirely through the Hadoop FileSystem
  * substrate: a base path on a NON-file scheme (here [[MockRemoteFileSystem]]
  * under `graftmock:///`) gets the full write/read/service lifecycle with
  * zero java.nio assumptions — this is what makes hdfs:// and s3a:// base
  * paths deployable (reference routes all IO through FSUtils/FileSystem the
  * same way).
  */
class StorageSubstrateSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def registerScheme(): Unit = {
    val impl = classOf[MockRemoteFileSystem].getName
    Storage.conf.set("fs.graftmock.impl", impl)
    spark.sparkContext.hadoopConfiguration.set("fs.graftmock.impl", impl)
  }

  private def mockBase(name: String): String = {
    registerScheme()
    val local = tmpDir(name)
    s"graftmock://${local.toAbsolutePath}"
  }

  test("scheme resolution: graftmock base path resolves to the mock FS") {
    registerScheme()
    val p = new Path("graftmock:///tmp/graft_substrate_probe")
    assert(Storage.fs(p).isInstanceOf[MockRemoteFileSystem])
    assert(Storage.qualified(p).toUri.getScheme === "graftmock")
    // non-local scheme => no OS file handle (forces the lease lock path)
    assert(Storage.localFile(p).isEmpty)
  }

  test("COW lifecycle on a non-local FileSystem scheme") {
    val base = mockBase("mockfs_cow") + "/t"
    val t = GraftTable.create(spark, base, TableConfig(
      "mock_cow", TableType.CopyOnWrite, Seq("id"), "concat('p=', pmod(id, 2))", "ver"))
    assert(t.basePath.toUri.getScheme === "graftmock")

    t.bulkInsert((1L to 200L).map(i => (i, 0L, i * 1.0)).toDF("id", "ver", "price"))
    assert(Readers.snapshot(t).count() === 200)

    // upsert: index tag joins against a graftmock:// key scan
    t.upsert(Seq((7L, 1L, 777.0), (201L, 1L, 201.0)).toDF("id", "ver", "price"))
    val snap = Readers.snapshot(t)
    assert(snap.count() === 201)
    assert(snap.filter($"id" === 7L).select("price").as[Double].head() === 777.0)

    // delete + time travel across the remote timeline
    val preDelete = t.timeline.lastCompleted().get.ts
    t.delete(Seq((7L, 2L, 0.0)).toDF("id", "ver", "price"))
    assert(Readers.snapshot(t).count() === 200)
    assert(Readers.timeTravel(t, preDelete).count() === 201)

    // incremental read over the remote store
    val inc = Readers.incremental(t, beginTs = preDelete)
    assert(inc.count() === 0) // delete drops the record from latest-state incremental

    // lock file is a lease (no byte-range locks off-local), cleaned up after
    assert(!Storage.exists(t.basePath.resolve(".graft").resolve("lock.lease")))
  }

  test("MOR deltas, compaction and clean on a non-local FileSystem scheme") {
    val base = mockBase("mockfs_mor") + "/t"
    val t = GraftTable.create(spark, base, TableConfig(
      "mock_mor", TableType.MergeOnRead, Seq("id"), "", "ver",
      Map("graft.compact.inline" -> "false")))
    t.bulkInsert((1L to 100L).map(i => (i, 0L)).toDF("id", "ver"))
    t.upsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "ver"))
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty))
    assert(Readers.snapshot(t).filter($"ver" === 1L).count() === 2)

    Services.compact(t)
    assert(t.view.fileSlices(None).forall(_.deltaFiles.isEmpty))
    assert(Readers.snapshot(t).filter($"ver" === 1L).count() === 2)

    // cleaning deletes through the mock FS without error
    (2 to 12).foreach(k => t.upsert(Seq((1L, k.toLong)).toDF("id", "ver")))
    Services.clean(t, retainCommits = 3)
    assert(Readers.snapshot(t).count() === 100)
  }

  test("rollback and restore on a non-local FileSystem scheme") {
    val base = mockBase("mockfs_rb") + "/t"
    val t = GraftTable.create(spark, base, TableConfig(
      "mock_rb", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    t.bulkInsert((1L to 50L).map(i => (i, 0L)).toDF("id", "ver"))
    val ts2 = t.upsert(Seq((1L, 1L)).toDF("id", "ver"))
    Services.rollback(t, ts2)
    assert(Readers.snapshot(t).filter($"ver" === 1L).count() === 0)
    assert(Readers.snapshot(t).count() === 50)
  }
}
