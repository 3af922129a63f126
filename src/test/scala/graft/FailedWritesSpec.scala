package graft

import graft.core.Storage
import graft.core.Storage.PathOps

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Crashed-writer cleanup (reference rollbackFailedWrites / EAGER policy):
  * pending instants from a dead writer — including data files it already
  * moved into the table layout — are reaped, while live state and
  * retryable compaction plans survive.
  */
class FailedWritesSpec extends AnyFunSuite {
  import SparkTestBase._

  private def cfg(props: Map[String, String] = Map.empty) = TableConfig(
    "fw_t", TableType.CopyOnWrite, Seq("o_orderkey"),
    "date_format(o_orderdate, 'yyyy')", "o_orderdate", props)

  /** Simulate a writer that died mid-write: pending instant files, a
    * staging dir, and one data file already moved into a partition.
    */
  private def plantCrash(t: GraftTable): (String, org.apache.hadoop.fs.Path) = {
    val ts = InstantTime.newInstant(t.timeline)
    t.timeline.transitionToInflight(t.timeline.createRequested(ts, Action.Commit))
    Storage.mkdirs(graft.table.WritePipeline.stagingDir(t.basePath, ts))
    val part = t.basePath.resolve("1995")
    Storage.mkdirs(part)
    val orphan = part.resolve(s"deadbeef-0000_0_$ts.parquet")
    Storage.write(orphan, Array[Byte](1, 2, 3))
    (ts, orphan)
  }

  test("explicit rollbackFailedWrites reaps pending instants and orphan files") {
    val t = GraftTable.create(spark, tmpDir("fw1").toString, cfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(300).cache()
    src.count()
    t.bulkInsert(src)
    val n = Readers.snapshot(t).count()
    val (ts, orphan) = plantCrash(t)
    val rolled = Services.rollbackFailedWrites(t)
    assert(rolled.size === 1)
    assert(!Storage.exists(orphan), "orphan data file survived")
    assert(t.timeline.pendingInstants().isEmpty)
    assert(t.timeline.completedInstants().exists(_.action == Action.Rollback))
    assert(Readers.snapshot(t).count() === n, "live data changed")
    // the planted instant is recorded in the rollback metadata
    val md = Json.read[RollbackMetadata](t.timeline.readContent(
      t.timeline.completedInstants().filter(_.action == Action.Rollback).last))
    assert(md.rolledBackInstants === Seq(ts))
    src.unpersist()
  }

  test("EAGER policy reaps on the next write; LAZY leaves fresh pending alone") {
    val eager = GraftTable.create(spark, tmpDir("fw2").toString,
      cfg(Map(ConfigKeys.FailedWritesPolicy -> "EAGER")))
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(200).cache()
    src.count()
    eager.bulkInsert(src)
    val (_, orphan) = plantCrash(eager)
    eager.upsert(src.limit(20).withColumn("o_totalprice", lit(5.0)))
    assert(!Storage.exists(orphan), "EAGER write did not reap the crashed writer")
    assert(eager.timeline.pendingInstants().isEmpty)

    // default LAZY: a FRESH pending instant (e.g. a live optimistic
    // writer) survives the next write untouched
    val lazyT = GraftTable.create(spark, tmpDir("fw3").toString, cfg())
    lazyT.bulkInsert(src)
    val (ts2, orphan2) = plantCrash(lazyT)
    lazyT.upsert(src.limit(20).withColumn("o_totalprice", lit(6.0)))
    assert(Storage.exists(orphan2), "LAZY reaped a fresh pending instant")
    assert(lazyT.timeline.pendingInstants().exists(_.ts == ts2))
    src.unpersist()
  }

  test("retryable compaction plans survive; snapshot unaffected by reap") {
    val t = GraftTable.create(spark, tmpDir("fw4").toString, TableConfig(
      "fw_mor", TableType.MergeOnRead, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate",
      Map("graft.compact.inline" -> "false")))
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(300).cache()
    src.count()
    t.bulkInsert(src)
    t.upsert(src.limit(100).withColumn("o_totalprice", lit(2.0)))
    val planned = Services.scheduleCompaction(t)
    assert(planned.nonEmpty)
    plantCrash(t)
    Services.rollbackFailedWrites(t)
    // compaction plan still pending and runnable
    assert(t.timeline.pendingInstants().exists(i =>
      i.ts == planned.get && i.action == Action.Compaction))
    Services.runCompaction(t, planned.get)
    assert(Readers.snapshot(t).filter(col("o_totalprice") === 2.0).count() === 100)
    src.unpersist()
  }
}
