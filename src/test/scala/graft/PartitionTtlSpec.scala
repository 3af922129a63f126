package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, Services}
import graft.read.Readers

/** Partition TTL: calendar-window (keepLast) and activity-based
  * (lastWriteBefore) expiry, idempotence, and as-of reads across the
  * expiry.
  */
class PartitionTtlSpec extends AnyFunSuite {
  import SparkTestBase._

  private def cfg = TableConfig("orders_ttl", TableType.CopyOnWrite,
    Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate")

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("keepLast retains the newest partitions; expiry is time-travelable") {
    val dir = tmpDir("ttl_keep")
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert(orders)
    val pre = t.timeline.completedInstants().last.ts
    val years = orders.select(year(col("o_orderdate")).as("y"))
      .distinct().collect().map(_.getInt(0)).sorted
    val expired = Services.expirePartitions(t, keepLast = 2)
    assert(expired === years.dropRight(2).map(_.toString).toSeq)
    val snap = Readers.snapshot(t)
    assert(snap.count() ===
      orders.filter(year(col("o_orderdate")) >= years(years.length - 2)).count())
    // nothing left to expire: idempotent no-op, no extra commit
    val commits = t.timeline.completedInstants().size
    assert(Services.expirePartitions(t, keepLast = 2).isEmpty)
    assert(t.timeline.completedInstants().size === commits)
    // as-of before the expiry still sees everything
    assert(Readers.snapshot(t, asOf = Some(pre)).count() === orders.count())
  }

  test("auto TTL: graft.partition.ttl.keep.last expires on every commit") {
    val dir = tmpDir("ttl_auto")
    val t = GraftTable.create(spark, dir.toString,
      cfg.copy(props = Map(ConfigKeys.PartitionTtlKeepLast -> "2")))
    t.bulkInsert(orders)
    // the bulk_insert's postCommit already expired down to 2 partitions
    val years = orders.select(year(col("o_orderdate")).as("y"))
      .distinct().collect().map(_.getInt(0)).sorted
    assert(t.view.fileSlices(None).map(_.partitionPath).distinct.sorted ===
      years.takeRight(2).map(_.toString).toSeq)
    assert(Readers.snapshot(t).count() ===
      orders.filter(year(col("o_orderdate")) >= years(years.length - 2)).count())
  }

  test("lastWriteBefore expires idle partitions, spares recently-written ones") {
    val dir = tmpDir("ttl_idle")
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert(orders)
    // touch ONLY 2001: its last-write instant moves past the cutoff
    t.upsert(orders.filter(year(col("o_orderdate")) === 2001)
      .withColumn("o_totalprice", lit(1.0)))
    val cutoff = t.timeline.completedInstants().last.ts
    val expired = Services.expirePartitions(t, lastWriteBefore = Some(cutoff))
    assert(expired.nonEmpty && !expired.contains("2001"))
    val snap = Readers.snapshot(t)
    assert(snap.count() === orders.filter(year(col("o_orderdate")) === 2001).count())
    intercept[IllegalArgumentException] {
      Services.expirePartitions(t) // no policy
    }
    intercept[IllegalArgumentException] {
      Services.expirePartitions(t, keepLast = 1, lastWriteBefore = Some(cutoff))
    }
  }

  test("record TTL: rows older than keepDays behind the watermark expire") {
    val dir = tmpDir("rttl")
    // non-partitioned: the retention axis is the row's own event time
    val t = GraftTable.create(spark, dir.toString,
      TableConfig("orders_rttl", TableType.CopyOnWrite,
        Seq("o_orderkey"), "", "o_orderdate"))
    t.bulkInsert(orders)
    val cutoff = orders.agg((max(col("o_orderdate").cast("timestamp")) -
      expr("INTERVAL 400 DAY")).as("c")).first().getTimestamp(0)
    val keep = orders.filter(col("o_orderdate").cast("timestamp") >= lit(cutoff))
    val ts = Services.expireRecords(t, "o_orderdate", keepDays = 400)
    assert(ts.isDefined)
    val snap = Readers.snapshot(t)
    assert(snap.count() === keep.count())
    assert(snap.filter(col("o_orderdate").cast("timestamp") < lit(cutoff)).count() === 0)
    // idempotent: watermark unchanged, nothing more below it
    val commits = t.timeline.completedInstants().size
    assert(Services.expireRecords(t, "o_orderdate", keepDays = 400).isEmpty)
    assert(t.timeline.completedInstants().size === commits)
  }

  test("auto record TTL expires on every commit and terminates") {
    val dir = tmpDir("rttl_auto")
    val t = GraftTable.create(spark, dir.toString,
      TableConfig("orders_rttl_a", TableType.CopyOnWrite,
        Seq("o_orderkey"), "", "o_orderdate",
        Map(ConfigKeys.RecordTtlColumn -> "o_orderdate",
          ConfigKeys.RecordTtlKeepDays -> "400")))
    t.bulkInsert(orders)
    val cutoff = orders.agg((max(col("o_orderdate").cast("timestamp")) -
      expr("INTERVAL 400 DAY")).as("c")).first().getTimestamp(0)
    val keep = orders.filter(col("o_orderdate").cast("timestamp") >= lit(cutoff))
    assert(Readers.snapshot(t).count() === keep.count())
    // a fresh batch of ONLY-old rows expires entirely on its own commit
    val old500 = orders.agg((max(col("o_orderdate").cast("timestamp")) -
      expr("INTERVAL 500 DAY")).as("c")).first().getTimestamp(0)
    t.upsert(orders.filter(col("o_orderdate").cast("timestamp") < lit(old500))
      .withColumn("o_orderkey", col("o_orderkey") + 900000000L))
    assert(Readers.snapshot(t).count() === keep.count())
  }
}
