package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, Services}
import graft.read.Readers

class MorTableSpec extends AnyFunSuite {
  import SparkTestBase._

  private def cfg(inline: Boolean = false) = TableConfig(
    "orders_mor", TableType.MergeOnRead,
    Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate",
    props = Map("graft.compact.inline" -> inline.toString))

  test("MOR upsert writes delta files; snapshot merges, read-optimized does not") {
    val dir = tmpDir("mor_up")
    val t = GraftTable.create(spark, dir.toString, cfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val updates = src.filter(col("o_orderkey") % 10 === 0).withColumn("o_totalprice", lit(4242.0))
    t.upsert(updates)
    // delta files exist, base files untouched
    val slices = t.view.fileSlices(None)
    assert(slices.exists(_.deltaFiles.nonEmpty))
    val snap = Readers.snapshot(t)
    assert(snap.count() === src.count())
    assert(snap.filter(col("o_totalprice") === 4242.0).count() === updates.count())
    // read-optimized skips the merge: no updated values visible
    val ro = Readers.readOptimized(t)
    assert(ro.count() === src.count())
    assert(ro.filter(col("o_totalprice") === 4242.0).count() === 0)
  }

  test("MOR delete via delta tombstone") {
    val dir = tmpDir("mor_del")
    val t = GraftTable.create(spark, dir.toString, cfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val dels = src.filter(col("o_orderkey") % 5 === 0)
    t.delete(dels)
    assert(Readers.snapshot(t).count() === src.count() - dels.count())
    assert(Readers.readOptimized(t).count() === src.count()) // tombstones only in deltas
  }

  test("MOR upsert routes new keys to new base files") {
    val dir = tmpDir("mor_ins")
    val t = GraftTable.create(spark, dir.toString, cfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val news = src.limit(100).withColumn("o_orderkey", col("o_orderkey") + 800000000L)
    t.upsert(news)
    val snap = Readers.snapshot(t)
    assert(snap.count() === src.count() + 100)
  }

  test("compaction folds deltas into new base files; snapshot unchanged") {
    val dir = tmpDir("mor_comp")
    val t = GraftTable.create(spark, dir.toString, cfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 10 === 0).withColumn("o_totalprice", lit(1.0)))
    t.delete(src.filter(col("o_orderkey") % 7 === 0))
    val before = Readers.snapshot(t)
    val beforeRows = before.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").collect()
    val ts = Services.compact(t)
    assert(ts.isDefined)
    // all deltas folded
    assert(t.view.fileSlices(None).forall(_.deltaFiles.isEmpty))
    val after = Readers.snapshot(t)
    assert(after.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").collect()
      === beforeRows)
    // read-optimized now equals snapshot
    assert(Readers.readOptimized(t).count() === after.count())
  }

  test("inline compaction triggers after N delta commits") {
    val dir = tmpDir("mor_inline")
    import spark.implicits._
    val c = TableConfig("t", TableType.MergeOnRead, Seq("id"), "", "ver",
      props = Map("graft.compact.inline" -> "true", ConfigKeys.CompactDeltaCommits -> "3"))
    val t = GraftTable.create(spark, dir.toString, c)
    t.bulkInsert((1L to 50L).map(i => (i, 0L)).toDF("id", "ver"))
    (1 to 3).foreach(k => t.upsert((1L to 50L).map(i => (i, k.toLong)).toDF("id", "ver")))
    assert(t.timeline.completedInstants().exists(_.action == Action.Compaction))
    val snap = Readers.snapshot(t)
    assert(snap.count() === 50)
    assert(snap.agg(min("ver")).first().getLong(0) === 3L)
  }

  test("compaction strategies pick different candidate sets") {
    val dir = tmpDir("mor_strat")
    val t = GraftTable.create(spark, dir.toString, cfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    // deltas across several year partitions
    t.upsert(src.filter(col("o_orderkey") % 4 === 0).withColumn("o_totalprice", lit(1.0)))
    val partsWithDeltas = t.view.fileSlices(None).filter(_.deltaFiles.nonEmpty)
      .map(_.partitionPath).distinct.sorted
    assert(partsWithDeltas.size > 2)

    // BOUNDED_PARTITION limits the plan to the newest partition
    val ts = Services.scheduleCompaction(t,
      strategy = graft.table.CompactionStrategy.BoundedPartition, maxPartitions = 1).get
    val plan = Json.read[CompactionPlan](
      t.timeline.readRequestedContent(ts, Action.Compaction))
    assert(plan.operations.map(_.partitionPath).distinct === Seq(partsWithDeltas.last))
    Services.runCompaction(t, ts)
    // remaining partitions still pending; UNBOUNDED takes them all
    val ts2 = Services.scheduleCompaction(t,
      strategy = graft.table.CompactionStrategy.Unbounded).get
    val plan2 = Json.read[CompactionPlan](
      t.timeline.readRequestedContent(ts2, Action.Compaction))
    assert(plan2.operations.map(_.partitionPath).distinct.sorted ===
      partsWithDeltas.filterNot(_ == partsWithDeltas.last))
    Services.runCompaction(t, ts2)
    assert(t.view.fileSlices(None).forall(_.deltaFiles.isEmpty))
    assert(Readers.snapshot(t).count() === src.count())
  }

  test("MOR time travel and incremental across deltacommits") {
    val dir = tmpDir("mor_tt")
    import spark.implicits._
    val c = TableConfig("t", TableType.MergeOnRead, Seq("id"), "", "ver")
    val t = GraftTable.create(spark, dir.toString, c)
    val c1 = t.bulkInsert((1L to 20L).map(i => (i, 0L)).toDF("id", "ver"))
    val c2 = t.upsert((1L to 10L).map(i => (i, 1L)).toDF("id", "ver"))
    val c3 = t.delete(Seq((5L, 9L)).toDF("id", "ver"))
    assert(Readers.timeTravel(t, c1).filter(col("ver") > 0).count() === 0)
    assert(Readers.timeTravel(t, c2).filter(col("ver") === 1).count() === 10)
    assert(Readers.timeTravel(t, c2).count() === 20)
    assert(Readers.snapshot(t).count() === 19)
    val inc = Readers.incremental(t, c1, Some(c2))
    assert(inc.count() === 10)
    assert(inc.filter(col("ver") === 1).count() === 10)
    // incremental crossing the delete: record 5 gone
    val inc2 = Readers.incremental(t, c1, Some(c3))
    assert(inc2.filter(col("id") === 5L).count() === 0)
  }
}
