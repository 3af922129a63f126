package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Payload, Services}

/** Merge-payload strategies (reference HoodieRecordPayload family):
  * EVENT_TIME (DefaultHoodieRecordPayload — event time outranks commit
  * order) and PARTIAL_UPDATE (OverwriteNonDefaultsWithLatestAvroPayload —
  * null columns keep stored values), on COW and MOR, including the
  * tombstone fence and compaction parity.
  */
class PayloadSpec extends AnyFunSuite {
  import SparkTestBase._

  private def cfg(tt: String, payload: String, precombine: String) = TableConfig(
    tableName = "orders_t",
    tableType = tt,
    recordKeyFields = Seq("o_orderkey"),
    partitionPathExpr = "date_format(o_orderdate, 'yyyy')",
    precombineField = precombine,
    props = Map(ConfigKeys.Payload -> payload, "graft.compact.inline" -> "false"))

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("EVENT_TIME: lower event time never overwrites, on COW and MOR") {
    for (tt <- Seq(TableType.CopyOnWrite, TableType.MergeOnRead)) {
      val t = GraftTable.create(spark, tmpDir("evt").toString,
        cfg(tt, Payload.EventTime, "o_totalprice"))
      val src = orders
      t.bulkInsert(src)
      val sample = src.filter(col("o_orderkey") % 10 === 0)
      // late batch: LOWER ordering value — must be ignored entirely
      t.upsert(sample.withColumn("o_totalprice", col("o_totalprice") - 1))
      // on-time batch: HIGHER ordering value — must land
      t.upsert(sample.withColumn("o_totalprice", col("o_totalprice") + 1))
      // another late batch after the winner — still ignored
      t.upsert(sample.withColumn("o_totalprice", lit(0.0)))
      val got = Readers.snapshot(t)
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_totalprice")).orderBy("o_orderkey").collect()
      val want = sample.select(col("o_orderkey"), col("o_totalprice") + 1)
        .orderBy("o_orderkey").collect()
      assert(got.sameElements(want), s"event-time merge mismatch on $tt")
    }
  }

  test("EVENT_TIME: a late delete (lower event time) does not remove the record") {
    val t = GraftTable.create(spark, tmpDir("evtdel").toString,
      cfg(TableType.CopyOnWrite, Payload.EventTime, "o_totalprice"))
    val src = orders
    t.bulkInsert(src)
    val n = src.count()
    // tombstones carrying a lower ordering value than stored rows
    t.delete(src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") - 1))
    assert(Readers.snapshot(t).count() === n, "late tombstone must lose")
    // tombstones with a higher ordering value do delete
    val doomed = src.filter(col("o_orderkey") % 10 === 0)
    t.delete(doomed.withColumn("o_totalprice", col("o_totalprice") + 1))
    assert(Readers.snapshot(t).count() === n - doomed.count())
  }

  test("EVENT_TIME MOR: a retained tombstone outranks a later lower-ordered upsert") {
    // The one place COW and MOR legitimately diverge under EVENT_TIME
    // (reference DefaultHoodieRecordPayload has the same asymmetry): a
    // high-ordered tombstone on MOR stays in the delta stack and keeps
    // suppressing lower-ordered upserts; COW deletes physically, so the
    // same upsert resurrects the key there. Compaction resolves the
    // tombstone and drops it — after it, re-insertion lands again.
    val t = GraftTable.create(spark, tmpDir("evt_tomb").toString,
      cfg(TableType.MergeOnRead, Payload.EventTime, "o_totalprice"))
    val src = orders
    t.bulkInsert(src)
    val doomed = src.filter(col("o_orderkey") % 10 === 0)
    val n = src.count()
    // definitive delete: ordering value above anything the key has seen
    t.delete(doomed.withColumn("o_totalprice", lit(1e9)))
    assert(Readers.snapshot(t).count() === n - doomed.count())
    // late re-insert (lower ordering) — the retained tombstone wins
    t.upsert(doomed.withColumn("o_totalprice", lit(5.0)))
    assert(Readers.snapshot(t).count() === n - doomed.count(),
      "late upsert must not resurrect past a higher-ordered tombstone")
    // a re-insert ABOVE the tombstone's ordering does land
    t.upsert(doomed.withColumn("o_totalprice", lit(2e9)))
    assert(Readers.snapshot(t).count() === n)
    // compaction folds the stack; the state it resolved persists
    Services.scheduleCompaction(t).foreach(ts => Services.runCompaction(t, ts))
    assert(Readers.snapshot(t).count() === n)
  }

  test("PARTIAL_UPDATE: null columns keep stored values across a MOR version stack") {
    val t = GraftTable.create(spark, tmpDir("partial").toString,
      cfg(TableType.MergeOnRead, Payload.PartialUpdate, ""))
    val src = orders
    t.bulkInsert(src)
    val hit = src.filter(col("o_orderkey") % 10 === 0)
    t.upsert(hit.withColumn("o_totalprice", col("o_totalprice") + 100)
      .withColumn("o_orderstatus", lit(null).cast("string"))
      .withColumn("o_custkey", lit(null).cast("long"))
      .withColumn("o_orderpriority", lit(null).cast("string")))
    t.upsert(hit.withColumn("o_orderstatus", lit("PP"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .withColumn("o_custkey", lit(null).cast("long"))
      .withColumn("o_orderpriority", lit(null).cast("string")))
    val got = Readers.snapshot(t).filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey").collect()
    val want = hit.select(col("o_orderkey"), col("o_custkey"), lit("PP"),
        col("o_totalprice") + 100, col("o_orderpriority"))
      .orderBy("o_orderkey").collect()
    assert(got.sameElements(want))
    // compaction resolves the stack identically
    Services.compact(t)
    val compacted = Readers.snapshot(t).filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey").collect()
    assert(compacted.sameElements(want), "compaction changed partial-update results")
    // compacted groups carry no pending deltas
    assert(t.view.fileSlices(None).forall(_.deltaFiles.isEmpty))
  }

  test("PARTIAL_UPDATE: tombstone fences the stack — re-insert does not resurrect old columns") {
    val t = GraftTable.create(spark, tmpDir("fence").toString,
      cfg(TableType.MergeOnRead, Payload.PartialUpdate, ""))
    val src = orders
    t.bulkInsert(src)
    val hit = src.filter(col("o_orderkey") % 100 === 0)
    t.delete(hit)
    // re-insert with a null status: values from before the delete must NOT
    // bleed through the tombstone
    t.upsert(hit.withColumn("o_orderstatus", lit(null).cast("string"))
      .withColumn("o_totalprice", lit(7.0)))
    val got = Readers.snapshot(t).filter(col("o_orderkey") % 100 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey").collect()
    val want = hit.select(col("o_orderkey"), lit(null).cast("string"), lit(7.0))
      .orderBy("o_orderkey").collect()
    assert(got.sameElements(want), "pre-tombstone values resurrected")
  }

  test("PARTIAL_UPDATE on COW: stored values fill incoming nulls at rewrite") {
    val t = GraftTable.create(spark, tmpDir("partialcow").toString,
      cfg(TableType.CopyOnWrite, Payload.PartialUpdate, ""))
    val src = orders
    t.bulkInsert(src)
    val hit = src.filter(col("o_orderkey") % 10 === 0)
    t.upsert(hit.withColumn("o_orderstatus", lit("QQ"))
      .withColumn("o_totalprice", lit(null).cast("double")))
    val got = Readers.snapshot(t).filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey").collect()
    val want = hit.select(col("o_orderkey"), lit("QQ"), col("o_totalprice"))
      .orderBy("o_orderkey").collect()
    assert(got.sameElements(want))
    // key uniqueness after the per-key merge
    val snap = Readers.snapshot(t)
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    assert(snap.count() === src.count())
  }

  test("graft.* options persist as table properties through the DataSource") {
    val dir = tmpDir("dsprops").toString + "/t"
    val src = orders.limit(100)
    src.write.format("graft")
      .option("recordKeyFields", "o_orderkey")
      .option("precombineField", "o_totalprice")
      .option("operation", "bulk_insert")
      .option(ConfigKeys.Payload, Payload.EventTime)
      .option(ConfigKeys.MaxFileSize, (4L * 1024 * 1024).toString)
      .save(dir)
    val t = GraftTable.load(spark, dir)
    assert(Payload.of(t.cfg) === Payload.EventTime)
    assert(t.maxFileSize === 4L * 1024 * 1024)
    // the payload actually governs merges on the created table: a batch
    // with a LOWER ordering value (-5) must be ignored entirely
    t.upsert(src.limit(30).withColumn("o_totalprice", lit(-5.0)))
    assert(Readers.snapshot(t).filter(col("o_totalprice") === -5.0).count() === 0)
  }

  test("delete-marker upsert tombstones marked rows, on COW and MOR") {
    for (tt <- Seq(TableType.CopyOnWrite, TableType.MergeOnRead)) {
      val dir = tmpDir(s"delmark_$tt")
      val t = GraftTable.create(spark, dir.toString,
        cfg(tt, Payload.OverwriteLatest, "o_totalprice"))
      val src = orders.limit(200)
      t.bulkInsert(src)
      val batch = src.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", lit(777.0))
        .withColumn(MetaCols.DeleteFlag, lit(false))
        .unionByName(src.filter(col("o_orderkey") % 5 === 1)
          .withColumn(MetaCols.DeleteFlag, lit(true)))
      t.upsert(batch)
      val snap = Readers.snapshot(t)
      // one commit did both: updates landed, marked rows are gone
      assert(snap.filter(col("o_orderkey") % 5 === 1).count() === 0)
      assert(snap.filter(col("o_totalprice") === 777.0).count() ===
        src.filter(col("o_orderkey") % 5 === 0).count())
      assert(snap.count() === src.filter(col("o_orderkey") % 5 =!= 1).count())
      // the marker is internal plumbing, not part of the read schema
      assert(!snap.columns.contains(MetaCols.DeleteFlag))
      // a NULL marker means plain upsert, not delete
      t.upsert(src.filter(col("o_orderkey") % 5 === 2)
        .withColumn("o_totalprice", lit(888.0))
        .withColumn(MetaCols.DeleteFlag, lit(null).cast("boolean")))
      assert(Readers.snapshot(t).filter(col("o_totalprice") === 888.0).count() ===
        src.filter(col("o_orderkey") % 5 === 2).count())
    }
  }

  test("EVENT_TIME requires a precombine field; unknown payloads rejected") {
    intercept[IllegalArgumentException] {
      Payload.of(cfg(TableType.CopyOnWrite, Payload.EventTime, ""))
    }
    intercept[IllegalArgumentException] {
      Payload.of(cfg(TableType.CopyOnWrite, "BOGUS", "x"))
    }
  }
}
