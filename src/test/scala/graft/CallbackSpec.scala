package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.table.GraftTable

/** Commit callbacks (reference HoodieWriteCommitCallback): fire once per
  * successful data commit with the commit's identity and counts; never
  * fire for failed writes.
  */
class CallbackSpec extends AnyFunSuite {
  import SparkTestBase._

  test("callback fires per successful commit, not on failure") {
    val dir = tmpDir("cb")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "cb_t", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    val seen = scala.collection.mutable.ArrayBuffer[GraftTable.CommitCallbackMessage]()
    t.registerCommitCallback(seen += _)
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(200).cache()
    src.count()
    val c1 = t.bulkInsert(src)
    val c2 = t.upsert(src.limit(50).withColumn("o_totalprice", lit(1.0)))
    assert(seen.map(_.commitTime) === Seq(c1, c2))
    assert(seen.head.operationType === "bulk_insert")
    assert(seen.head.tableName === "cb_t")
    assert(seen.head.numWrites === 200)
    // a failing write publishes nothing and must not fire
    intercept[Exception] {
      t.upsert(src.withColumn("o_orderdate", expr("assert_true(false)")))
    }
    assert(seen.size === 2)
    src.unpersist()
  }

  test("commit duration metric rides in commit metadata on both commit paths") {
    val dir = tmpDir("cb_dur")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "cb_dur", TableType.CopyOnWrite, Seq("o_orderkey"), "", "o_orderdate"))
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(100)
    t.bulkInsert(src)
    t.upsertOptimistic(src.limit(10))
    val durs = graft.table.TableAdmin.commits(t)
      .select("operation", "duration_ms").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(durs.keySet === Set("bulk_insert", "upsert"))
    assert(durs.values.forall(_ >= 0L), s"expected recorded durations, got $durs")
  }

  test("a throwing callback propagates but cannot un-publish the durable commit") {
    val t = GraftTable.create(spark, tmpDir("cbthrow").toString, TableConfig(
      "cbt", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(100).cache()
    src.count()
    t.bulkInsert(src)
    t.registerCommitCallback(_ => throw new RuntimeException("notify failed"))
    val before = t.timeline.completedDataInstants().size
    intercept[RuntimeException] {
      t.upsert(src.limit(10).withColumn("o_totalprice", lit(42.0)))
    }
    // the commit itself is durable: instant present, data visible
    assert(t.timeline.completedDataInstants().size === before + 1,
      "post-publish callback failure destroyed the commit")
    assert(graft.read.Readers.snapshot(t)
      .filter(col("o_totalprice") === 42.0).count() === 10)
    src.unpersist()
  }

  test("an optimistic write reaped mid-flight fails cleanly instead of publishing dangling refs") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("cbreap").toString, TableConfig(
      "reap", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "ver"))
    val n = graft.read.Readers.snapshot(t).count()
    // simulate the failed-writes reaper firing while the optimistic body
    // has finished writing but not yet published
    t.beforeOptimisticPublish =
      () => graft.table.Services.rollbackFailedWrites(t)
    try intercept[graft.table.WriteConflictException] {
      t.upsertOptimistic(Seq((1L, 2L)).toDF("id", "ver"))
    } finally t.beforeOptimisticPublish = () => ()
    // table unharmed and fully readable — no dangling file references
    assert(t.timeline.pendingInstants().isEmpty)
    assert(graft.read.Readers.snapshot(t).count() === n)
  }
}
