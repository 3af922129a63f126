package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, RecordIndex, Services, SortMode}
import graft.read.Readers

/** RECORD index: persisted key → file-group mappings as an internal graft
  * table — tagging equivalence with SIMPLE, catch-up over foreign commits,
  * remap through clustering, dead-group validation after partition drops,
  * and rebuild after a timeline rewind.
  */
class RecordIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  private def recCfg(extra: Map[String, String] = Map.empty) = TableConfig(
    tableName = "orders_rec",
    tableType = TableType.CopyOnWrite,
    recordKeyFields = Seq("o_orderkey"),
    partitionPathExpr = "date_format(o_orderdate, 'yyyy')",
    precombineField = "o_orderdate",
    props = Map(ConfigKeys.IndexType -> "RECORD") ++ extra)

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("upsert via record index matches SIMPLE-index semantics; index table exists") {
    val dir = tmpDir("rec_upsert")
    val t = GraftTable.create(spark, dir.toString, recCfg())
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    // eager post-commit sync built the internal index table
    assert(TableConfig.exists(RecordIndex.indexPath(t)))

    val updates = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(4242.0))
    val news = src.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    t.upsert(updates.unionByName(news))
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count() + news.count())
    assert(snap.filter(col("o_totalprice") === 4242.0).count() === updates.count())
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    snap.unpersist()
  }

  test("bucket count auto-scales with table key count (floor 16)") {
    // small table: floor applies
    val dirSmall = tmpDir("rec_auto_small")
    val tSmall = GraftTable.create(spark, dirSmall.toString, recCfg(
      Map(ConfigKeys.RecordIndexKeysPerBucket -> "50")))
    tSmall.bulkInsert(orders.limit(100), SortMode.NoSort)
    val innerSmall = GraftTable.load(spark, RecordIndex.indexPath(tSmall).toString)
    assert(RecordIndex.storedBuckets(innerSmall) === 16)

    // larger table: 1500 keys / 50 per bucket = 30 buckets
    val dir = tmpDir("rec_auto_big")
    val t = GraftTable.create(spark, dir.toString, recCfg(
      Map(ConfigKeys.RecordIndexKeysPerBucket -> "50")))
    t.bulkInsert(orders, SortMode.NoSort)
    val inner = GraftTable.load(spark, RecordIndex.indexPath(t).toString)
    val n = RecordIndex.storedBuckets(inner)
    assert(n > 16, s"bucket count did not grow: $n")
    // probing still works with the scaled count
    val upd = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", lit(9999.0))
    t.upsert(upd)
    val snap = Readers.snapshot(t)
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_totalprice") === 9999.0).count() === upd.count())

    // an explicit bucket prop still wins over the auto-scale
    val dirFixed = tmpDir("rec_auto_fixed")
    val tFixed = GraftTable.create(spark, dirFixed.toString, recCfg(
      Map(ConfigKeys.RecordIndexKeysPerBucket -> "50",
        ConfigKeys.RecordIndexBuckets -> "4")))
    tFixed.bulkInsert(orders, SortMode.NoSort)
    val innerFixed = GraftTable.load(spark, RecordIndex.indexPath(tFixed).toString)
    assert(RecordIndex.storedBuckets(innerFixed) === 4)
  }

  test("delete then re-insert the same keys yields exactly one live row per key") {
    val dir = tmpDir("rec_delete")
    val t = GraftTable.create(spark, dir.toString, recCfg())
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    val victims = src.filter(col("o_orderkey") % 7 === 0)
    t.delete(victims.select("o_orderkey", "o_orderdate"))
    assert(Readers.snapshot(t).count() === src.count() - victims.count())
    // stale mapping for a deleted key must degrade to a clean insert
    t.upsert(victims.withColumn("o_totalprice", lit(1.0)))
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count())
    assert(snap.filter(col("o_totalprice") === 1.0).count() === victims.count())
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    snap.unpersist()
  }

  test("clustering remaps moved keys; post-cluster upsert neither loses nor duplicates") {
    val dir = tmpDir("rec_cluster")
    val t = GraftTable.create(spark, dir.toString, recCfg(
      Map(ConfigKeys.MaxFileSize -> (64L * 1024).toString)))
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    t.upsert(src.filter(col("o_orderkey") % 11 === 0).withColumn("o_totalprice", lit(7.0)))
    // replacecommit: every file group is replaced, keys move to new groups
    Services.cluster(t, sortColumns = Seq("o_orderkey"))
    val updates = src.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(9999.0))
    t.upsert(updates)
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count())
    assert(snap.filter(col("o_totalprice") === 9999.0).count() === updates.count())
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    snap.unpersist()
  }

  test("dropped partition's mappings die with their groups: re-upsert inserts cleanly") {
    val dir = tmpDir("rec_droppart")
    val t = GraftTable.create(spark, dir.toString, recCfg())
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    val parts = t.view.partitions(None)
    val victim = parts.head
    Services.clean(t) // no-op guard: clean must not disturb the index
    t.deletePartitions(Seq(victim))
    val dropped = src.filter(date_format(col("o_orderdate"), "yyyy") === victim)
    assert(Readers.snapshot(t).count() === src.count() - dropped.count())
    // mappings for the dropped keys point at dead groups — tag must route
    // them as inserts, not write into replaced groups (which would vanish)
    t.upsert(dropped.withColumn("o_totalprice", lit(3.0)))
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count())
    assert(snap.filter(col("o_totalprice") === 3.0).count() === dropped.count())
    snap.unpersist()
  }

  test("rollback of an applied instant forces a rebuild (no resurrected mappings)") {
    val dir = tmpDir("rec_rollback")
    val t = GraftTable.create(spark, dir.toString, recCfg())
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    val news = src.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
    val ts = t.upsert(news)
    Services.rollback(t, ts)
    assert(Readers.snapshot(t).count() === src.count())
    // index absorbed the rolled-back commit; next write must detect the
    // rewind, rebuild, and still upsert correctly
    t.upsert(news.withColumn("o_totalprice", lit(5.0)))
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count() + news.count())
    assert(snap.filter(col("o_totalprice") === 5.0).count() === news.count())
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    snap.unpersist()
  }

  test("point lookup reads only mapped groups; equals the filtered snapshot") {
    val dir = tmpDir("rec_lookup")
    val t = GraftTable.create(spark, dir.toString, recCfg())
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    t.upsert(src.filter(col("o_orderkey") % 100 === 0).withColumn("o_totalprice", lit(3.0)))
    val keys = Seq("100", "200", "333", "999999999") // updated ×2, plain, absent
    val got = t.lookup(keys).cache()
    try {
      val want = Readers.snapshot(t)
        .filter(col(MetaCols.RecordKey).isin(keys: _*))
        .drop(MetaCols.All: _*)
      assert(got.count() === 3)
      assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
      assert(got.filter(col("o_totalprice") === 3.0).count() === 2)
      // the lookup's scan set is the mapped groups, not the table: its plan
      // reads strictly fewer files than the full snapshot
      def filesIn(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.inputFiles.length
        }.sum
      assert(filesIn(t.lookup(keys)) < filesIn(Readers.snapshot(t)))
      // lookup works after clustering moves the keys' groups
      Services.cluster(t)
      assert(t.lookup(keys).count() === 3)
    } finally got.unpersist()
  }

  test("MOR table: record index tags delta-appending upserts and deletes") {
    val dir = tmpDir("rec_mor")
    val t = GraftTable.create(spark, dir.toString, recCfg().copy(
      tableType = TableType.MergeOnRead,
      props = Map(ConfigKeys.IndexType -> "RECORD", "graft.compact.inline" -> "false")))
    val src = orders
    t.bulkInsert(src, SortMode.NoSort)
    val updates = src.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(11.0))
    t.upsert(updates)
    val dels = src.filter(col("o_orderkey") % 9 === 0)
    t.delete(dels.select("o_orderkey", "o_orderdate"))
    val expected = src.count() - dels.count()
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === expected)
    assert(snap.filter(col("o_totalprice") === 11.0).count() ===
      updates.join(dels, Seq("o_orderkey"), "left_anti").count())
    snap.unpersist()
  }
}
