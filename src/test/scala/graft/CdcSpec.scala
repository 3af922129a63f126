package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, Services}
import graft.read.Readers

/** CDC apply (AWS-DMS op-column analog) and clustering plan strategies. */
class CdcSpec extends AnyFunSuite {
  import SparkTestBase._

  private def ordersCfg(tt: String = TableType.CopyOnWrite, props: Map[String, String] = Map.empty) =
    TableConfig("orders_cdc", tt, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate", props)

  test("applyCdc: updates, inserts and deletes in one commit (COW)") {
    val dir = tmpDir("cdc_cow")
    val t = GraftTable.create(spark, dir.toString, ordersCfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    val cdc = src.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(333.0)).withColumn("Op", lit("U"))
      .unionByName(src.filter(col("o_orderkey") % 9 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 70000000L).withColumn("Op", lit("I")))
      .unionByName(src.filter(col("o_orderkey") % 10 === 5).withColumn("Op", lit("D")))
      // a delete for a key the table never held: must be a no-op
      .unionByName(src.limit(1)
        .withColumn("o_orderkey", lit(999999999L)).withColumn("Op", lit("D")))
    t.applyCdc(cdc)
    val snap = Readers.snapshot(t).cache()
    val expect = src.count() - src.filter(col("o_orderkey") % 10 === 5).count() +
      src.filter(col("o_orderkey") % 9 === 2).count()
    assert(snap.count() === expect)
    assert(snap.filter(col("o_totalprice") === 333.0).count() ===
      src.filter(col("o_orderkey") % 4 === 0 && col("o_orderkey") % 10 =!= 5).count())
    assert(snap.filter(col("o_orderkey") % 10 === 5 && col("o_orderkey") < 70000000L).count() === 0)
    // only one data commit beyond the bulk insert
    assert(t.timeline.completedDataInstants().size === 2)
    snap.unpersist()
  }

  test("applyCdc on MOR routes changes through delta files") {
    val dir = tmpDir("cdc_mor")
    val t = GraftTable.create(spark, dir.toString,
      ordersCfg(TableType.MergeOnRead, Map("graft.compact.inline" -> "false")))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    // disjoint update/delete key sets: a key carrying both a U and a D in
    // one batch ties on precombine and the winner is unspecified
    val updKeys = col("o_orderkey") % 6 === 0
    val delKeys = col("o_orderkey") % 6 =!= 0 && col("o_orderkey") % 7 === 3
    val cdc = src.filter(updKeys)
      .withColumn("o_totalprice", lit(666.0)).withColumn("Op", lit("U"))
      .unionByName(src.filter(delKeys).withColumn("Op", lit("delete")))
    t.applyCdc(cdc)
    val snap = Readers.snapshot(t)
    val expect = src.count() - src.filter(delKeys).count()
    assert(snap.count() === expect)
    assert(snap.filter(col("o_totalprice") === 666.0).count() ===
      src.filter(updKeys).count())
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty))
  }

  test("cluster with RecentPartitions only rewrites the newest partitions") {
    val dir = tmpDir("cluster_recent")
    val t = GraftTable.create(spark, dir.toString,
      ordersCfg(props = Map(ConfigKeys.MaxFileSize -> (64L * 1024).toString)))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    // two loads with disjoint keys ⇒ two file groups per partition
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0))
    val before = t.view.fileSlices(None).groupBy(_.partitionPath).view.mapValues(_.size).toMap
    val allParts = before.keys.toSeq.sorted
    val recent = allParts.takeRight(2).toSet
    assert(Services.cluster(t, sortColumns = Seq("o_orderkey"),
      strategy = Services.ClusterPlanStrategy.RecentPartitions(2)).nonEmpty)
    val after = t.view.fileSlices(None).groupBy(_.partitionPath).view.mapValues(_.size).toMap
    allParts.filterNot(recent.contains).foreach { p =>
      assert(after(p) === before(p), s"old partition $p must be untouched")
    }
    assert(recent.exists(p => after(p) < before(p)), "recent partitions should consolidate")
    assert(Readers.snapshot(t).count() === src.count())
  }
}
