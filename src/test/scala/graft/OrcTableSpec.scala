package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{ConfigKeys, TableConfig, TableType}
import graft.read.Readers
import graft.table.{GraftTable, Services, WritePipeline}

/** ORC base-file format (`graft.base.format=orc`) — the reference's
  * HoodieFileFormat choice (model/HoodieFileFormat.java). Base files are
  * ORC; MOR delta files stay parquet (like the reference's Avro log
  * format being independent of the base format).
  */
class OrcTableSpec extends AnyFunSuite {
  import SparkTestBase._

  private def fresh(name: String, tt: String): GraftTable = {
    val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_orc/$name")
    WritePipeline.deleteRecursively(p)
    GraftTable.create(spark, p.toString, TableConfig(
      name, tt, Seq("o_orderkey"), "year(o_orderdate)", "",
      props = Map(ConfigKeys.BaseFormat -> "orc")))
  }

  private lazy val orders = spark.read.parquet(s"$sf001/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    .cache()

  test("COW lifecycle on ORC base files") {
    val t = fresh("cow", TableType.CopyOnWrite)
    t.bulkInsert(orders)
    // disk holds .orc base files only
    val files = graft.core.Storage.walkPaths(t.basePath)
    var orc = 0; var pq = 0
    files.foreach { p =>
      val n = p.getName
      if (n.endsWith(".orc")) orc += 1
      else if (n.endsWith(".parquet") && !p.toString.contains(".graft")) pq += 1
    }
    assert(orc > 0 && pq === 0)
    // footer stats present → key-range skipping works like parquet
    assert(t.view.fileSlices(None).flatMap(_.baseFile).forall(b => b.minKey.nonEmpty))
    assert(Readers.snapshot(t).count() === orders.count())

    t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    val snap = Readers.snapshot(t)
    assert(snap.count() === orders.count())
    val doubled = snap.filter(col("o_orderkey") % 7 === 0).agg(sum("o_totalprice")).head.getDouble(0)
    val base = orders.filter(col("o_orderkey") % 7 === 0).agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(doubled - base * 2) < 1e-6)

    t.delete(orders.filter(col("o_orderkey") % 5 === 0))
    assert(Readers.snapshot(t).count() ===
      orders.filter(col("o_orderkey") % 5 =!= 0).count())
    // predicate pushdown reaches the ORC scan
    val plan = Readers.snapshot(t).filter(col("o_orderkey") === 32L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"))
  }

  test("MOR on ORC: parquet deltas over orc bases, compaction rewrites orc") {
    val t = fresh("mor", TableType.MergeOnRead)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    val slices = t.view.fileSlices(None)
    assert(slices.exists(_.deltaFiles.nonEmpty))
    assert(slices.flatMap(_.deltaFiles).forall(_.relPath.endsWith(".delta.parquet")))
    assert(slices.flatMap(_.baseFile).forall(_.relPath.endsWith(".orc")))
    // snapshot merges orc bases with parquet deltas
    val snap = Readers.snapshot(t)
    assert(snap.count() === orders.count())
    // compaction writes new ORC bases
    Services.compact(t)
    val after = t.view.fileSlices(None)
    assert(after.forall(_.deltaFiles.isEmpty))
    assert(after.flatMap(_.baseFile).forall(_.relPath.endsWith(".orc")))
    assert(Readers.snapshot(t).count() === orders.count())
  }

  test("BLOOM index builds and probes over ORC base files") {
    val p = new org.apache.hadoop.fs.Path("/tmp/graft_orc/bloom")
    WritePipeline.deleteRecursively(p)
    val t = GraftTable.create(spark, p.toString, TableConfig(
      "orcbloom", TableType.CopyOnWrite, Seq("o_orderkey"), "year(o_orderdate)", "",
      props = Map(ConfigKeys.BaseFormat -> "orc", ConfigKeys.IndexType -> "BLOOM")))
    t.bulkInsert(orders)
    // sidecars exist for every orc base file
    val bases = t.view.fileSlices(None).flatMap(_.baseFile)
    assert(bases.nonEmpty && bases.forall(_.relPath.endsWith(".orc")))
    assert(bases.forall(b => graft.core.Storage.exists(
      graft.table.BloomIndex.sidecarPath(t.basePath, b.relPath))))
    // upsert probes the sidecars (executor-side) and stays correct
    t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    val snap = Readers.snapshot(t)
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderkey") % 7 === 0)
      .filter(col("o_totalprice") === 0).count() === 0)
  }

  test("time travel and incremental over ORC") {
    val t = fresh("tt", TableType.CopyOnWrite)
    val c1 = t.bulkInsert(orders)
    val c2 = t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    val asOf = Readers.timeTravel(t, c1)
    assert(asOf.filter(col("o_totalprice") === 1.0).count() === 0)
    val inc = Readers.incremental(t, c1, Some(c2))
    assert(inc.count() === orders.filter(col("o_orderkey") % 7 === 0).count())
  }
}
