package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Compaction admin ops (reference HoodieCompactionAdminTool:
  * VALIDATE / UNSCHEDULE_PLAN) and MOR savepoint/restore.
  */
class CompactionAdminSpec extends AnyFunSuite {
  import SparkTestBase._

  private def morCfg = TableConfig(
    "mor_admin", TableType.MergeOnRead, Seq("o_orderkey"),
    "date_format(o_orderdate, 'yyyy')", "o_orderdate",
    Map("graft.compact.inline" -> "false"))

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("validate reports plan health; unschedule removes a requested plan") {
    val t = GraftTable.create(spark, tmpDir("cadmin").toString, morCfg)
    val src = orders.limit(400).cache(); src.count()
    t.bulkInsert(src)
    t.upsert(src.limit(100).withColumn("o_totalprice", lit(2.0)))
    val ts = Services.scheduleCompaction(t).get
    val v = Services.validateCompaction(t, ts)
    assert(v.filter(!col("valid")).count() === 0)
    assert(v.count() > 0)
    // unschedule removes the plan; deltas merge in a later plan instead
    Services.unscheduleCompaction(t, ts)
    assert(!t.timeline.pendingInstants().exists(_.ts == ts))
    val ts2 = Services.scheduleCompaction(t).get
    Services.runCompaction(t, ts2)
    assert(Readers.snapshot(t).filter(col("o_totalprice") === 2.0).count() === 100)
    // an executed compaction refuses unscheduling
    intercept[IllegalArgumentException](Services.unscheduleCompaction(t, ts2))
    src.unpersist()
  }

  test("validate flags a plan whose input file vanished") {
    val t = GraftTable.create(spark, tmpDir("cadmin2").toString, morCfg)
    val src = orders.limit(300).cache(); src.count()
    t.bulkInsert(src)
    t.upsert(src.limit(80).withColumn("o_totalprice", lit(2.0)))
    val ts = Services.scheduleCompaction(t).get
    val plan = Json.read[CompactionPlan](t.timeline.readRequestedContent(ts, Action.Compaction))
    val victim = plan.operations.flatMap(_.deltaFilePaths).head
    graft.core.Storage.deleteIfExists(new org.apache.hadoop.fs.Path(t.basePath, victim))
    val v = Services.validateCompaction(t, ts)
    assert(v.filter(!col("valid")).count() === 1)
    assert(v.filter(col("missing_deltas") > 0).count() === 1)
    src.unpersist()
  }

  test("admin views: cleans / rollbacks / savepoints / archived commits") {
    import graft.table.TableAdmin
    val t = GraftTable.create(spark, tmpDir("adminv").toString, TableConfig(
      "adm", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    val src = orders.limit(200).cache(); src.count()
    t.bulkInsert(src)
    val c2 = t.upsert(src.limit(50).withColumn("o_totalprice", lit(2.0)))
    t.upsert(src.limit(50).withColumn("o_totalprice", lit(3.0)))
    Services.clean(t, retainCommits = 2)
    assert(TableAdmin.cleans(t).count() >= 1)
    assert(TableAdmin.cleans(t).collect().head.getLong(2) > 0, "clean deleted nothing")
    Services.savepoint(t, c2)
    val c4 = t.upsert(src.limit(20).withColumn("o_totalprice", lit(4.0)))
    Services.rollback(t, c4)
    assert(TableAdmin.savepoints(t).collect().map(_.getString(1)).toSeq === Seq(c2))
    assert(TableAdmin.rollbacks(t).collect().exists(_.getString(2).contains(c4)))

    // archived view: separate table with tiny thresholds
    val ta = GraftTable.create(spark, tmpDir("adminv2").toString, TableConfig(
      "adm2", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate",
      Map(ConfigKeys.ArchiveMaxCommits -> "4", ConfigKeys.ArchiveMinCommits -> "3")))
    ta.bulkInsert(src)
    (2 to 6).foreach(v => ta.upsert(src.limit(10).withColumn("o_totalprice", lit(v.toDouble))))
    assert(TableAdmin.archivedCommits(ta).count() > 0,
      "no instants archived despite tiny archive thresholds")
    src.unpersist()
  }

  test("copyTable preserves file groups owned by ARCHIVED commits") {
    import graft.table.TableAdmin
    val t = GraftTable.create(spark, tmpDir("cparch").toString, TableConfig(
      "cparch", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate",
      Map(ConfigKeys.ArchiveMaxCommits -> "4", ConfigKeys.ArchiveMinCommits -> "3")))
    val src = orders.limit(300).cache(); src.count()
    t.bulkInsert(src) // owns most base files; will be archived below
    (2 to 7).foreach(v => t.upsert(src.limit(10).withColumn("o_totalprice", lit(v.toDouble))))
    assert(TableAdmin.archivedCommits(t).count() > 0, "premise: nothing archived")
    val out = tmpDir("cparch_out").toString + "/copy"
    val copy = TableAdmin.copyTable(t, out)
    val a = Readers.snapshot(t).select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    val b = Readers.snapshot(copy).select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    assert(a.length === 300)
    assert(a.sameElements(b), "copy lost file groups owned by archived commits")
    src.unpersist()
  }

  test("schemaAsOf below the archive horizon resolves the OLDEST active schema") {
    val t = GraftTable.create(spark, tmpDir("schidx").toString, TableConfig(
      "schidx", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate",
      Map(ConfigKeys.ArchiveMaxCommits -> "4", ConfigKeys.ArchiveMinCommits -> "3")))
    val src = orders.limit(100).cache(); src.count()
    val c1 = t.bulkInsert(src)
    // enough pre-evolution commits that archiving pushes c1 off while
    // pre-evolution commits SURVIVE on the active timeline
    (2 to 5).foreach(v => t.upsert(src.limit(5).withColumn("o_totalprice", lit(v.toDouble))))
    assert(t.timeline.earliestActiveCompleted().exists(_ > c1), "premise: c1 still active")
    // evolve AFTER the archive horizon moved past c1
    t.upsert(src.limit(5).withColumn("note", lit("x")))
    assert(t.latestSchema.get.fieldNames.contains("note"))
    // pinned below the horizon: the oldest surviving schema — which must
    // not include the later-added column
    val s = t.schemaAsOf(Some(c1))
    assert(s.isDefined)
    assert(!s.get.fieldNames.contains("note"),
      "pre-evolution pin leaked a column added later")
    src.unpersist()
  }

  test("MOR savepoint + restore returns the table to the pinned snapshot") {
    val t = GraftTable.create(spark, tmpDir("morsr").toString, morCfg)
    val src = orders.limit(400).cache(); src.count()
    t.bulkInsert(src)
    val c1 = t.upsert(src.limit(100).withColumn("o_totalprice", lit(2.0)))
    Services.savepoint(t, c1)
    val want = Readers.snapshot(t).select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    t.upsert(src.limit(200).withColumn("o_totalprice", lit(9.0)))
    t.delete(src.limit(40))
    Services.compact(t)
    Services.restore(t, c1)
    val got = Readers.snapshot(t).select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    assert(got.sameElements(want), "MOR restore diverged from the savepointed snapshot")
    src.unpersist()
  }
}
