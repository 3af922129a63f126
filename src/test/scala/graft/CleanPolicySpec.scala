package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.table.{GraftTable, Services}
import graft.table.Services.CleanPolicy._

class CleanPolicySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def rows(n: Int) =
    (1 to n).map(i => (i.toLong, 1L, i * 1.0)).toDF("id", "ver", "price")

  private def baseFileCount(t: GraftTable): Int =
    t.view.allEntries().entries.count(!_.isDelta)

  private def mkTable(name: String): GraftTable = {
    val dir = tmpDir(name).toString + "/t"
    GraftTable.create(spark, dir, TableConfig(
      name, TableType.CopyOnWrite, Seq("id"), "", "ver"))
  }

  test("KEEP_LATEST_FILE_VERSIONS retains exactly N base versions per group") {
    val t = mkTable("clean_v")
    t.bulkInsert(rows(100))
    t.upsert(rows(100).withColumn("price", col("price") * 2)) // v2
    t.upsert(rows(100).withColumn("price", col("price") * 3)) // v3
    assert(baseFileCount(t) >= 3)
    val cleaned = Services.cleanWith(t, KeepLatestFileVersions(1))
    assert(cleaned.isDefined)
    assert(baseFileCount(t) ===
      t.view.fileSlices(None).count(_.baseFile.nonEmpty)) // only live slices remain
    val snap = graft.read.Readers.snapshot(t)
    assert(snap.count() === 100)
    assert(snap.agg(sum("price")).first().getDouble(0) === (1 to 100).map(_ * 3.0).sum)
    // nothing further to clean: second run is a no-op
    assert(Services.cleanWith(t, KeepLatestFileVersions(1)).isEmpty)
  }

  test("KEEP_LATEST_FILE_VERSIONS spares savepointed snapshots") {
    val t = mkTable("clean_sp")
    val c1 = t.bulkInsert(rows(50))
    Services.savepoint(t, c1)
    t.upsert(rows(50).withColumn("price", col("price") * 2))
    t.upsert(rows(50).withColumn("price", col("price") * 4))
    Services.cleanWith(t, KeepLatestFileVersions(1))
    // the savepointed v1 file survived: restore to it still works
    Services.restore(t, c1)
    assert(graft.read.Readers.snapshot(t)
      .agg(sum("price")).first().getDouble(0) === (1 to 50).map(_ * 1.0).sum)
  }

  test("savepoint delete releases its protection to the cleaner") {
    val t = mkTable("clean_spdel")
    val c1 = t.bulkInsert(rows(50))
    val sp = Services.savepoint(t, c1)
    t.upsert(rows(50).withColumn("price", col("price") * 2))
    t.upsert(rows(50).withColumn("price", col("price") * 4))
    // protected: nothing from the savepointed snapshot may go
    Services.cleanWith(t, KeepLatestFileVersions(1))
    Services.deleteSavepoint(t, c1) // by savepointed commit ts
    assert(t.timeline.completedInstants()
      .count(_.action == graft.core.Action.Savepoint) === 0)
    // now a clean reclaims the old versions; the latest snapshot is whole
    Services.cleanWith(t, KeepLatestFileVersions(1))
    assert(graft.read.Readers.snapshot(t)
      .agg(sum("price")).first().getDouble(0) === (1 to 50).map(_ * 4.0).sum)
    // the v1 base files are gone: time travel to c1 can't see its data
    val v1 = graft.read.Readers.timeTravel(t, c1)
    assert(scala.util.Try(v1.count()).toOption.forall(_ < 50),
      "savepoint-protected files should have been reclaimed")
    // deleting again fails loudly
    intercept[IllegalArgumentException] { Services.deleteSavepoint(t, sp) }
  }

  test("auto-clean runs post-commit when graft.clean.automatic is set") {
    val dir = tmpDir("clean_auto").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "clean_auto", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(graft.core.ConfigKeys.AutoClean -> "true",
        graft.core.ConfigKeys.CleanerCommitsRetained -> "2")))
    t.bulkInsert(rows(30))
    (1 to 3).foreach { i =>
      t.upsert(rows(30).withColumn("price", col("price") * (i + 1)))
    }
    // no explicit Services.clean call: the commits beyond the retention
    // window must have triggered one
    val cleans = t.timeline.completedInstants()
      .count(_.action == graft.core.Action.Clean)
    assert(cleans >= 1)
    assert(graft.read.Readers.snapshot(t).count() === 30)
  }

  test("auto-clean honors graft.clean.policy = KEEP_LATEST_FILE_VERSIONS") {
    val dir = tmpDir("clean_auto_v").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "clean_auto_v", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(graft.core.ConfigKeys.AutoClean -> "true",
        graft.core.ConfigKeys.CleanPolicy -> "KEEP_LATEST_FILE_VERSIONS",
        graft.core.ConfigKeys.CleanerCommitsRetained -> "1")))
    t.bulkInsert(rows(20))
    t.upsert(rows(20).withColumn("price", col("price") * 2))
    t.upsert(rows(20).withColumn("price", col("price") * 3))
    // version budget 1: only live bases remain after the auto-cleans
    assert(baseFileCount(t) === t.view.fileSlices(None).count(_.baseFile.nonEmpty))
    assert(graft.read.Readers.snapshot(t)
      .agg(sum("price")).first().getDouble(0) === (1 to 20).map(_ * 3.0).sum)
  }

  test("KEEP_LATEST_BY_HOURS cleans strictly below the wall-clock horizon") {
    val t = mkTable("clean_h")
    t.bulkInsert(rows(40))
    t.upsert(rows(40).withColumn("price", col("price") * 2))
    val before = baseFileCount(t)
    // horizon in the past: nothing below it, clean is a no-op
    assert(Services.cleanWith(t, KeepLatestByHours(1000)).isEmpty)
    assert(baseFileCount(t) === before)
    // horizon after every commit: only the latest versions stay reachable.
    // Derived from the table's own latest instant — the JVM-global instant
    // clock may run ahead of wall time after other suites' clamp tests
    val latestMs = graft.core.InstantTime.toEpochMilli(
      t.timeline.lastCompleted().get.ts)
    assert(Services.cleanWith(t, KeepLatestByHours(0, nowMs = latestMs + 3600000L)).isDefined)
    assert(graft.read.Readers.snapshot(t).count() === 40)
    assert(baseFileCount(t) < before)
  }
}
