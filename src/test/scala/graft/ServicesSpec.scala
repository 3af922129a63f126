package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.GraftTable
import graft.read.Readers

class ServicesSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("timeline archives old instants into a files-index snapshot; reads stay correct") {
    val dir = tmpDir("arch")
    val cfg = TableConfig("a", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.ArchiveMaxCommits -> "12", ConfigKeys.ArchiveMinCommits -> "6"))
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert((1L to 30L).map(i => (i, 0L)).toDF("id", "ver"))
    (1 to 14).foreach { k =>
      t.upsert(Seq((1L + (k % 10), k.toLong)).toDF("id", "ver"))
    }
    // timeline bounded, archive log + files index exist
    assert(t.timeline.completedInstants().size <= 12)
    assert(java.nio.file.Files.exists(t.timeline.archiveDir.resolve("archived.jsonl")))
    assert(java.nio.file.Files.isDirectory(dir.resolve(".graft").resolve("index")))
    // snapshot correct after archiving (view = index snapshot + active fold)
    val snap = Readers.snapshot(t)
    assert(snap.count() === 30)
    assert(snap.agg(max("ver")).first().getLong(0) === 14L)
  }

  test("concurrent upserts serialize under the table lock, all commits land") {
    val dir = tmpDir("lock")
    val cfg = TableConfig("l", TableType.CopyOnWrite, Seq("id"), "", "ver")
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert((1L to 50L).map(i => (i, 0L)).toDF("id", "ver"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val futures = (1 to 4).map { k =>
      Future(t.upsert((1L to 50L).map(i => (i + 100L * k, k.toLong)).toDF("id", "ver")))
    }
    Await.result(Future.sequence(futures), 5.minutes)
    val snap = Readers.snapshot(t)
    assert(snap.count() === 250) // 50 base + 4*50 disjoint inserts
    assert(snap.groupBy("id").count().filter($"count" > 1).count() === 0)
    assert(t.timeline.completedDataInstants().size === 5)
  }

  test("truncate drops all rows, table remains writable") {
    val dir = tmpDir("trunc")
    val cfg = TableConfig("tr", TableType.CopyOnWrite, Seq("id"), "", "ver")
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert((1L to 20L).map(i => (i, 0L)).toDF("id", "ver"))
    t.truncate()
    assert(Readers.snapshot(t).count() === 0)
    t.upsert(Seq((1L, 5L)).toDF("id", "ver"))
    assert(Readers.snapshot(t).count() === 1)
  }
}
