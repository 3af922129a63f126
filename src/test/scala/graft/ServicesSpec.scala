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
    assert(graft.core.Storage.exists(new org.apache.hadoop.fs.Path(t.timeline.archiveDir, "archived.jsonl")))
    assert(graft.core.Storage.isDirectory(new org.apache.hadoop.fs.Path(dir.resolve(".graft").resolve("index").toString)))
    // snapshot correct after archiving (view = index snapshot + active fold)
    val snap = Readers.snapshot(t)
    assert(snap.count() === 30)
    assert(snap.agg(max("ver")).first().getLong(0) === 14L)
  }

  test("incremental read from before the archive horizon replays archived commits") {
    val dir = tmpDir("archincr")
    // clean is not inline, so archived commits' files all still exist
    val cfg = TableConfig("ai", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.ArchiveMaxCommits -> "12", ConfigKeys.ArchiveMinCommits -> "6"))
    val t = GraftTable.create(spark, dir.toString, cfg)
    t.bulkInsert((1L to 10L).map(i => (i, 0L)).toDF("id", "ver"))
    (1 to 14).foreach { k => t.upsert(Seq((100L + k, k.toLong)).toDF("id", "ver")) }
    assert(t.timeline.completedInstants().size <= 12) // archiving kicked in
    val earliest = t.timeline.earliestActiveCompleted().get
    assert(t.timeline.archivedInstants().nonEmpty)
    // from time zero: every record ever written must appear exactly once,
    // including those only reachable through the archive log
    val all = Readers.incremental(t, "0")
    assert(all.count() === 24) // 10 bulk + 14 upserted inserts
    // a range strictly inside the archived region
    val archivedData = t.timeline.archivedInstants()
      .filter { case (i, _) => Action.DataActions.contains(i.action) }
    assert(archivedData.nonEmpty && archivedData.forall(_._1.ts < earliest))
  }

  test("completed-instant publish refuses to overwrite an existing instant") {
    val dir = tmpDir("collide")
    val t = GraftTable.create(spark, dir.toString,
      TableConfig("c", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    val ts = t.upsert(Seq((1L, 1L)).toDF("id", "ver"))
    val inst = t.timeline.completedInstants().find(_.ts == ts).get
    intercept[IllegalStateException] {
      t.timeline.saveAsComplete(inst.copy(state = State.Inflight), "{}")
    }
  }

  test("instant allocation clamps above foreign timeline timestamps") {
    val dir = tmpDir("clamp")
    val t = GraftTable.create(spark, dir.toString,
      TableConfig("cl", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    // simulate another writer (skewed clock, far future) having committed
    val future = "29990101000000000"
    graft.core.Storage.writeString(
      new org.apache.hadoop.fs.Path(t.timeline.dir, s"$future.commit"),
      Json.write(CommitMetadata("upsert", Seq.empty, Map.empty, "")))
    val ts = t.upsert(Seq((1L, 1L)).toDF("id", "ver"))
    assert(ts > future, s"allocated $ts must sort after foreign $future")
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
