package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.pipeline.RollupService
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

class RollupServiceSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def fresh(name: String): (GraftTable, GraftTable) = {
    val base = s"/tmp/graft_rollup/$name"
    WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(base))
    val src = GraftTable.create(spark, s"$base/src", TableConfig(
      "src", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    val dst = GraftTable.create(spark, s"$base/dst", TableConfig(
      "dst", TableType.CopyOnWrite, Seq("grp"), "", ""))
    (src, dst)
  }

  private val aggs = Seq(count(lit(1)).as("n"),
    sum(col("v").cast("decimal(18,4)")).cast("double").as("total"))

  private def state(dst: GraftTable): Map[Long, (Long, Double)] =
    Readers.snapshot(dst).select("grp", "n", "total").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("sync converges through insert, update, cross-group move and delete") {
    val (src, dst) = fresh("converge")
    src.bulkInsert(Seq((1L, 10L, 1.0, 0L), (2L, 10L, 2.0, 0L), (3L, 20L, 3.0, 0L))
      .toDF("id", "grp", "v", "ver"))
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    assert(state(dst) === Map(10L -> ((2L, 3.0)), 20L -> ((1L, 3.0))))

    // update in place + MOVE id 2 from group 10 to group 20: the CDC
    // before-image must retrigger group 10 even though the after-image
    // only mentions group 20
    src.upsert(Seq((2L, 20L, 5.0, 1L)).toDF("id", "grp", "v", "ver"))
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    assert(state(dst) === Map(10L -> ((1L, 1.0)), 20L -> ((2L, 8.0))))

    // deleting a group's last row tombstones the rollup row in the SAME
    // commit that upserts the others
    src.delete(Seq((1L, 10L, 1.0, 2L)).toDF("id", "grp", "v", "ver"))
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    assert(state(dst) === Map(20L -> ((2L, 8.0))))
  }

  test("source rollback: the next tick recomputes everything once") {
    val (src, dst) = fresh("rollback")
    src.bulkInsert(Seq((1L, 10L, 1.0, 0L), (2L, 20L, 2.0, 0L))
      .toDF("id", "grp", "v", "ver"))
    RollupService.sync(src, dst, Seq("grp"), aggs)
    // this commit creates group 30 and bumps group 10, then rolls back —
    // the change feed replays only surviving commits, so without the
    // rewind check neither group would ever retrigger
    val c2 = src.upsert(Seq((3L, 30L, 30.0, 1L), (1L, 10L, 100.0, 1L))
      .toDF("id", "grp", "v", "ver"))
    RollupService.sync(src, dst, Seq("grp"), aggs)
    assert(state(dst).keySet === Set(10L, 20L, 30L))
    graft.table.Services.rollback(src, c2)
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    assert(state(dst) === Map(10L -> ((1L, 1.0)), 20L -> ((1L, 2.0))))
    // one recovery, not a rebuild-per-tick: the next tick is a no-op
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isEmpty)
    // and incremental ticks resume afterwards
    src.upsert(Seq((4L, 20L, 4.0, 2L)).toDF("id", "grp", "v", "ver"))
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    assert(state(dst) === Map(10L -> ((1L, 1.0)), 20L -> ((2L, 6.0))))
  }

  test("idle tick commits nothing; checkpoint rides the commit metadata") {
    val (src, dst) = fresh("idle")
    src.bulkInsert(Seq((1L, 1L, 1.0, 0L)).toDF("id", "grp", "v", "ver"))
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    val ckpt = RollupService.lastCheckpoint(dst)
    assert(ckpt === src.timeline.completedDataInstants().lastOption.map(_.ts))
    // no new source commits → no rollup commit, checkpoint unchanged
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isEmpty)
    assert(RollupService.lastCheckpoint(dst) === ckpt)
    assert(dst.timeline.completedDataInstants().size === 1)
  }

  test("replaying a tick after a crash-rollback converges to the same state") {
    val (src, dst) = fresh("replay")
    src.bulkInsert(Seq((1L, 1L, 1.0, 0L), (2L, 2L, 2.0, 0L)).toDF("id", "grp", "v", "ver"))
    RollupService.sync(src, dst, Seq("grp"), aggs)
    src.upsert(Seq((1L, 1L, 9.0, 1L)).toDF("id", "grp", "v", "ver"))
    val c = RollupService.sync(src, dst, Seq("grp"), aggs).get
    val want = state(dst)
    // crash after publish, restart replays from the previous checkpoint
    graft.table.Services.rollback(dst, c)
    assert(RollupService.sync(src, dst, Seq("grp"), aggs).isDefined)
    assert(state(dst) === want)
  }
}
