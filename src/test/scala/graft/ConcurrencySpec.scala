package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, WriteConflictException}

/** Optimistic concurrency control: conflict detection on overlapping file
  * groups, clean retry, and non-conflicting parallel commits.
  */
class ConcurrencySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def mkTable(name: String): GraftTable = {
    val dir = tmpDir(name)
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      name, TableType.CopyOnWrite, Seq("id"), "p", "ver"))
    t.bulkInsert((1L to 40L).map(i => (i, if (i <= 20) "a" else "b", 0L)).toDF("id", "p", "ver"))
    t
  }

  test("optimistic upsert publishes when nothing conflicts") {
    val t = mkTable("occ_ok")
    t.upsertOptimistic(Seq((1L, "a", 1L)).toDF("id", "p", "ver"))
    assert(Readers.snapshot(t).filter($"id" === 1 && $"ver" === 1).count() === 1)
    assert(t.timeline.completedDataInstants().size === 2)
  }

  test("optimistic upsert detects an overlapping concurrent commit and rolls back") {
    val t = mkTable("occ_conflict")
    // while the optimistic write is in flight (after its files are
    // written, before publish), another writer commits the same keys
    t.beforeOptimisticPublish = () =>
      t.upsert(Seq((2L, "a", 7L)).toDF("id", "p", "ver"))
    try {
      intercept[WriteConflictException] {
        t.upsertOptimistic(Seq((2L, "a", 9L)).toDF("id", "p", "ver"))
      }
    } finally t.beforeOptimisticPublish = () => ()
    // the interleaved writer's value survives; the loser left no files
    val snap = Readers.snapshot(t)
    assert(snap.filter($"id" === 2).select("ver").as[Long].head() === 7L)
    assert(snap.count() === 40)
    assert(t.timeline.pendingInstants().isEmpty)
    // losing writer can simply retry
    t.upsertOptimistic(Seq((2L, "a", 9L)).toDF("id", "p", "ver"))
    assert(Readers.snapshot(t).filter($"id" === 2).select("ver").as[Long].head() === 9L)
  }

  test("non-overlapping concurrent commit does not conflict") {
    val t = mkTable("occ_disjoint")
    // concurrent writer touches partition b; optimistic writer touches a
    t.beforeOptimisticPublish = () =>
      t.upsert(Seq((30L, "b", 5L)).toDF("id", "p", "ver"))
    try t.upsertOptimistic(Seq((3L, "a", 5L)).toDF("id", "p", "ver"))
    finally t.beforeOptimisticPublish = () => ()
    val snap = Readers.snapshot(t)
    assert(snap.filter($"id" === 3).select("ver").as[Long].head() === 5L)
    assert(snap.filter($"id" === 30).select("ver").as[Long].head() === 5L)
  }
}
