package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** Multi-writer chaos: several threads hammer upsertOptimistic with
  * overlapping batches, retrying on conflict. Afterwards the three read
  * paths — snapshot, incremental-from-0, and a fold of per-commit CDC
  * windows — must agree exactly: optimistic concurrency may abort and
  * retry writes, but it may never lose a published commit or let the
  * change feed drift from the table.
  */
class ConcurrencyFuzzSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("concurrent optimistic writers: snapshot == incremental == CDC fold") {
    val t = GraftTable.create(spark, tmpDir("occ_fuzz").toString, TableConfig(
      "occf", TableType.CopyOnWrite, Seq("id"), "id % 2", ""))
    val init = (1L to 40L).map(i => (i, 0L))
    t.bulkInsert(init.toDF("id", "v"))

    val threads = 4
    val rounds = 5
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    var conflicts = 0
    val futures = (0 until threads).map { th =>
      Future {
        val rnd = new Random(th)
        (1 to rounds).foreach { r =>
          val ids = rnd.shuffle((1L to 40L).toList).take(8)
          val batch = ids.map(i => (i, th * 1000L + r)).toDF("id", "v")
          var attempts = 0
          var ok = false
          while (!ok && attempts < 30) {
            try { t.upsertOptimistic(batch); ok = true }
            catch {
              case _: graft.table.WriteConflictException =>
                attempts += 1
                this.synchronized { conflicts += 1 }
            }
          }
          assert(ok, s"writer $th round $r starved after $attempts conflicts")
        }
      }
    }
    try Await.result(Future.sequence(futures), 10.minutes)
    finally pool.shutdown()

    val snap = Readers.snapshot(t).select("id", "v").as[(Long, Long)]
      .collect().toMap
    assert(snap.keySet === (1L to 40L).toSet, "keys lost or invented")

    // every published commit's effect must be visible unless a LATER
    // commit overwrote the key: incremental-from-0 is exactly that fold
    val inc = Readers.incremental(t, "0").select("id", "v").as[(Long, Long)]
      .collect().toMap
    assert(inc === snap, "incremental read drifted from snapshot")

    // CDC fold: apply each commit window's change images in order
    val commits = t.timeline.completedDataInstants().map(_.ts)
    var state = Map.empty[Long, Long]
    commits.zip("0" +: commits.init).foreach { case (ts, prev) =>
      Readers.incrementalChanges(t, prev, Some(ts))
        .select("id", "v", Readers.ChangeTypeCol)
        .as[(Long, Long, String)].collect().foreach {
          case (id, v, "insert") => state += id -> v
          case (id, v, "update_after") => state += id -> v
          case (id, _, "delete") => state -= id
          case _ => () // update_before images don't mutate
        }
    }
    assert(state === snap, "CDC fold drifted from snapshot")
    // the storm must have actually exercised the conflict path
    assert(conflicts > 0, "no conflicts observed — storm too tame to mean anything")
  }
}
