package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{LeaseLock, Storage, TableConfig, TableType}
import graft.core.Storage.PathOps
import graft.table.GraftTable

class LeaseLockSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("second acquire blocks until release, then succeeds") {
    val dir = new Path(tmpDir("lease1").toString)
    val h1 = LeaseLock.acquire(dir, ttlMs = 60000L)
    val t0 = System.currentTimeMillis()
    @volatile var acquiredAt = 0L
    val t = new Thread(() => {
      val h2 = LeaseLock.acquire(dir, ttlMs = 60000L)
      acquiredAt = System.currentTimeMillis()
      h2.release()
    })
    t.start()
    Thread.sleep(300)
    assert(acquiredAt === 0L) // still held
    h1.release()
    t.join(10000)
    assert(acquiredAt >= t0 + 300)
    assert(!Storage.exists(dir.resolve("lock.lease")))
  }

  test("expired lease is taken over; live one is not") {
    val dir = new Path(tmpDir("lease2").toString)
    // a crashed holder: lease file with an expiry in the past
    Storage.write(dir.resolve("lock.lease"),
      s"dead-owner ${System.currentTimeMillis() - 5000}".getBytes(UTF_8))
    val h = LeaseLock.acquire(dir, ttlMs = 60000L, timeoutMs = 5000L)
    h.release()
    // a live holder: acquire must time out instead of stealing
    val h2 = LeaseLock.acquire(dir, ttlMs = 60000L)
    val e = intercept[IllegalStateException] {
      LeaseLock.acquire(dir, ttlMs = 60000L, timeoutMs = 400L)
    }
    assert(e.getMessage.contains("timed out"))
    h2.release()
  }

  test("heartbeat outlives the ttl of a long-held lease") {
    val dir = new Path(tmpDir("lease3").toString)
    val h = LeaseLock.acquire(dir, ttlMs = 300L)
    Thread.sleep(1200) // several ttls; heartbeat must have renewed
    val e = intercept[IllegalStateException] {
      LeaseLock.acquire(dir, ttlMs = 300L, timeoutMs = 400L)
    }
    assert(e.getMessage.contains("timed out"))
    h.release()
  }

  test("concurrent upserts on a lease-locked table all land") {
    val root = tmpDir("lease_tbl").toString + "/t"
    val t = GraftTable.create(spark, root, TableConfig(
      "lease_t", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(graft.core.ConfigKeys.LockProvider -> "lease")))
    t.bulkInsert(Seq((1L, 0L, 0.0)).toDF("id", "ver", "price"))
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        t.upsert(Seq((100L + i, 1L, i * 1.0)).toDF("id", "ver", "price"))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(graft.read.Readers.snapshot(t).count() === 5)
    assert(t.timeline.completedDataInstants().size === 5)
    assert(!Storage.exists(new Path(s"$root/.graft/lock.lease")))
  }
}
