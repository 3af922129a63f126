package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.GraftTable
import graft.read.Readers
import graft.streaming.Streaming

class MergeStreamSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def freshTable(name: String, mor: Boolean = false) = {
    val dir = tmpDir(name)
    val cfg = TableConfig(name,
      if (mor) TableType.MergeOnRead else TableType.CopyOnWrite,
      Seq("id"), "", "ver")
    GraftTable.create(spark, dir.toString, cfg)
  }

  test("merge: update + delete + insert clauses, first-match-wins") {
    val t = freshTable("m1")
    t.bulkInsert(Seq((1L, 1L, 10.0, "keep"), (2L, 1L, 20.0, "del"), (3L, 1L, 30.0, "upd"))
      .toDF("id", "ver", "price", "tag"))
    val source = Seq((2L, 2L, 0.0, "x"), (3L, 2L, 99.0, "x"), (4L, 2L, 40.0, "new"))
      .toDF("id", "ver", "price", "tag")
    t.mergeInto(source)
      .whenMatchedDelete(Some("t.tag = 'del'"))
      .whenMatchedUpdate(None, Map("price" -> "s.price + t.price", "ver" -> "s.ver"))
      .whenNotMatchedInsert(None)
      .execute()
    val got = Readers.snapshot(t).select("id", "ver", "price", "tag").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got === Array(
      (1L, 1L, 10.0, "keep"),    // untouched (not in source)
      (3L, 2L, 129.0, "upd"),    // updated: 99 + 30; unassigned col keeps target value
      (4L, 2L, 40.0, "new")))    // inserted; id=2 deleted
  }

  test("merge: conditional insert filters source rows") {
    val t = freshTable("m2")
    t.bulkInsert(Seq((1L, 1L, 1.0, "a")).toDF("id", "ver", "price", "tag"))
    val source = Seq((5L, 1L, 5.0, "ok"), (6L, 1L, 6.0, "skip")).toDF("id", "ver", "price", "tag")
    t.mergeInto(source)
      .whenNotMatchedInsert(Some("s.tag = 'ok'"))
      .execute()
    assert(Readers.snapshot(t).count() === 2)
    assert(Readers.snapshot(t).filter($"id" === 6L).count() === 0)
  }

  test("merge on MOR table routes through delta files") {
    val t = freshTable("m3", mor = true)
    t.bulkInsert(Seq((1L, 1L, 10.0, "a"), (2L, 1L, 20.0, "b")).toDF("id", "ver", "price", "tag"))
    t.mergeInto(Seq((1L, 2L, 11.0, "a2")).toDF("id", "ver", "price", "tag"))
      .whenMatchedUpdate()
      .execute()
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty))
    val got = Readers.snapshot(t).filter($"id" === 1L).select("price").first().getDouble(0)
    assert(got === 11.0)
  }

  test("update and deleteWhere by predicate") {
    val t = freshTable("m4")
    t.bulkInsert((1L to 10L).map(i => (i, 1L, i.toDouble, "t")).toDF("id", "ver", "price", "tag"))
    t.update("price > 8", Map("tag" -> "'high'", "price" -> "price * 2"))
    val snap1 = Readers.snapshot(t)
    assert(snap1.filter($"tag" === "high").count() === 2)
    assert(snap1.filter($"price" === 20.0).count() === 1)
    t.deleteWhere("tag = 'high'")
    assert(Readers.snapshot(t).count() === 8)
  }

  test("streaming sink: batch ids make replays idempotent") {
    val t = freshTable("s1")
    val b0 = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v")
    Streaming.writeBatch(t, b0, batchId = 0)
    Streaming.writeBatch(t, Seq((1L, 2L, "a2")).toDF("id", "ver", "v"), batchId = 1)
    assert(Readers.snapshot(t).count() === 2)
    // replay of batch 1 (e.g. after driver restart) is skipped
    Streaming.writeBatch(t, Seq((1L, 9L, "BAD")).toDF("id", "ver", "v"), batchId = 1)
    val v = Readers.snapshot(t).filter($"id" === 1L).select("v").first().getString(0)
    assert(v === "a2")
    assert(Streaming.lastCommittedBatchId(t) === Some(1L))
  }

  test("real structured-streaming query through upsertSink") {
    val t = freshTable("s2")
    val ckpt = tmpDir("ckpt").toString
    val srcDir = tmpDir("stream_src")
    Seq((1L, 1L, "x"), (2L, 1L, "y")).toDF("id", "ver", "v")
      .write.mode("overwrite").parquet(srcDir.toString)
    val stream = spark.readStream
      .schema("id LONG, ver LONG, v STRING")
      .parquet(srcDir.toString)
    val q = Streaming.upsertSink(stream.writeStream, t, ckpt).start()
    q.processAllAvailable()
    q.stop()
    assert(Readers.snapshot(t).count() === 2)
  }

  test("incremental source + syncOnce pipeline (DeltaStreamer analog)") {
    val src = freshTable("p_src")
    val dst = freshTable("p_dst")
    src.bulkInsert(Seq((1L, 1L, 1.0), (2L, 1L, 2.0)).toDF("id", "ver", "price"))
    assert(Streaming.syncOnce(src, dst,
      df => df.withColumn("price", $"price" * 10)).isDefined)
    assert(Readers.snapshot(dst).orderBy("id").select("price").as[Double].collect().toSeq
      === Seq(10.0, 20.0))
    // no new commits → no-op
    assert(Streaming.syncOnce(src, dst).isEmpty)
    // upstream change flows through on next sync
    src.upsert(Seq((2L, 2L, 5.0)).toDF("id", "ver", "price"))
    assert(Streaming.syncOnce(src, dst, df => df.withColumn("price", $"price" * 10)).isDefined)
    assert(Readers.snapshot(dst).filter($"id" === 2L).select("price").first().getDouble(0) === 50.0)
  }

  test("SQL transformer + chained transforms + multi-table sync") {
    val srcA = freshTable("mt_src_a")
    val dstA = freshTable("mt_dst_a")
    val srcB = freshTable("mt_src_b")
    val dstB = freshTable("mt_dst_b")
    srcA.bulkInsert(Seq((1L, 1L, 4.0)).toDF("id", "ver", "price"))
    srcB.bulkInsert(Seq((9L, 1L, 3.0)).toDF("id", "ver", "price"))
    val sqlT = Streaming.sqlTransformer(
      "SELECT id, ver, price * 2 AS price FROM <SRC>")
    val chained = Streaming.chain(sqlT, df => df.withColumn("price", $"price" + 1))
    val results = Streaming.syncAll(Seq(
      (srcA, dstA, chained),
      (srcB, dstB, sqlT)))
    assert(results.forall(_.isDefined))
    assert(Readers.snapshot(dstA).select("price").as[Double].head() === 9.0)  // 4*2+1
    assert(Readers.snapshot(dstB).select("price").as[Double].head() === 6.0)  // 3*2
  }
}
