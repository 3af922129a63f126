package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.pipeline.{AudioHash, HashDedupService, ImageHash}
import graft.read.Readers
import graft.table.GraftTable

/** Incremental 64-bit-hash dedup service (pHash/audio-fingerprint): the
  * banded-index probe must veto near-dups ACROSS ticks, unchanged sources
  * must be no-ops, rollbacks must wipe ghost postings, and rows the
  * extractor cannot hash must pass through unharmed.
  */
class HashDedupServiceSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def cfg(name: String) =
    TableConfig(name, TableType.CopyOnWrite, Seq("doc_id"), "", "")

  private val imageHash: DataFrame => DataFrame = df =>
    ImageHash.phashImages(ImageHash.withSyntheticPng(df, fams = 8))
      .withColumnRenamed("phash", "hash")

  private def ids(n: Int) = spark.range(n).select(col("id").as("doc_id"))

  test("two ticks converge to family minima; cross-tick copies vetoed") {
    val root = tmpDir("hash_svc").toString
    val srcT = GraftTable.create(spark, s"$root/source", cfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", cfg("clean"))
    val idx = HashDedupService.openIndex(spark, s"$root/index")
    // tick 1: ids 0..47 (families 0..7 whole, all variants)
    srcT.bulkInsert(ids(48))
    assert(HashDedupService.sync(srcT, cleanT, idx, imageHash).nonEmpty)
    val t1 = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
    assert(t1 === (0L until 8L).toSet, s"tick 1 kept $t1")
    // no new commits: no-op
    assert(HashDedupService.sync(srcT, cleanT, idx, imageHash).isEmpty)
    // tick 2: ids 48..95 — every image repeats a family already indexed,
    // so the persisted index must veto ALL of them
    srcT.upsert(spark.range(48, 96).select(col("id").as("doc_id")))
    assert(HashDedupService.sync(srcT, cleanT, idx, imageHash).nonEmpty)
    val t2 = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
    assert(t2 === t1, s"cross-tick near-dups survived: ${t2 -- t1}")
  }

  test("audio extractor through the same service") {
    val root = tmpDir("hash_svc_a").toString
    val srcT = GraftTable.create(spark, s"$root/source", cfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", cfg("clean"))
    val idx = HashDedupService.openIndex(spark, s"$root/index")
    val audioHash: DataFrame => DataFrame = df =>
      AudioHash.fingerprintAudio(AudioHash.withSyntheticWav(df, fams = 6))
        .withColumnRenamed("afp", "hash")
    srcT.bulkInsert(ids(36))
    HashDedupService.sync(srcT, cleanT, idx, audioHash)
    assert(Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
      === (0L until 6L).toSet)
  }

  test("source rollback wipes ghost postings and rebuilds") {
    val root = tmpDir("hash_svc_rb").toString
    val srcT = GraftTable.create(spark, s"$root/source", cfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", cfg("clean"))
    val idx = HashDedupService.openIndex(spark, s"$root/index")
    srcT.bulkInsert(ids(16))
    HashDedupService.sync(srcT, cleanT, idx, imageHash)
    val c2 = srcT.upsert(spark.range(100, 116).select(col("id").as("doc_id")))
    HashDedupService.sync(srcT, cleanT, idx, imageHash)
    graft.table.Services.rollback(srcT, c2)
    assert(HashDedupService.sync(srcT, cleanT, idx, imageHash).nonEmpty)
    val cleaned = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
    assert(cleaned.forall(_ < 100L), "rolled-back docs linger in clean")
    assert(cleaned === (0L until 8L).toSet)
    // steady state: next tick is a no-op
    assert(HashDedupService.sync(srcT, cleanT, idx, imageHash).isEmpty)
  }

  test("rows the extractor cannot hash are kept and not indexed") {
    val root = tmpDir("hash_svc_u").toString
    val srcT = GraftTable.create(spark, s"$root/source", cfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", cfg("clean"))
    val idx = HashDedupService.openIndex(spark, s"$root/index")
    // extractor: real decode over a binary column where odd ids carry
    // garbage bytes — those rows produce NO hash row
    val withBytes: DataFrame => DataFrame = df => {
      val blobs = df.select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          // even ids: one shared real image → dedup among themselves
          lit(ImageHash.syntheticPng(0L, 1)))
          .otherwise(lit("not an image".getBytes)).as("content"))
      ImageHash.phashImages(blobs).withColumnRenamed("phash", "hash")
    }
    srcT.bulkInsert(ids(10))
    HashDedupService.sync(srcT, cleanT, idx, withBytes)
    val kept = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
    // evens collapse to 0; odds (unhashable) all pass through
    assert(kept === Set(0L, 1L, 3L, 5L, 7L, 9L), s"got $kept")
  }
}
