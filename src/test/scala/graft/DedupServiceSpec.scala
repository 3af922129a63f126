package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.pipeline.{Dedup, DedupService}
import graft.read.Readers
import graft.table.GraftTable

/** Incremental MinHash dedup service: per-tick probe of the persisted
  * band index must converge to the from-scratch answer, duplicates must
  * be caught ACROSS ticks, and an unchanged source must be a no-op.
  */
class DedupServiceSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docsCfg(name: String) =
    TableConfig(name, TableType.CopyOnWrite, Seq("doc_id"), "", "")

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("three id-ordered ticks equal the from-scratch minhash dedup") {
    val root = tmpDir("dedup_svc").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DedupService.openIndex(spark, s"$root/index", threshold = 0.6)
    val base = docs
    val mx = base.agg(max("doc_id")).head.getLong(0)
    val ticks = Seq(
      base.filter(col("doc_id") <= mx / 3),
      base.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
      base.filter(col("doc_id") > 2 * mx / 3))
    for (t <- ticks) {
      srcT.bulkInsert(t)
      assert(DedupService.sync(srcT, cleanT, idx).nonEmpty)
    }
    val got = Readers.snapshot(cleanT).select("doc_id").orderBy("doc_id").collect()
    val want = Dedup.minhashDedup(base, threshold = 0.6)
      .select("doc_id").orderBy("doc_id").collect()
    assert(got.sameElements(want), "incremental != from-scratch")
    // duplicates were actually found across ticks (not all kept)
    assert(got.length < base.count())
  }

  test("unchanged source is a no-op tick; cross-tick exact copies dropped") {
    val root = tmpDir("dedup_svc2").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DedupService.openIndex(spark, s"$root/index", threshold = 0.6)
    val base = docs.filter(col("doc_id") < 100)
    srcT.bulkInsert(base)
    assert(DedupService.sync(srcT, cleanT, idx).nonEmpty)
    val n1 = Readers.snapshot(cleanT).count()
    // no new source commits -> None, clean untouched
    assert(DedupService.sync(srcT, cleanT, idx).isEmpty)
    assert(Readers.snapshot(cleanT).count() === n1)
    // tick 2: exact copies of tick-1 docs under NEW higher ids — every one
    // must be vetoed by the persisted index, none survive
    srcT.bulkInsert(base.withColumn("doc_id", col("doc_id") + 10000000L))
    assert(DedupService.sync(srcT, cleanT, idx).nonEmpty)
    assert(Readers.snapshot(cleanT).count() === n1, "cross-tick duplicates survived")
  }

  test("out-of-order arrival: indexed docs veto LOWER-id near-dups too") {
    // the r13 probe fix (mirrors HashDedupService): a late tick whose ids
    // sit BELOW already-indexed near-dups must still lose to them —
    // first-seen-wins, clean stays near-dup-free
    val root = tmpDir("dedup_svc_ooo").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DedupService.openIndex(spark, s"$root/index", threshold = 0.6)
    val base = docs.filter(col("doc_id") < 100)
    // tick 1 introduces the docs under HIGH ids
    srcT.bulkInsert(base.withColumn("doc_id", col("doc_id") + 10000000L))
    assert(DedupService.sync(srcT, cleanT, idx).nonEmpty)
    val n1 = Readers.snapshot(cleanT).count()
    // tick 2: exact copies under the ORIGINAL (lower) ids — every one is a
    // near-dup of an indexed doc and must be vetoed despite the lower id
    srcT.upsert(base)
    assert(DedupService.sync(srcT, cleanT, idx).nonEmpty)
    val after = Readers.snapshot(cleanT)
    assert(after.filter(col("doc_id") < 10000000L).count() === 0,
      "lower-id late arrivals slipped past the index probe")
    assert(after.count() === n1)
  }

  test("source rollback: ghost index postings are wiped, not matched") {
    val root = tmpDir("dedup_svc_rb").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DedupService.openIndex(spark, s"$root/index", threshold = 0.6)
    val base = docs.filter(col("doc_id") < 60)
    srcT.bulkInsert(base)
    DedupService.sync(srcT, cleanT, idx)
    // tick 2 lands copies under new ids, then rolls back — without the
    // rewind check both the clean rows AND the index postings of the
    // rolled-back docs would linger as ghosts
    val c2 = srcT.bulkInsert(base.withColumn("doc_id", col("doc_id") + 5000000L))
    DedupService.sync(srcT, cleanT, idx)
    graft.table.Services.rollback(srcT, c2)
    assert(DedupService.sync(srcT, cleanT, idx).nonEmpty)
    val cleaned = Readers.snapshot(cleanT).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(cleaned.forall(_ < 5000000L), "rolled-back docs linger in clean")
    // re-submitting one of the rolled-back copies: its original still
    // owns the content, so the copy must drop — but NOT because of a
    // ghost posting: the original doc is alive in the surviving corpus
    srcT.upsert(base.filter(col("doc_id") === cleaned.min)
      .withColumn("doc_id", col("doc_id") + 7000000L))
    DedupService.sync(srcT, cleanT, idx)
    val after = Readers.snapshot(cleanT).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after === cleaned, "copy of a live doc must still dedup away")
    // steady state: next tick is a no-op (no rebuild-per-tick)
    assert(DedupService.sync(srcT, cleanT, idx).isEmpty)
  }
}
