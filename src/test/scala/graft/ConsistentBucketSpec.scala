package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{ConsistentBuckets, GraftTable, Services}
import graft.read.Readers

/** CONSISTENT bucket engine: extendible-hash covers with single-bucket
  * split/merge (grow/shrink at O(hot bucket) cost, vs the FIXED engine's
  * full-rewrite rescale) — routing parity with the driver twin, cover
  * replay from the timeline (cache is disposable), layout-only semantics
  * for time travel/incremental, post-split routing, revival on merge,
  * the capacity services, and the refusals.
  */
class ConsistentBucketSpec extends AnyFunSuite {
  import SparkTestBase._

  private def cCfg(extra: Map[String, String] = Map.empty,
      tpe: String = TableType.CopyOnWrite, buckets: Int = 4) = TableConfig(
    tableName = "orders_cbkt",
    tableType = tpe,
    recordKeyFields = Seq("o_orderkey"),
    partitionPathExpr = "date_format(o_orderdate, 'yyyy')",
    precombineField = "o_orderdate",
    props = Map(ConfigKeys.IndexType -> "BUCKET",
      ConfigKeys.BucketIndexEngine -> "CONSISTENT",
      ConfigKeys.BucketIndexNumBuckets -> buckets.toString) ++ extra)

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  /** Rows must live in the group the driver twin routes their key to. */
  private def assertRouted(t: GraftTable): Unit = {
    val st = ConsistentBuckets.state(t)
    val placed = Readers.snapshot(t)
      .select(col(MetaCols.RecordKey), col(MetaCols.PartitionPath),
        col(MetaCols.FileName))
      .collect()
    placed.foreach { r =>
      val want = ConsistentBuckets.bucketIdOf(st, t.cfg, r.getString(1), r.getString(0))
      assert(r.getString(2).startsWith(want + "_"),
        s"key ${r.getString(0)} in ${r.getString(1)} lives in " +
          s"${r.getString(2)}, cover routes to $want")
    }
  }

  test("lifecycle parity under the initial cover; stable bktd<d>v<v> ids") {
    val dir = tmpDir("cbkt_cow")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    val src = orders
    t.bulkInsert(src)
    val updates = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(4242.0))
    val news = src.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    t.upsert(updates.unionByName(news))
    t.delete(src.filter(col("o_orderkey") % 50 === 1))

    val snap = Readers.snapshot(t).cache()
    val expected = src.count() + news.count() -
      src.filter(col("o_orderkey") % 50 === 1).count()
    assert(snap.count() === expected)
    assert(snap.filter(col("o_totalprice") === 4242.0).count() === updates.count())
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    snap.unpersist()

    val slices = t.view.fileSlices(None)
    assert(slices.forall(_.fileId.matches("bktd2v[0-3]")),
      s"unexpected ids: ${slices.map(_.fileId).distinct}")
    assertRouted(t)
  }

  test("split rewrites one bucket; parity, routing and time travel hold") {
    val dir = tmpDir("cbkt_split")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    val src = orders
    t.bulkInsert(src)
    val preSplit = t.timeline.completedInstants().last.ts

    t.splitBucket("1995", "bktd2v1")
    // parent dead, children live, only in 1995
    val slices = t.view.fileSlices(None)
    assert(!slices.exists(s => s.partitionPath == "1995" && s.fileId == "bktd2v1"))
    assert(slices.exists(s => s.partitionPath == "1995" &&
      (s.fileId == "bktd3v1" || s.fileId == "bktd3v5")))
    assert(slices.filter(_.partitionPath == "1996").forall(_.fileId.startsWith("bktd2")))

    // no rows gained/lost/moved logically
    assert(Readers.snapshot(t).count() === src.count())
    assertRouted(t)
    // time travel to before the split sees the old layout's data unchanged
    assert(Readers.timeTravel(t, preSplit).count() === src.count())
    // a layout-only rewrite: incremental from before the split is quiet
    assert(Readers.incremental(t, preSplit).isEmpty)

    // post-split writes route against the evolved cover
    t.upsert(src.filter(col("o_orderkey") % 6 === 0)
      .withColumn("o_totalprice", lit(7.0)))
    t.delete(src.filter(col("o_orderkey") % 30 === 0))
    assertRouted(t)
    val expect = src.count() - src.filter(col("o_orderkey") % 30 === 0).count()
    assert(Readers.snapshot(t).count() === expect)
    assert(!t.view.fileSlices(None)
      .exists(s => s.partitionPath == "1995" && s.fileId == "bktd2v1"),
      "a post-split write resurrected the parent group")
  }

  test("merge revives the parent id; second split nests to depth 4") {
    val dir = tmpDir("cbkt_merge")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    val src = orders
    t.bulkInsert(src)
    t.splitBucket("1995", "bktd2v1")
    t.splitBucket("1995", "bktd3v1") // nested: (3,1) -> (4,1)/(4,9)
    assertRouted(t)

    t.mergeBuckets("1995", "bktd3v1") // merge the nested pair back
    val afterNested = t.view.fileSlices(None).filter(_.partitionPath == "1995")
    assert(afterNested.exists(_.fileId == "bktd3v1"), "parent did not revive")
    assert(!afterNested.exists(s => s.fileId == "bktd4v1" || s.fileId == "bktd4v9"))
    t.mergeBuckets("1995", "bktd2v1")
    assert(t.view.fileSlices(None).filter(_.partitionPath == "1995")
      .forall(_.fileId.matches("bktd2v[0-3]")))
    assert(Readers.snapshot(t).count() === src.count())
    assertRouted(t)
  }

  test("cover cache is disposable: routing replays from the timeline") {
    val dir = tmpDir("cbkt_heal")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    val src = orders
    t.bulkInsert(src)
    t.splitBucket("1996", "bktd2v2")
    Storage.deleteIfExists(ConsistentBuckets.stateFile(t.basePath))
    // state() must replay the split from commit metadata alone
    val st = ConsistentBuckets.state(t)
    assert(st.covers.contains("1996"))
    assert(st.coverFor(t.cfg, "1996").map(_.fileId).toSet ===
      Set("bktd2v0", "bktd2v1", "bktd2v3", "bktd3v2", "bktd3v6"))
    t.upsert(src.filter(col("o_orderkey") % 11 === 0)
      .withColumn("o_totalprice", lit(1.5)))
    assertRouted(t)
  }

  test("an empty child opens lazily on first write") {
    val dir = tmpDir("cbkt_lazy")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    val src = orders
    // keys whose hash lands in bucket (2,1) AND child (3,1): mod 8 == 1
    val h = pmod(abs(xxhash64(col("o_orderkey").cast("string"))), lit(8L))
    val low = src.filter(h === 1L)
    assert(low.count() > 0)
    t.bulkInsert(low)
    t.splitBucket(low.select(date_format(col("o_orderdate"), "yyyy"))
      .first().getString(0), "bktd2v1")
    // all rows went to (3,1); (3,5) exists only in the cover
    val parts = t.view.fileSlices(None)
    assert(parts.forall(_.fileId != "bktd3v5"))
    // a mod-8==5 key now opens the empty child
    val highs = src.filter(h === 5L).limit(50)
    assert(highs.count() > 0)
    t.upsert(highs)
    assert(t.view.fileSlices(None).exists(_.fileId == "bktd3v5"))
    assertRouted(t)
  }

  test("cover replay reads the ARCHIVED timeline when the cache lags") {
    val dir = tmpDir("cbkt_arch")
    val t = GraftTable.create(spark, dir.toString, cCfg(extra = Map(
      ConfigKeys.ArchiveMinCommits -> "2",
      ConfigKeys.ArchiveMaxCommits -> "3")))
    val src = orders
    t.bulkInsert(src.filter(col("o_orderkey") % 3 =!= 0))
    t.splitBucket("1995", "bktd2v1")
    // push the split commit past the archive horizon
    (1 to 4).foreach { i =>
      t.upsert(src.filter(col("o_orderkey") % 20 === i)
        .withColumn("o_totalprice", lit(i.toDouble)))
    }
    assert(!t.timeline.completedInstants()
        .filter(_.action == graft.core.Action.ReplaceCommit)
        .exists(i => graft.core.CommitMetadata.fromJson(t.timeline.readContent(i))
          .operationType == ConsistentBuckets.OpSplit),
      "test setup: the split commit should be archived")
    assert(t.timeline.archivedInstants().nonEmpty)
    Storage.deleteIfExists(ConsistentBuckets.stateFile(t.basePath))
    val st = ConsistentBuckets.state(t)
    assert(st.coverFor(t.cfg, "1995").map(_.fileId).toSet ===
      Set("bktd2v0", "bktd3v1", "bktd3v5", "bktd2v2", "bktd2v3"),
      "archived split lost from the cover replay")
    t.upsert(src.filter(col("o_orderkey") % 3 === 0))
    assertRouted(t)
  }

  test("MOR: split compacts the bucket's deltas into child bases") {
    val dir = tmpDir("cbkt_mor")
    val t = GraftTable.create(spark, dir.toString,
      cCfg(tpe = TableType.MergeOnRead))
    val src = orders
    t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", lit(9.0)))
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty))
    val part = "1996"
    val target = t.view.fileSlices(None)
      .filter(s => s.partitionPath == part && s.deltaFiles.nonEmpty)
      .map(_.fileId).head
    t.splitBucket(part, target)
    val children = t.view.fileSlices(None)
      .filter(s => s.partitionPath == part && s.fileId.startsWith("bktd3"))
    assert(children.nonEmpty)
    assert(children.forall(_.deltaFiles.isEmpty),
      "split must fold the parent's deltas into the child bases")
    val merged = Readers.snapshot(t)
    assert(merged.count() === src.count())
    assert(merged.filter(col("o_totalprice") === 9.0).count() ===
      src.filter(col("o_orderkey") % 7 === 0).count())
    assertRouted(t)
  }

  test("capacity services: hot buckets split, cold siblings merge back") {
    val dir = tmpDir("cbkt_svc")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    val src = orders
    t.bulkInsert(src)
    val before = t.view.fileSlices(None).map(s => (s.partitionPath, s.fileId)).toSet
    // 1-byte threshold: every live group is hot
    val split = Services.splitHotBuckets(t, Some(1L))
    assert(split.toSet === before)
    assert(t.view.fileSlices(None).forall(_.fileId.startsWith("bktd3")))
    assert(Readers.snapshot(t).count() === src.count())
    assertRouted(t)
    // huge threshold: every sibling pair is cold — back to the initial cover
    val merged = Services.mergeColdBuckets(t, Some(Long.MaxValue))
    assert(merged.nonEmpty)
    val after = ConsistentBuckets.state(t)
    assert(after.covers.valuesIterator.forall(_.forall(_.d == 2)))
    assert(Readers.snapshot(t).count() === src.count())
    assertRouted(t)
    // nothing left to merge below the initial depth
    assert(Services.mergeColdBuckets(t, Some(Long.MaxValue)).isEmpty)
  }

  test("auto split: post-commit capacity management keeps pace hands-off") {
    val dir = tmpDir("cbkt_auto")
    val t = GraftTable.create(spark, dir.toString, cCfg(extra = Map(
      ConfigKeys.BucketSplitAuto -> "true",
      ConfigKeys.BucketSplitBytes -> "4096")))
    val src = orders
    t.bulkInsert(src)
    // the bulk commit's postCommit split every over-threshold bucket
    val slices = t.view.fileSlices(None)
    assert(slices.exists(s => ConsistentBuckets.Node.parse(s.fileId)
      .exists(_.d > 2)), "no bucket split automatically")
    assert(Readers.snapshot(t).count() === src.count())
    assertRouted(t)
    // subsequent writes keep converging without operator intervention
    t.upsert(src.filter(col("o_orderkey") % 9 === 0)
      .withColumn("o_totalprice", lit(3.0)))
    assert(Readers.snapshot(t).count() === src.count())
    assertRouted(t)
  }

  test("point lookup probes per-partition covers; key equality prunes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir("cbkt_lookup")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    t.bulkInsert(orders)
    t.splitBucket("1995", "bktd2v0")
    t.upsert(orders.filter(col("o_orderkey") % 500 === 0)
      .withColumn("o_totalprice", lit(7.0)))

    val got = t.lookup(Seq("500", "1000", "123", "999999999"))
    assert(got.count() === 3)
    assert(got.filter(col("o_orderkey") === 500).select("o_totalprice")
      .first().getDouble(0) === 7.0)

    def listedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.executedPlan
        .collectFirst { case f: FileSourceScanExec => f }.get
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    val all = listedFiles(Readers.snapshot(t))
    val eq = Readers.snapshot(t).filter(col("o_orderkey") === 4242L)
    assert(listedFiles(eq) < all, "key equality did not prune covers")
    assert(eq.count() === orders.filter(col("o_orderkey") === 4242).count())
    // as-of reads skip consistent-bucket pruning (covers are
    // time-varying) but stay correct
    val pre = t.timeline.completedInstants().head.ts
    val asOf = Readers.timeTravel(t, pre).filter(col("o_orderkey") === 4242L)
    assert(asOf.count() === orders.filter(col("o_orderkey") === 4242).count())
  }

  test("driver twin matches the routing expression on adversarial keys") {
    val dir = tmpDir("cbkt_parity")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    t.bulkInsert(orders.limit(100))
    t.splitBucket(t.view.fileSlices(None).head.partitionPath,
      t.view.fileSlices(None).head.fileId)
    val st = ConsistentBuckets.state(t)
    val part = t.view.fileSlices(None).head.partitionPath
    val keys = Seq("", "0", "-1", "9223372036854775807", "-9223372036854775808",
      "ключ", "日本語キー", "a,b:c/d", " weird", "442")
    import spark.implicits._
    val fromCol = keys.toDF("k")
      .withColumn("fid", ConsistentBuckets.fileIdCol(st, t.cfg, col("k"), lit(part)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      assert(ConsistentBuckets.bucketIdOf(st, t.cfg, part, k) === fromCol(k),
        s"driver/expression divergence for key '$k'")
    }
  }

  test("optimistic write racing a split conflicts loudly, retry routes anew") {
    val dir = tmpDir("cbkt_occ")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    t.bulkInsert(orders.limit(2000))
    val batch = orders.limit(200)
    t.beforeOptimisticPublish = () => {
      val s = t.view.fileSlices(None)
        .maxBy(x => (x.allFiles.map(_.sizeBytes).sum, x.partitionPath, x.fileId))
      t.splitBucket(s.partitionPath, s.fileId)
    }
    try {
      intercept[graft.table.WriteConflictException] {
        t.upsertOptimistic(batch.withColumn("o_totalprice", lit(2.0)))
      }
    } finally t.beforeOptimisticPublish = () => ()
    // the failed write left no trace; a retry routes against the evolved
    // cover and lands
    val t2 = GraftTable.load(spark, dir.toString)
    t2.upsertOptimistic(batch.withColumn("o_totalprice", lit(2.0)))
    assert(Readers.snapshot(t2).filter(col("o_totalprice") === 2.0).count()
      === batch.count())
    assertRouted(t2)
  }

  test("refusals: rescale, non-power-of-two, bad targets") {
    val dir = tmpDir("cbkt_refuse")
    val t = GraftTable.create(spark, dir.toString, cCfg())
    t.bulkInsert(orders.limit(500))
    intercept[IllegalArgumentException] { t.rescaleBuckets(8) }
    intercept[IllegalArgumentException] { t.splitBucket("1995", "not-a-bucket") }
    intercept[IllegalArgumentException] { t.splitBucket("1995", "bktd2v9") }
    intercept[IllegalArgumentException] { t.mergeBuckets("1995", "bktd2v1") }

    val bad = GraftTable.create(spark, tmpDir("cbkt_pow2").toString,
      cCfg(buckets = 6))
    intercept[IllegalArgumentException] { bad.bulkInsert(orders.limit(10)) }
  }
}
