package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{BucketIndex, GraftTable, Services, SortMode}
import graft.read.Readers

/** BUCKET index: fixed hash-addressed file groups per partition — write
  * parity with SIMPLE across the lifecycle, stable-id layout, group-id
  * revival through delete_partition/truncate/overwrite (the view's
  * replacement-history semantics), MOR delta routing, and the refusals
  * (clustering, bulk_insert on non-empty, METADATA_ONLY bootstrap).
  */
class BucketIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  private val Buckets = 8

  private def bCfg(extra: Map[String, String] = Map.empty,
      tpe: String = TableType.CopyOnWrite) = TableConfig(
    tableName = "orders_bkt",
    tableType = tpe,
    recordKeyFields = Seq("o_orderkey"),
    partitionPathExpr = "date_format(o_orderdate, 'yyyy')",
    precombineField = "o_orderdate",
    props = Map(ConfigKeys.IndexType -> "BUCKET",
      ConfigKeys.BucketIndexNumBuckets -> Buckets.toString) ++ extra)

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("COW lifecycle parity; every group is a stable bucket id") {
    val dir = tmpDir("bkt_cow")
    val t = GraftTable.create(spark, dir.toString, bCfg())
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

    // layout: only bucket ids, at most `Buckets` groups per partition
    val slices = t.view.fileSlices(None)
    assert(slices.forall(_.fileId.matches("bkt\\d+")), "non-bucket group id")
    slices.groupBy(_.partitionPath).foreach { case (p, ss) =>
      assert(ss.map(_.fileId).distinct.size <= Buckets, s"partition $p over-bucketed")
    }
    // rows actually live in the group their key hashes to
    val misrouted = Readers.snapshot(t)
      .withColumn("_expect", BucketIndex.fileIdCol(t.cfg, col(MetaCols.RecordKey)))
      .withColumn("_actual", substring_index(col(MetaCols.FileName), "_", 1))
      .filter(col("_expect") =!= col("_actual")).count()
    assert(misrouted === 0)
  }

  test("insert routes to buckets; duplicate keys collapse like the plain path") {
    val dir = tmpDir("bkt_insert")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.insert(orders.limit(200))
    t.insert(orders.limit(300)) // 200 overlapping keys merge, 100 new
    val snap = Readers.snapshot(t)
    assert(snap.count() === 300)
    assert(t.view.fileSlices(None).forall(_.fileId.matches("bkt\\d+")))
  }

  test("revival: delete_partition then upsert recreates the bucket's group") {
    val dir = tmpDir("bkt_revive")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders
    t.bulkInsert(src)
    val preDrop = t.timeline.completedInstants().last.ts
    t.deletePartitions(Seq("1995"))
    val in95 = src.filter(date_format(col("o_orderdate"), "yyyy") === "1995")
    assert(Readers.snapshot(t).count() === src.count() - in95.count())

    // re-insert half of 1995: buckets revive under their old ids
    val back = in95.filter(col("o_orderkey") % 2 === 0)
    t.upsert(back)
    val snap = Readers.snapshot(t)
    assert(snap.count() === src.count() - in95.count() + back.count())
    assert(snap.filter(date_format(col("o_orderdate"), "yyyy") === "1995")
      .count() === back.count())
    // pre-revival rows stay dead: none of 1995's odd keys resurface
    assert(snap.filter(date_format(col("o_orderdate"), "yyyy") === "1995")
      .filter(col("o_orderkey") % 2 === 1).count() === 0)
    // time travel before the drop still sees the full partition
    assert(Readers.snapshot(t, asOf = Some(preDrop))
      .filter(date_format(col("o_orderdate"), "yyyy") === "1995")
      .count() === in95.count())
  }

  test("revival: truncate then insert") {
    val dir = tmpDir("bkt_trunc")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.bulkInsert(orders)
    t.truncate()
    assert(Readers.snapshot(t).count() === 0)
    t.insert(orders.limit(500))
    assert(Readers.snapshot(t).count() === 500)
  }

  test("insert_overwrite: rewritten buckets shadow, missed buckets die") {
    val dir = tmpDir("bkt_iow")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders
    t.bulkInsert(src)
    val pre = t.timeline.completedInstants().last.ts
    val replacement = src.filter(year(col("o_orderdate")) === 1995)
      .filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(1.0))
    t.insertOverwrite(replacement)
    val snap = Readers.snapshot(t).cache()
    val in95 = snap.filter(date_format(col("o_orderdate"), "yyyy") === "1995")
    assert(in95.count() === replacement.count())
    assert(in95.filter(col("o_totalprice") =!= 1.0).count() === 0)
    // untouched partitions intact
    assert(snap.count() ===
      src.filter(year(col("o_orderdate")) =!= 1995).count() + replacement.count())
    snap.unpersist()
    // time travel pre-overwrite sees the original partition
    assert(Readers.snapshot(t, asOf = Some(pre))
      .filter(date_format(col("o_orderdate"), "yyyy") === "1995")
      .count() === src.filter(year(col("o_orderdate")) === 1995).count())
    // upsert after the overwrite keeps routing consistently
    val more = src.filter(year(col("o_orderdate")) === 1995)
      .filter(col("o_orderkey") % 4 === 1)
    t.upsert(more)
    assert(Readers.snapshot(t)
      .filter(date_format(col("o_orderdate"), "yyyy") === "1995")
      .count() === replacement.count() + more.count())
  }

  test("MOR: updates append deltas to live buckets, new keys open bucket bases") {
    val dir = tmpDir("bkt_mor")
    val t = GraftTable.create(spark, dir.toString,
      bCfg(Map("graft.compact.inline" -> "false"), tpe = TableType.MergeOnRead))
    val src = orders
    t.bulkInsert(src)
    val updates = src.filter(col("o_orderkey") % 9 === 0)
      .withColumn("o_totalprice", lit(7.5))
    val news = src.limit(100)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    t.upsert(updates.unionByName(news))
    t.delete(src.filter(col("o_orderkey") % 100 === 2))
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count() + 100 -
      src.filter(col("o_orderkey") % 100 === 2).count())
    assert(snap.filter(col("o_totalprice") === 7.5).count() ===
      updates.filter(col("o_orderkey") % 100 =!= 2).count())
    snap.unpersist()
    assert(t.view.fileSlices(None).forall(_.fileId.matches("bkt\\d+")))
    // deltas landed (MOR really appended); compaction folds them
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty))
    Services.compact(t)
    assert(Readers.snapshot(t).count() === src.count() + 100 -
      src.filter(col("o_orderkey") % 100 === 2).count())
  }

  test("clean reclaims the pre-revival generation, revived rows survive") {
    val dir = tmpDir("bkt_clean")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders.limit(2000)
    t.bulkInsert(src)
    t.deletePartitions(Seq("1995"))
    val back = src.filter(date_format(col("o_orderdate"), "yyyy") === "1995")
    t.upsert(back)
    // churn a few commits so the horizon passes the replacement
    for (i <- 1 to 4)
      t.upsert(src.limit(50).withColumn("o_totalprice", lit(i.toDouble)))
    val deleted = Services.cleanWith(t,
      graft.table.Services.CleanPolicy.KeepLatestFileVersions(1))
    assert(deleted.isDefined)
    val snap = Readers.snapshot(t)
    assert(snap.filter(date_format(col("o_orderdate"), "yyyy") === "1995")
      .count() === back.count())
    assert(snap.count() === src.count())
  }

  test("MERGE INTO: updates rewrite in place, inserts route to buckets") {
    val dir = tmpDir("bkt_merge")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders
    t.bulkInsert(src)
    val matched = src.filter(col("o_orderkey") % 6 === 0)
    val newRows = src.limit(150)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    t.mergeInto(matched.unionByName(newRows))
      .whenMatchedUpdate(assignments = Map("o_totalprice" -> "t.o_totalprice * 3"))
      .whenNotMatchedInsert()
      .execute()
    val snap = Readers.snapshot(t).cache()
    assert(snap.count() === src.count() + 150)
    assert(snap.filter(col("o_orderkey") % 6 === 0 && col("o_orderkey") < 100000000L)
      .count() === matched.count())
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    // the inserted rows landed in their keys' buckets, not fresh groups
    val misrouted = snap
      .withColumn("_expect", BucketIndex.fileIdCol(t.cfg, col(MetaCols.RecordKey)))
      .withColumn("_actual", substring_index(col(MetaCols.FileName), "_", 1))
      .filter(col("_expect") =!= col("_actual")).count()
    assert(misrouted === 0)
    snap.unpersist()
  }

  test("bucketIdOf matches the column expression for arbitrary keys") {
    val cfg = bCfg()
    val keys = (1 to 500).map(_.toString) ++
      Seq("", "0", "-1", "9223372036854775807", "abc", "ключ", "a b|c")
    import spark.implicits._
    val fromCol = keys.toDF("k")
      .select(col("k"), BucketIndex.fileIdCol(cfg, col("k")).as("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      assert(BucketIndex.bucketIdOf(cfg, k) === fromCol(k),
        s"driver/expression bucket divergence for key '$k'")
    }
  }

  test("point lookup reads only the keys' buckets; key equality prunes at plan time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir("bkt_lookup")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 500 === 0)
      .withColumn("o_totalprice", lit(7.0)))

    // lookup: IO bounded by the probed buckets
    val keys = Seq("500", "1000", "123", "999999999")
    val got = t.lookup(keys)
    assert(got.count() === 3)
    assert(got.filter(col("o_orderkey") === 500).select("o_totalprice")
      .first().getDouble(0) === 7.0)
    val buckets = keys.map(k => BucketIndex.bucketIdOf(t.cfg, k)).toSet
    assert(buckets.size < Buckets) // the probe is genuinely a subset
    assert(t.view.fileSlices(None).map(_.fileId).distinct.size > buckets.size)

    // plan-time: WHERE on the key field lists only that bucket's files
    def listedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.executedPlan
        .collectFirst { case f: FileSourceScanExec => f }.get
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    val all = listedFiles(Readers.snapshot(t))
    val eq = Readers.snapshot(t).filter(col("o_orderkey") === 4242L)
    assert(listedFiles(eq) < all, "key equality did not prune buckets")
    assert(eq.count() === orders.filter(col("o_orderkey") === 4242).count())
    val inq = Readers.snapshot(t).filter(col("o_orderkey").isin(4242L, 77L))
    assert(listedFiles(inq) < all)
    assert(inq.count() === orders.filter(col("o_orderkey").isin(4242L, 77L)).count())
  }

  test("optimistic concurrency: an interleaved bucket write conflicts loudly") {
    val dir = tmpDir("bkt_occ")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.bulkInsert(orders.limit(1000))
    // stable bucket ids make overlap the COMMON case: a writer publishing
    // between this writer's read point and publish touches the same
    // groups, and the conflict check must catch it
    val batch = orders.limit(100)
    t.beforeOptimisticPublish = () =>
      t.upsert(batch.withColumn("o_totalprice", lit(1.0)))
    try {
      intercept[graft.table.WriteConflictException] {
        t.upsertOptimistic(batch.withColumn("o_totalprice", lit(2.0)))
      }
    } finally t.beforeOptimisticPublish = () => ()
    // interleaved writer's value survived the loser's rollback; retry lands
    t.upsertOptimistic(batch.withColumn("o_totalprice", lit(3.0)))
    val snap = Readers.snapshot(t)
    assert(snap.filter(col("o_totalprice") === 3.0).count() === 100)
    assert(snap.count() === 1000)
  }

  test("refusals: cluster, non-empty bulk_insert, METADATA_ONLY bootstrap") {
    val dir = tmpDir("bkt_refuse")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.bulkInsert(orders.limit(100))
    intercept[IllegalArgumentException] { Services.cluster(t) }
    intercept[IllegalArgumentException] { t.bulkInsert(orders.limit(10)) }
    intercept[IllegalArgumentException] {
      GraftTable.bootstrap(spark, tmpDir("bkt_boot").toString + "/t", bCfg(),
        Seq(s"$sf001/orders.parquet"))
    }
  }

  private def misrouted(t: GraftTable): Long = Readers.snapshot(t)
    .withColumn("_expect", BucketIndex.fileIdCol(t.cfg, col(MetaCols.RecordKey)))
    .withColumn("_actual", substring_index(col(MetaCols.FileName), "_", 1))
    .filter(col("_expect") =!= col("_actual")).count()

  test("rescale grow: rows re-route, meta preserved, later writes use the new count") {
    val dir = tmpDir("bkt_grow")
    var t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders
    t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(4242.0)))
    val preRows = Readers.snapshot(t).drop(MetaCols.FileName).collect().toSet
    val preTimes = Readers.snapshot(t)
      .select(MetaCols.RecordKey, MetaCols.CommitTime).collect().toSet

    t = t.rescaleBuckets(24)
    assert(BucketIndex.numBuckets(t.cfg) === 24)
    assert(!Storage.exists(GraftTable.rescaleMarker(t.basePath)))
    // same logical rows, per-row commit times untouched (layout-only)
    assert(Readers.snapshot(t).drop(MetaCols.FileName).collect().toSet === preRows)
    assert(Readers.snapshot(t)
      .select(MetaCols.RecordKey, MetaCols.CommitTime).collect().toSet === preTimes)
    // every row lives in its NEW bucket; a reloaded handle agrees
    assert(misrouted(t) === 0)
    assert(misrouted(GraftTable.load(spark, dir.toString)) === 0)
    val slices = t.view.fileSlices(None)
    assert(slices.forall(_.fileId.matches("bkt\\d+")))
    assert(slices.map(_.fileId).distinct.size > Buckets, "rescale never fanned out")
    slices.groupBy(_.partitionPath).foreach { case (p, ss) =>
      assert(ss.map(_.fileId).distinct.size <= 24, s"partition $p over-bucketed")
    }
    // subsequent writes route by the new count
    val news = src.limit(50).withColumn("o_orderkey", col("o_orderkey") + 500000000L)
    t.upsert(news)
    assert(misrouted(t) === 0)
    assert(Readers.snapshot(t).count() === src.count() + 50)
  }

  test("rescale shrink consolidates; incremental sees no phantom change") {
    val dir = tmpDir("bkt_shrink")
    var t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders
    t.bulkInsert(src)
    val afterLoad = t.timeline.completedInstants().last.ts
    t.upsert(src.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_clerk", lit("rescaled")))
    t = t.rescaleBuckets(3)
    assert(misrouted(t) === 0)
    t.view.fileSlices(None).groupBy(_.partitionPath).foreach { case (p, ss) =>
      assert(ss.map(_.fileId).distinct.size <= 3, s"partition $p over-bucketed")
    }
    // incremental across the rescale: exactly the upsert's rows, once
    val inc = Readers.incremental(t, afterLoad)
    assert(inc.count() === src.filter(col("o_orderkey") % 7 === 0).count())
    assert(inc.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    // CDC across the rescale: the upsert's updates only, no phantom deletes
    val cdc = Readers.incrementalChanges(t, afterLoad)
    assert(cdc.filter(col(Readers.ChangeTypeCol) === "delete").count() === 0)
    assert(cdc.filter(col(Readers.ChangeTypeCol) === "update_after").count() ===
      src.filter(col("o_orderkey") % 7 === 0).count())
  }

  test("rescale refusals: non-bucket table, same count, bad count") {
    val plain = GraftTable.create(spark, tmpDir("rs_plain").toString,
      bCfg().copy(props = Map.empty))
    plain.bulkInsert(orders.limit(100))
    intercept[IllegalArgumentException] { plain.rescaleBuckets(4) }
    val t = GraftTable.create(spark, tmpDir("rs_same").toString, bCfg())
    t.bulkInsert(orders.limit(100))
    intercept[IllegalArgumentException] { t.rescaleBuckets(Buckets) }
    intercept[IllegalArgumentException] { t.rescaleBuckets(0) }
  }

  test("crash between publish and config flip heals on load") {
    val dir = tmpDir("rs_heal")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.bulkInsert(orders.limit(500))
    // a post-publish failure (callback throw) aborts rescale AFTER the
    // replacecommit lands but BEFORE the config flips — the crash window
    t.registerCommitCallback(_ => throw new RuntimeException("post-publish crash"))
    intercept[RuntimeException] { t.rescaleBuckets(16) }
    assert(Storage.exists(GraftTable.rescaleMarker(t.basePath)), "marker gone early")
    assert(TableConfig.load(t.basePath).propLong(
      ConfigKeys.BucketIndexNumBuckets, 0L) === Buckets.toLong, "config flipped early")
    // load heals: config flips to the published commit's target
    val healed = GraftTable.load(spark, dir.toString)
    assert(BucketIndex.numBuckets(healed.cfg) === 16)
    assert(!Storage.exists(GraftTable.rescaleMarker(healed.basePath)))
    assert(misrouted(healed) === 0)
    assert(Readers.snapshot(healed).count() === 500)
  }

  test("dangling marker with no published commit clears without a flip") {
    val dir = tmpDir("rs_dangle")
    val t = GraftTable.create(spark, dir.toString, bCfg())
    t.bulkInsert(orders.limit(200))
    Storage.writeString(GraftTable.rescaleMarker(t.basePath),
      graft.core.Json.write(GraftTable.RescalePending(32,
        t.timeline.completedInstants().last.ts)))
    val loaded = GraftTable.load(spark, dir.toString)
    assert(BucketIndex.numBuckets(loaded.cfg) === Buckets)
    assert(!Storage.exists(GraftTable.rescaleMarker(loaded.basePath)))
  }

  test("rollback of a rescale flips the routing count back") {
    val dir = tmpDir("rs_rb")
    var t = GraftTable.create(spark, dir.toString, bCfg())
    val src = orders.limit(600)
    t.bulkInsert(src)
    t = t.rescaleBuckets(16)
    val rescaleTs = t.timeline.completedInstants().last.ts
    Services.rollback(t, rescaleTs)
    // files reverted to the 8-bucket layout; config must agree again
    val back = GraftTable.load(spark, dir.toString)
    assert(BucketIndex.numBuckets(back.cfg) === Buckets)
    assert(misrouted(back) === 0)
    // and writes through the reloaded handle keep keys single-copied
    back.upsert(src.limit(100).withColumn("o_totalprice", lit(9.0)))
    val snap = Readers.snapshot(back)
    assert(snap.count() === 600)
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
  }

  test("a stale handle refuses to write across another writer's rescale") {
    val dir = tmpDir("rs_stale")
    val t1 = GraftTable.create(spark, dir.toString, bCfg())
    t1.bulkInsert(orders.limit(400))
    val stale = GraftTable.load(spark, dir.toString) // handle with 8 buckets
    t1.rescaleBuckets(16)
    // the stale handle would route keys by the OLD count — refused loudly
    val ex = intercept[IllegalArgumentException] {
      stale.upsert(orders.limit(50).withColumn("o_totalprice", lit(1.0)))
    }
    assert(ex.getMessage.contains("rescale"))
    // a reloaded handle writes fine and keys stay single-copied
    val fresh = GraftTable.load(spark, dir.toString)
    fresh.upsert(orders.limit(50).withColumn("o_totalprice", lit(2.0)))
    val snap = Readers.snapshot(fresh)
    assert(snap.count() === 400)
    assert(snap.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0)
    assert(misrouted(fresh) === 0)
  }

  test("MOR rescale folds deltas into the new layout") {
    val dir = tmpDir("rs_mor")
    var t = GraftTable.create(spark, dir.toString,
      bCfg(tpe = TableType.MergeOnRead))
    val src = orders
    t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(777.0)))
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty), "no deltas to fold")
    t = t.rescaleBuckets(16)
    assert(misrouted(t) === 0)
    // rescale output is a fresh base generation — no deltas survive
    assert(t.view.fileSlices(None).forall(_.deltaFiles.isEmpty))
    val snap = Readers.snapshot(t)
    assert(snap.count() === src.count())
    assert(snap.filter(col("o_totalprice") === 777.0).count() ===
      src.filter(col("o_orderkey") % 5 === 0).count())
  }
}
