package graft.tools

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.pipeline.Dedup
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

/** Scale-linearity stress (dev tool): replicates the sf0.1 inputs N× (default
  * 10×, ~1.5M orders / ~50k documents) with shifted keys and times the
  * bench-headline operators at 1× and N×. An operator whose N× time grows
  * by much more than N has a super-linear term (pair explosion, driver
  * materialization, single-task funnel) that would be fatal at 100 TB —
  * this harness is how those are caught before the data is big.
  *
  * The duplicated documents are byte-identical 10-way clusters, which is the
  * adversarial case for the near-dup operators: every cluster contributes
  * C(10,2)=45 candidate pairs in every matching band, so candidate-pair
  * dedup before verification (and any-hit short-circuits) get exercised at
  * their worst ratio.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(i => df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_.unionByName(_))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def report(name: String, t1: Double, tN: Double): Unit = {
      val ratio = tN / math.max(t1, 1e-9)
      val verdict = if (ratio <= mult * 1.8) "OK" else "SUPER-LINEAR"
      println(f"[stress] $name%-18s 1x=${t1}%6.2fs  ${mult}x=${tN}%7.2fs  ratio=${ratio}%5.1f  $verdict")
    }

    val orders1 = spark.read.parquet(s"$sfDir/orders.parquet")
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val ordersN = replicate(orders1, "o_orderkey", mult)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docsN = replicate(docs1, "doc_id", mult)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress] orders ${orders1.count()} -> ${ordersN.count()}, " +
      s"documents ${docs1.count()} -> ${docsN.count()}")

    def freshTable(name: String): GraftTable = {
      val p = s"/tmp/graft_stress/$name"
      WritePipeline.deleteRecursively(Paths.get(p))
      GraftTable.create(spark, p, TableConfig(
        name, TableType.CopyOnWrite,
        Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    }

    // warm the JVM on the small shapes first
    { val t = freshTable("warm"); t.bulkInsert(orders1.limit(2000)) }

    def upsertCycle(src: DataFrame, name: String): Unit = {
      val t = freshTable(name)
      t.bulkInsert(src)
      t.upsert(src.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      Readers.snapshot(t).write.mode("overwrite").format("noop").save()
    }
    report("cow_upsert_cycle", time(upsertCycle(orders1, "u1")),
      time(upsertCycle(ordersN, "uN")))

    // MOR: delta-append write + merged snapshot read (the read pays the
    // base ∪ delta window only for delta-bearing groups)
    def morCycle(src: DataFrame, name: String): Unit = {
      val p = s"/tmp/graft_stress/$name"
      WritePipeline.deleteRecursively(Paths.get(p))
      val t = GraftTable.create(spark, p, TableConfig(
        name, TableType.MergeOnRead,
        Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate",
        Map("graft.compact.inline" -> "false")))
      t.bulkInsert(src)
      t.upsert(src.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      Readers.snapshot(t).write.mode("overwrite").format("noop").save()
    }
    report("mor_upsert_cycle", time(morCycle(orders1, "m1")),
      time(morCycle(ordersN, "mN")))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    report("dedup_exact", time(noop(Dedup.exact(docs1))), time(noop(Dedup.exact(docsN))))
    report("dedup_minhash",
      time(noop(Dedup.minhashDedup(docs1, threshold = 0.6))),
      time(noop(Dedup.minhashDedup(docsN, threshold = 0.6))))
    report("dedup_simhash",
      time(noop(Dedup.simhashDedup(docs1, maxDistance = 2))),
      time(noop(Dedup.simhashDedup(docsN, maxDistance = 2))))
    // label propagation over N-way duplicate clusters: every replicated
    // doc pairs with all its copies, so components are size-N cliques
    report("dedup_clusters",
      time(noop(Dedup.minhashClusters(docs1, threshold = 0.6))),
      time(noop(Dedup.minhashClusters(docsN, threshold = 0.6))))

    // temporal ops: replicate events by offsetting user ids (entity count
    // scales; per-entity history length stays constant — the scale axis a
    // 100 TB log actually grows on)
    val events1 = graft.queries.QUtil.events(spark, sfDir)
    val eventsN = (0 until mult)
      .map(i => events1
        .withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L))
        .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L)))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    eventsN.count()
    report("sessionize",
      time(noop(graft.pipeline.Sessions.sessionStats(events1))),
      time(noop(graft.pipeline.Sessions.sessionStats(eventsN))))
    def asof(ev: DataFrame): DataFrame = {
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      graft.pipeline.AsofJoin.asofJoin(clicks, views, Seq("user_id"), "ts", "view_ts",
        Seq("view_id", "view_ts"), tieBreak = Seq("view_id"))
    }
    report("asof_join", time(noop(asof(events1))), time(noop(asof(eventsN))))
    report("sample_stratified",
      time(noop(graft.pipeline.Sampling.stratifiedSample(docs1, "source", "doc_id",
        Map("src0" -> 0.5), 0.9))),
      time(noop(graft.pipeline.Sampling.stratifiedSample(docsN, "source", "doc_id",
        Map("src0" -> 0.5), 0.9))))

    // incremental dedup: FIXED tick size against a 1x vs Nx corpus index —
    // the service's claim is per-tick cost ∝ new data, so the ratio must
    // stay well below the corpus multiplier (the probe's pruned index read
    // grows with corpus/P per touched partition, hence sublinear, not flat)
    def dedupTick(corpus: DataFrame, name: String): Double = {
      val root = s"/tmp/graft_stress/$name"
      WritePipeline.deleteRecursively(Paths.get(root))
      val dc = TableConfig("src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(spark, s"$root/src", dc)
      val cleanT = GraftTable.create(spark, s"$root/clean", dc.copy(tableName = "clean"))
      val idx = graft.pipeline.DedupService.openIndex(spark, s"$root/idx", threshold = 0.6)
      srcT.bulkInsert(corpus)
      graft.pipeline.DedupService.sync(srcT, cleanT, idx) // index build, untimed
      val tick = docs1.limit(2000).withColumn("doc_id", col("doc_id") + 900000000L)
      srcT.bulkInsert(tick)
      time(graft.pipeline.DedupService.sync(srcT, cleanT, idx))
    }
    val (dt1, dtN) = (dedupTick(docs1, "dt1"), dedupTick(docsN, "dtN"))
    val tickRatio = dtN / math.max(dt1, 1e-9)
    println(f"[stress] dedup_svc_tick     1x=${dt1}%6.2fs  ${mult}x=${dtN}%7.2fs  " +
      f"ratio=${tickRatio}%5.1f  ${if (tickRatio <= mult * 0.8) "OK (sublinear)" else "NEAR-LINEAR"}")

    println("[stress] DONE")
    spark.stop()
  }
}
