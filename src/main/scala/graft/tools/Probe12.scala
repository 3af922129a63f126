package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{ConfigKeys, TableConfig, TableType}
import graft.pipeline.DedupService
import graft.read.Readers
import graft.table.{GraftTable, Payload, WritePipeline}

/** Round-7 plan/shuffle audit for the new code paths:
  *  - EVENT_TIME upsert must keep the fused single-exchange merged write
  *    (same as OVERWRITE_LATEST — only the sort order differs);
  *  - PARTIAL_UPDATE pays exactly ONE extra exchange (per-key column
  *    frames) — shuffle volume stays O(touched groups);
  *  - DedupService's index probe must SCAN ONLY the probed bucket
  *    partitions (file-count assertion on the pruned snapshot).
  * Shuffle audit is by stage counting per op (stages ≈ exchanges + 1).
  */
object Probe12 {
  @volatile private var stages = 0
  @volatile private var shuffleRead = 0L

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      }
    })
    def audit[A](name: String)(f: => A): A = {
      Thread.sleep(300) // let listener events drain between ops
      val (s0, r0) = (stages, shuffleRead)
      val t0 = System.nanoTime()
      val res = f
      Thread.sleep(300)
      println(f"PROBE12 $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"stages=${stages - s0}%3d shuffleReadMB=${(shuffleRead - r0) / 1e6}%8.1f")
      res
    }

    val orders = spark.read.parquet(s"$d/orders.parquet")
    def mk(name: String, payload: String, pc: String): GraftTable = {
      val p = s"/tmp/graft_p12/$name"
      WritePipeline.deleteRecursively(java.nio.file.Paths.get(p))
      GraftTable.create(spark, p, TableConfig("p12", TableType.CopyOnWrite,
        Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", pc,
        Map(ConfigKeys.Payload -> payload)))
    }

    val base = mk("base", Payload.OverwriteLatest, "o_orderdate")
    audit("bulk_insert (warm)")(base.bulkInsert(orders))
    audit("upsert OVERWRITE_LATEST")(base.upsert(
      orders.filter(col("o_orderkey") % 7 === 0).withColumn("o_totalprice", lit(1.0))))

    val evt = mk("evt", Payload.EventTime, "o_totalprice")
    audit("bulk_insert evt")(evt.bulkInsert(orders))
    audit("upsert EVENT_TIME")(evt.upsert(
      orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)))

    val par = mk("par", Payload.PartialUpdate, "")
    audit("bulk_insert par")(par.bulkInsert(orders))
    audit("upsert PARTIAL_UPDATE")(par.upsert(
      orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit(null).cast("string"))))

    // MOR compaction: merge fused into the write exchange — expect the
    // same stage shape as a merged write (one shuffle of compacted bytes)
    val mor = {
      val p = "/tmp/graft_p12/mor"
      WritePipeline.deleteRecursively(java.nio.file.Paths.get(p))
      GraftTable.create(spark, p, TableConfig("p12m", TableType.MergeOnRead,
        Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate",
        Map("graft.compact.inline" -> "false")))
    }
    mor.bulkInsert(orders)
    mor.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    audit("mor compaction (fused)")(graft.table.Services.compact(mor))

    // DedupService probe pruning: after one tick, probe a single doc and
    // count files the pruned bands snapshot lists vs the full snapshot
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val root = "/tmp/graft_p12/dedup"
    WritePipeline.deleteRecursively(java.nio.file.Paths.get(root))
    val srcT = GraftTable.create(spark, s"$root/src",
      TableConfig("src", TableType.CopyOnWrite, Seq("doc_id"), "", ""))
    val cleanT = GraftTable.create(spark, s"$root/clean",
      TableConfig("clean", TableType.CopyOnWrite, Seq("doc_id"), "", ""))
    val idx = DedupService.openIndex(spark, s"$root/idx", threshold = 0.6)
    srcT.bulkInsert(docs)
    audit("dedup sync tick1")(DedupService.sync(srcT, cleanT, idx))
    val allParts = idx.bands.view.fileSlices(None).map(_.partitionPath).distinct
    val prunedFiles = Readers.snapshot(idx.bands,
      partitions = Some(allParts.take(3))).inputFiles.length
    val allFiles = Readers.snapshot(idx.bands).inputFiles.length
    println(s"PROBE12 bands partitions=${allParts.size} files(all)=$allFiles " +
      s"files(3 parts)=$prunedFiles prunes=${prunedFiles < allFiles}")
    spark.stop()
  }
}
