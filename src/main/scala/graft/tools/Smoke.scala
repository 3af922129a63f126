package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, Services}
import graft.read.Readers

/** End-to-end smoke driver: full COW lifecycle against the driver testdata,
  * printing observable state after each operation. Run with
  * `sbt "runMain graft.tools.Smoke /root/testdata/sf0.001 /tmp/graft_smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft_smoke"
    // every derived table dir a section creates, so reruns start clean
    Seq("", "_ds", "_bucket", "_cbucket", "_secidx", "_expridx", "_rttl",
      "_mvsrc", "_mview", "_sqladmin")
      .foreach(sfx => graft.table.WritePipeline.deleteRecursively(
        new org.apache.hadoop.fs.Path(s"$out$sfx")))

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = TableConfig("orders", TableType.CopyOnWrite,
      Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate")
    val t = GraftTable.create(spark, out, cfg)
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val n = src.count()

    val c1 = t.bulkInsert(src)
    println(s"[smoke] bulk_insert@$c1: snapshot=${Readers.snapshot(t).count()} (src=$n)")

    val upd = src.filter(col("o_orderkey") % 10 === 0).withColumn("o_totalprice", lit(7777.0))
    val c2 = t.upsert(upd)
    val snap2 = Readers.snapshot(t)
    println(s"[smoke] upsert@$c2: snapshot=${snap2.count()} updated=${snap2.filter(col("o_totalprice") === 7777.0).count()} (expect ${upd.count()})")

    val del = src.filter(col("o_orderkey") % 9 === 0)
    val c3 = t.delete(del)
    println(s"[smoke] delete@$c3: snapshot=${Readers.snapshot(t).count()} (expect ${n - del.count()})")

    println(s"[smoke] time_travel@$c1: rows=${Readers.timeTravel(t, c1).count()} price7777=${Readers.timeTravel(t, c1).filter(col("o_totalprice") === 7777.0).count()}")
    println(s"[smoke] incremental($c1,$c2]: rows=${Readers.incremental(t, c1, Some(c2)).count()}")

    val part = t.view.partitions(None).head
    t.deletePartitions(Seq(part))
    println(s"[smoke] delete_partition($part): partitions=${t.view.partitions(None).mkString(",")}")

    Services.clean(t, retainCommits = 2) match {
      case Some(ts) =>
        val md = Json.read[CleanMetadata](t.timeline.readContent(
          t.timeline.completedInstants().filter(_.action == Action.Clean).last))
        println(s"[smoke] clean@$ts: deleted=${md.deletedPaths.size} files")
      case None => println("[smoke] clean: nothing to do")
    }
    println(s"[smoke] final snapshot=${Readers.snapshot(t).count()}")
    println(s"[smoke] timeline=${t.timeline.completedInstants().map(i => i.action).mkString(",")}")

    // MERGE INTO: delete low-price, double high-price, insert new key
    val mergeSrc = Readers.snapshot(t).select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .limit(20).withColumn("o_totalprice", lit(50000.0))
      .unionByName(src.limit(1).withColumn("o_orderkey", lit(123456789L)))
    val nBefore = Readers.snapshot(t).count()
    t.mergeInto(mergeSrc)
      .whenMatchedUpdate(Some("s.o_totalprice > t.o_totalprice"), Map("o_totalprice" -> "s.o_totalprice"))
      .whenNotMatchedInsert(None)
      .execute()
    val snapM = Readers.snapshot(t)
    println(s"[smoke] merge: rows=${snapM.count()} (expect ${nBefore + 1}) updated=${snapM.filter(col("o_totalprice") === 50000.0).count()}")

    // UPDATE / DELETE by predicate
    t.update("o_totalprice = 50000.0", Map("o_orderpriority" -> "'0-URGENT'"))
    println(s"[smoke] update: urgent=${Readers.snapshot(t).filter(col("o_orderpriority") === "0-URGENT").count()}")
    t.deleteWhere("o_orderkey = 123456789")
    println(s"[smoke] deleteWhere: rows=${Readers.snapshot(t).count()} (expect $nBefore)")

    // streaming sink replay-safety
    graft.streaming.Streaming.writeBatch(t, src.limit(5).withColumn("o_orderkey", col("o_orderkey") + 700000000L), 0L)
    val afterB0 = Readers.snapshot(t).count()
    graft.streaming.Streaming.writeBatch(t, src.limit(50).withColumn("o_orderkey", col("o_orderkey") + 710000000L), 0L) // replay id=0: skipped
    println(s"[smoke] streaming: batch0=${afterB0 - nBefore} (expect 5) replay_skipped=${Readers.snapshot(t).count() == afterB0}")

    // LLM-pipeline operators over documents/embeddings testdata
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    import graft.pipeline._
    val nd = docs.count()
    val plantedDocs = docs.limit(10).withColumn("doc_id", col("doc_id") + 900000L)
    println(s"[smoke] dedup_exact: ${Dedup.exact(docs.unionByName(plantedDocs)).count()} (expect $nd)")
    val selfDeduped = Dedup.minhashDedup(docs, threshold = 0.6)
    println(s"[smoke] dedup_minhash: $nd -> ${selfDeduped.count()} docs")
    val stats = TextStats.annotate(docs.limit(100))
    println(s"[smoke] text_stats: avg_quality=${stats.agg(avg("quality")).first().getDouble(0)}")
    val q5 = embs.limit(3)
    val ann = Similarity.bruteForceTopK(embs, q5, 5)
    println(s"[smoke] ann_bruteforce: ${ann.count()} results (expect 15), max_score=${ann.agg(max("score")).first().getDouble(0)}")
    val mm = Multimodal.decodeImages(Multimodal.withFakeBinary(docs.limit(20), "doc_id"))
    println(s"[smoke] multimodal_decode: ${mm.count()} images, widths>=${mm.agg(min(col("meta.width"))).first().getInt(0)}")

    // format("graft") surface: write options route ops, read round-trips
    val dsDir = out + "_ds"
    graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(dsDir))
    src.write.format("graft")
      .option("recordKeyFields", "o_orderkey")
      .option("partitionPathExpr", "date_format(o_orderdate, 'yyyy')")
      .option("precombineField", "o_orderdate")
      .option("operation", "bulk_insert")
      .save(dsDir)
    src.limit(30).withColumn("o_totalprice", lit(1.25))
      .write.format("graft").mode("append").save(dsDir) // default op: upsert
    val dsBack = spark.read.format("graft").load(dsDir)
    println(s"[smoke] datasource: rows=${dsBack.count()} (expect ${src.count()}) upserted=${dsBack.filter(col("o_totalprice") === 1.25).count()} (expect 30)")

    // probe: reading a non-table path through the format fails cleanly
    try { spark.read.format("graft").load("/tmp/graft_not_a_table").count(); println("[smoke] datasource-missing: NO ERROR (bad)") }
    catch { case e: Throwable => println(s"[smoke] datasource-missing: ${e.getClass.getSimpleName}") }

    // SQL DML surface: UPDATE / DELETE / MERGE INTO via spark.sql
    spark.read.format("graft").option("includeMetaColumns", "false")
      .load(dsDir).createOrReplaceTempView("sql_t")
    spark.sql("UPDATE sql_t SET o_orderpriority = 'Z-SQL' WHERE o_totalprice = 1.25")
    println(s"[smoke] sql_update: z=${spark.sql("SELECT count(*) FROM sql_t WHERE o_orderpriority = 'Z-SQL'").first().getLong(0)} (expect 30)")
    spark.sql("DELETE FROM sql_t WHERE o_orderpriority = 'Z-SQL'")
    println(s"[smoke] sql_delete: remaining=${spark.sql("SELECT count(*) FROM sql_t").first().getLong(0)} (expect ${src.count() - 30})")
    spark.sql("SELECT o_orderkey AS id, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM sql_t LIMIT 5")
      .withColumn("o_orderkey", col("id") + 990000000L).drop("id")
      .createOrReplaceTempView("sql_src")
    spark.sql("MERGE INTO sql_t t USING sql_src s ON t.o_orderkey = s.o_orderkey WHEN NOT MATCHED THEN INSERT *")
    println(s"[smoke] sql_merge: rows=${spark.sql("SELECT count(*) FROM sql_t").first().getLong(0)} (expect ${src.count() - 30 + 5})")

    // CDC read: change images across the last SQL ops' window
    locally {
      val ct = GraftTable.load(spark, dsDir)
      val first = ct.timeline.completedDataInstants().head.ts
      val kinds = Readers.incrementalChanges(ct, first)
        .groupBy(Readers.ChangeTypeCol).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[smoke] cdc_changes: " +
        s"deletes=${kinds.getOrElse("delete", 0L)} (expect 30) " +
        s"inserts=${kinds.getOrElse("insert", 0L)} (expect 5)")
    }

    // metrics registry: fold of commit metadata, queryable as a frame
    locally {
      val m = graft.table.TableAdmin.metrics(t).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[smoke] metrics: commits=${m.getOrElse("orders.commit.count", -1L)} " +
        s"recordsCum=${m.getOrElse("orders.commit.totalRecordsCum", -1L)}")
    }

    // pre-commit validator: a bad batch must be refused pre-publish
    locally {
      val before = t.timeline.completedDataInstants().size
      t.registerPreCommitValidator { ctx =>
        if (ctx.newData().filter(col("o_totalprice") < 0).count() > 0)
          throw new IllegalStateException("negative price")
      }
      val refused =
        try { t.upsert(spark.read.parquet(s"$sfDir/orders.parquet").limit(5)
          .withColumn("o_totalprice", lit(-1.0))); false }
        catch { case _: IllegalStateException => true }
      println(s"[smoke] precommit_validator: refused=$refused " +
        s"commits_unchanged=${t.timeline.completedDataInstants().size == before}")
    }

    // plan inspection: does the snapshot scan push filters into parquet?
    val plan = Readers.snapshot(t).filter(col("o_totalprice") === 7777.0)
      .queryExecution.executedPlan.toString
    val pushed = plan.contains("PushedFilters: [IsNotNull(o_totalprice), EqualTo(o_totalprice,7777.0)")
    println(s"[smoke] filter_pushdown_to_parquet=$pushed")

    // bucket index: zero-IO tagging, revival through partition drop,
    // driver-derived point reads
    locally {
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val bt = GraftTable.create(spark, s"${out}_bucket", TableConfig(
        "orders_bkt", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate",
        Map(ConfigKeys.IndexType -> "BUCKET",
          ConfigKeys.BucketIndexNumBuckets -> "4")))
      bt.bulkInsert(src)
      bt.deletePartitions(Seq("1995"))
      bt.upsert(src.filter(date_format(col("o_orderdate"), "yyyy") === "1995"))
      val n = Readers.snapshot(bt).count()
      val key = src.select("o_orderkey").first().getLong(0).toString
      val hit = bt.lookup(Seq(key)).count()
      println(s"[smoke] bucket_index: snapshot=$n (expect ${src.count()}) " +
        s"lookup=$hit (expect 1)")
      // rescale: every row re-routes to the new count, same logical rows
      val rt = bt.rescaleBuckets(10)
      val rn = Readers.snapshot(rt).count()
      val buckets = rt.view.fileSlices(None).map(_.fileId).distinct.size
      println(s"[smoke] bucket_rescale: snapshot=$rn (expect ${src.count()}) " +
        s"distinct_buckets=$buckets (expect >4)")
    }

    // consistent bucket engine: grow by splitting one hot bucket (no
    // full rewrite), merge the siblings back, point-read through covers
    locally {
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val ct = GraftTable.create(spark, s"${out}_cbucket", TableConfig(
        "orders_cbkt", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate",
        Map(ConfigKeys.IndexType -> "BUCKET",
          ConfigKeys.BucketIndexEngine -> "CONSISTENT",
          ConfigKeys.BucketIndexNumBuckets -> "4")))
      ct.bulkInsert(src)
      val hot = ct.view.fileSlices(None)
        .maxBy(s => s.allFiles.map(_.sizeBytes).sum)
      ct.splitBucket(hot.partitionPath, hot.fileId)
      val sn = Readers.snapshot(ct).count()
      val key = src.select("o_orderkey").first().getLong(0).toString
      val hit = ct.lookup(Seq(key)).count()
      val merged = graft.table.Services.mergeColdBuckets(ct, Some(Long.MaxValue))
      val mn = Readers.snapshot(ct).count()
      println(s"[smoke] bucket_split: split=${hot.partitionPath}/${hot.fileId} " +
        s"snapshot=$sn (expect ${src.count()}) lookup=$hit (expect 1) " +
        s"merged=${merged.size} (expect 1) after_merge=$mn (expect ${src.count()})")
    }

    // secondary index: non-key point reads through value -> group mappings
    locally {
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val st = GraftTable.create(spark, s"${out}_secidx", TableConfig(
        "orders_sec", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate",
        Map(ConfigKeys.SecondaryIndexColumns -> "o_custkey")))
      st.bulkInsert(src)
      val ck = src.select("o_custkey").first().getLong(0).toString
      val got = st.lookupBy("o_custkey", Seq(ck)).count()
      val want = src.filter(col("o_custkey") === ck.toLong).count()
      println(s"[smoke] secondary_index: lookupBy=$got (expect $want)")
    }

    // expression index: point reads by a derived value (month bucket)
    locally {
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val xt = GraftTable.create(spark, s"${out}_expridx", TableConfig(
        "orders_xi", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate",
        Map(ConfigKeys.SecondaryIndexExpressions ->
          "om:date_format(o_orderdate, 'yyyyMM')")))
      xt.bulkInsert(src)
      val m = src.select(date_format(col("o_orderdate"), "yyyyMM").as("m"))
        .first().getString(0)
      val got = xt.lookupBy("om", Seq(m)).count()
      val want = src.filter(date_format(col("o_orderdate"), "yyyyMM") === m).count()
      println(s"[smoke] expression_index: lookupBy=$got (expect $want)")
    }

    // record TTL: rows older than keepDays behind the data watermark expire
    locally {
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val rt = GraftTable.create(spark, s"${out}_rttl", TableConfig(
        "orders_rttl", TableType.CopyOnWrite, Seq("o_orderkey"), "", "o_orderdate"))
      rt.bulkInsert(src)
      graft.table.Services.expireRecords(rt, "o_orderdate", keepDays = 365)
      val cutoff = src.agg((max(col("o_orderdate").cast("timestamp")) -
        expr("INTERVAL 365 DAY")).as("c")).first().getTimestamp(0)
      val want = src.filter(col("o_orderdate").cast("timestamp") >= lit(cutoff)).count()
      println(s"[smoke] record_ttl: snapshot=${Readers.snapshot(rt).count()} (expect $want)")
    }

    // materialized view: auto-synced incremental fold == from-scratch agg
    locally {
      import graft.table.{MaterializedView => MV}
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val mt = GraftTable.create(spark, s"${out}_mvsrc", TableConfig(
        "orders_mv", TableType.CopyOnWrite, Seq("o_orderkey"), "", "o_orderdate"))
      mt.bulkInsert(src)
      val v = MV.create(spark, s"${out}_mview", mt,
        Seq("o_orderpriority" -> "o_orderpriority"),
        Seq(MV.ViewAgg("cnt", "count", "*"),
          MV.ViewAgg("total", "sum", "o_totalprice")))
      MV.sync(v, mt)
      MV.register(v, mt)
      mt.delete(src.filter(col("o_orderkey") % 4 === 0))
      val got = MV.read(v).agg(sum(col("cnt"))).first().getLong(0)
      val want = Readers.snapshot(mt).count()
      println(s"[smoke] materialized_view: auto-synced total_cnt=$got (expect $want)")
    }

    // SQL admin surfaces: CALL procedures, table_changes TVF, DESCRIBE
    // DETAIL, and stats-answered aggregates over a fresh table
    locally {
      val src = spark.read.parquet(s"$sfDir/orders.parquet")
      val st = GraftTable.create(spark, s"${out}_sqladmin", TableConfig(
        "orders_sqladmin", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
      val c1 = st.bulkInsert(src)
      st.upsert(src.filter(col("o_orderkey") % 6 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      spark.read.format("graft").load(s"${out}_sqladmin")
        .createOrReplaceTempView("smoke_admin")
      val commits = spark.sql("CALL show_commits(table => 'smoke_admin')").count()
      val detailPartitions = spark.sql("DESCRIBE DETAIL smoke_admin")
        .first().getAs[Long]("num_partitions")
      val wantParts = src.select(date_format(col("o_orderdate"), "yyyy"))
        .distinct().count()
      val changed = spark.sql(
        s"SELECT count(*) FROM table_changes('smoke_admin', '$c1') " +
          "WHERE _change_type = 'update_after'").first().getLong(0)
      val wantChanged = src.filter(col("o_orderkey") % 6 === 0).count()
      val statsQ = spark.sql(
        "SELECT count(*) AS n, min(o_totalprice) AS lo FROM smoke_admin")
      val statsAnswered = statsQ.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined
      val n = statsQ.first().getLong(0)
      println(s"[smoke] sql_admin: commits=$commits (expect 2) " +
        s"detail_partitions=$detailPartitions (expect $wantParts) " +
        s"cdc_updates=$changed (expect $wantChanged) " +
        s"stats_answered=$statsAnswered count=$n (expect ${src.count()})")
    }
    // DSv2 catalog: CREATE + INSERT + MERGE + DROP PARTITION + TRUNCATE
    // over catalog-qualified names (round-12 surface)
    locally {
      // the warehouse lives OUTSIDE `out` (which the run wipes) — clean it
      // here so back-to-back smokes don't collide on CREATE TABLE
      graft.table.WritePipeline.deleteRecursively(
        new org.apache.hadoop.fs.Path(s"${out}_cat_wh"))
      spark.conf.set("spark.sql.catalog.smoke_cat",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.smoke_cat.warehouse", s"${out}_cat_wh")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS smoke_cat.db")
      spark.sql("""CREATE TABLE smoke_cat.db.t (id BIGINT, ver BIGINT,
        price DOUBLE, yr STRING) USING graft PARTITIONED BY (yr)
        OPTIONS (recordKeyFields 'id', precombineField 'ver')""")
      spark.sql("""INSERT INTO smoke_cat.db.t VALUES
        (1, 1, 10.0, '1995'), (2, 1, 20.0, '1996'), (3, 1, 30.0, '1996')""")
      spark.sql("""MERGE INTO smoke_cat.db.t t
        USING (SELECT 2L AS id, 2L AS ver, 99.0 AS price, '1996' AS yr) s
        ON t.id = s.id WHEN MATCHED THEN UPDATE SET *""")
      val merged = spark.sql(
        "SELECT price FROM smoke_cat.db.t WHERE id = 2").first().getDouble(0)
      spark.sql("ALTER TABLE smoke_cat.db.t DROP PARTITION (yr = '1995')")
      val afterDrop = spark.table("smoke_cat.db.t").count()
      spark.sql("TRUNCATE TABLE smoke_cat.db.t")
      val afterTruncate = spark.table("smoke_cat.db.t").count()
      println(s"[smoke] catalog: merged_price=$merged (expect 99.0) " +
        s"after_drop=$afterDrop (expect 2) after_truncate=$afterTruncate (expect 0)")
    }

    // REAL embedded Hive metastore: publish a written table through the
    // IMetaStoreClient target and read back entry + typed partitions
    locally {
      import scala.jdk.CollectionConverters._
      val msDir = s"${out}_hms"
      graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(msDir))
      val hms = graft.sql.HiveCatalogTarget.embedded(msDir)
      val tDir = s"$out/hms_t"
      spark.range(4).select(col("id"), lit(1L).as("ver"),
          concat(lit("y"), (col("id") % 2).cast("string")).as("yr"))
        .write.format("graft")
        .option("recordKeyFields", "id").option("precombineField", "ver")
        .option("partitionPathExpr", "yr").option("operation", "upsert")
        .save(tDir)
      graft.sql.CatalogSync.sync(spark, tDir, "smoke_hms", "t", target = hms)
      val entry = hms.client.getTable("smoke_hms", "t")
      val parts = hms.client.listPartitionNames("smoke_hms", "t", -1).asScala.sorted
      println(s"[smoke] metastore: external=${entry.getTableType == "EXTERNAL_TABLE"} " +
        s"(expect true) provider=${entry.getParameters.get("spark.sql.sources.provider")} " +
        s"(expect graft) partitions=${parts.mkString(",")} (expect yr=y0,yr=y1)")
    }

    // media operators: pHash/audio near-dup clustering lands every doc on
    // its family minimum; video container metadata reads back exactly
    locally {
      import graft.pipeline.{AudioHash, ImageHash, Multimodal}
      val ids = spark.range(48).select(col("id").as("doc_id"))
      val imgOk = ImageHash.phashClusters(
          ImageHash.withSyntheticPng(ids, fams = 8))
        .filter(col("cluster_id") =!= col("doc_id") % 8).count()
      val audOk = AudioHash.audioClusters(
          AudioHash.withSyntheticWav(ids, fams = 6))
        .filter(col("cluster_id") =!= col("doc_id") % 6).count()
      val vid = Multimodal.VideoCodec.videoMeta(
        Multimodal.syntheticMp4(7700, 640, 360))
      // real MJPEG-AVI pixel path: demux + JPEG decode round trip
      val avi = Multimodal.syntheticMjpegAvi(
        (0 until 3).map(i => Multimodal.syntheticJpegFrame(5L, i, 64)), 64, 64)
      val nFrames = Multimodal.videoFrames(
        spark.createDataFrame(Seq((5L, avi))).toDF("doc_id", "content"))
        .filter(f => f.width == 64 && f.height == 64).count()
      println(s"[smoke] media: image_mislabeled=$imgOk (expect 0) " +
        s"audio_mislabeled=$audOk (expect 0) " +
        s"video_meta=${vid.contains((7700L, 640, 360, 1, "isom"))} (expect true) " +
        s"video_frames=$nFrames (expect 3)")
    }
    spark.stop()
    println("[smoke] OK")
  }
}
