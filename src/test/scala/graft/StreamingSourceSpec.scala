package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** The Structured-Streaming read path: `readStream.format("graft")` as a
  * commit-offset source, end-to-end into the graft sink, and standard
  * streaming operators (watermark + window, mapGroupsWithState) on top.
  */
class StreamingSourceSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def mkSrc(name: String): GraftTable = {
    val dir = tmpDir(name)
    GraftTable.create(spark, dir.toString, TableConfig(
      name, TableType.CopyOnWrite, Seq("id"), "", "ver"))
  }

  test("continuous ingest loop with async MOR compaction (DeltaStreamer --continuous)") {
    val src = mkSrc("ci_src")
    val dst = GraftTable.create(spark, tmpDir("ci_dst").toString, TableConfig(
      "ci_dst", TableType.MergeOnRead, Seq("id"), "", "ver",
      // async service owns compaction: inline off, trigger after 2 deltas
      Map("graft.compact.inline" -> "false", ConfigKeys.CompactDeltaCommits -> "2")))
    src.bulkInsert((1L to 50L).map(i => (i, 1L)).toDF("id", "ver"))

    val ingest = new graft.streaming.Streaming.ContinuousIngest(
      src, dst, pollIntervalMs = 100L).start()
    try {
      // three more source commits while the loop runs
      (2L to 4L).foreach { v =>
        src.upsert((1L to 50L).filter(_ % v == 0).map(i => (i, v)).toDF("id", "ver"))
        Thread.sleep(400L)
      }
      val deadline = System.currentTimeMillis() + 30000
      def caughtUp: Boolean =
        graft.read.Readers.snapshot(dst).count() == 50 &&
          graft.read.Readers.snapshot(dst).filter(col("ver") === 4L).count() ==
            (1L to 50L).count(_ % 4 == 0)
      while (!caughtUp && System.currentTimeMillis() < deadline) Thread.sleep(250L)
      assert(caughtUp, "continuous ingest never caught up with the source")
      // ≥3 delta commits with trigger=2 ⇒ the async compactor must have run
      val compactDeadline = System.currentTimeMillis() + 30000
      while (ingest.compactions.isEmpty && System.currentTimeMillis() < compactDeadline)
        Thread.sleep(250L)
      assert(ingest.compactions.nonEmpty, "async compaction never ran")
      assert(ingest.commits.size >= 3)
    } finally ingest.stop()
    // post-stop: destination equals source snapshot exactly
    val a = graft.read.Readers.snapshot(src).select("id", "ver").orderBy("id").collect()
    val b = graft.read.Readers.snapshot(dst).select("id", "ver").orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("async cleaner reclaims past-horizon versions off the ingest path") {
    val src = mkSrc("cl_src")
    val dst = GraftTable.create(spark, tmpDir("cl_dst").toString, TableConfig(
      "cl_dst", TableType.CopyOnWrite, Seq("id"), "", "ver",
      // keep only 2 commits' versions so the cleaner has work quickly
      Map(ConfigKeys.CleanerCommitsRetained -> "2")))
    src.bulkInsert((1L to 40L).map(i => (i, 1L)).toDF("id", "ver"))
    val ingest = new graft.streaming.Streaming.ContinuousIngest(
      src, dst, pollIntervalMs = 100L,
      asyncClean = true, cleanEveryCommits = 3).start()
    try {
      (2L to 6L).foreach { v =>
        src.upsert((1L to 40L).map(i => (i, v)).toDF("id", "ver"))
        Thread.sleep(300L)
      }
      val deadline = System.currentTimeMillis() + 30000
      // stop() halts the loops without a drain pass — wait for BOTH the
      // clean AND full catch-up (ver 6 everywhere) before stopping, or a
      // loaded machine kills the ingest one commit behind (flaked once in
      // a full-suite run)
      def caughtUp: Boolean =
        graft.read.Readers.snapshot(dst).filter(col("ver") === 6L).count() == 40
      while ((ingest.cleans.isEmpty || !caughtUp) && ingest.failure.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(250L)
      assert(ingest.failure.isEmpty, s"ingest failed: ${ingest.failure}")
      assert(ingest.cleans.nonEmpty, "async clean never ran")
      assert(caughtUp, "ingest never caught up with the source")
    } finally ingest.stop()
    // destination still reads exactly; a clean instant is on the timeline
    val a = graft.read.Readers.snapshot(src).select("id", "ver").orderBy("id").collect()
    val b = graft.read.Readers.snapshot(dst).select("id", "ver").orderBy("id").collect()
    assert(a.sameElements(b))
    assert(dst.timeline.completedInstants().exists(_.action == Action.Clean))
  }

  test("maxCommitsPerTrigger bounds each micro-batch to N commits") {
    val t = mkSrc("rate_src")
    // 5 data commits of 10 rows each
    val c = (0 until 5).map { b =>
      t.upsert(((b * 10 + 1).toLong to (b * 10 + 10).toLong)
        .map(i => (i, 1L)).toDF("id", "ver"))
    }
    val src = new graft.streaming.GraftStreamSource(spark, t,
      Readers.snapshot(t).drop(MetaCols.All: _*).schema, maxCommitsPerTrigger = 2)
    // batch contents between offsets, via the same incremental read the
    // source wraps (getBatch's frame is streaming-flagged, not countable)
    def rows(b: String, e: String): Long =
      Readers.incremental(t, b, Some(e)).count()
    // trigger 1: offset capped at commit 2, batch = commits 1-2
    val o1 = src.getOffset.get
    assert(o1.json === c(1))
    src.getBatch(None, o1)
    assert(rows("0", o1.json) === 20)
    // trigger 2: next 2 commits
    val o2 = src.getOffset.get
    assert(o2.json === c(3))
    src.getBatch(Some(o1), o2)
    assert(rows(o1.json, o2.json) === 20)
    // trigger 3: the tail commit; then the source goes quiet
    val o3 = src.getOffset.get
    assert(o3.json === c(4))
    src.getBatch(Some(o2), o3)
    assert(rows(o2.json, o3.json) === 10)
    assert(src.getOffset.map(_.json) === Some(c(4))) // no new data: offset stable
    // restart recovery: a fresh source re-seeded by the recovery getBatch
    // continues from the checkpointed offset, not from zero
    val src2 = new graft.streaming.GraftStreamSource(spark, t,
      Readers.snapshot(t).drop(MetaCols.All: _*).schema, maxCommitsPerTrigger = 2)
    src2.getBatch(Some(o1), o2) // Spark replays the last committed batch
    t.upsert(Seq((999L, 1L)).toDF("id", "ver"))
    val o4 = src2.getOffset.get
    assert(o4.json > o3.json)
    assert(Readers.incremental(t, o3.json, Some(o4.json)).count() >= 1)
  }

  test("maxBytesPerTrigger bounds micro-batches by commit volume") {
    val t = mkSrc("rate_bytes")
    val c = (0 until 4).map { b =>
      t.upsert(((b * 10 + 1).toLong to (b * 10 + 10).toLong)
        .map(i => (i, 1L)).toDF("id", "ver"))
    }
    val perCommit = graft.core.CommitMetadata.fromJson(
      t.timeline.readContent(t.timeline.completedDataInstants().head))
      .writeStats.map(_.fileSizeInBytes).sum
    // budget for ~2 commits: triggers advance two at a time
    val src = new graft.streaming.GraftStreamSource(spark, t,
      Readers.snapshot(t).drop(MetaCols.All: _*).schema,
      maxBytesPerTrigger = perCommit * 2 + perCommit / 2)
    val o1 = src.getOffset.get
    assert(o1.json === c(1), "byte budget should admit two commits")
    src.getBatch(None, o1)
    val o2 = src.getOffset.get
    assert(o2.json === c(3))
    // a budget below one commit still admits exactly one (no stall)
    val tiny = new graft.streaming.GraftStreamSource(spark, t,
      Readers.snapshot(t).drop(MetaCols.All: _*).schema,
      maxBytesPerTrigger = 1L)
    assert(tiny.getOffset.map(_.json) === Some(c(0)))
  }

  test("readStream(graft) -> writeStream(graft): continuous table replication") {
    val src = mkSrc("ss_src")
    val dstDir = tmpDir("ss_dst")
    src.bulkInsert((1L to 20L).map(i => (i, 1L)).toDF("id", "ver"))

    val q = spark.readStream.format("graft").load(src.basePath.toString)
      .drop(MetaCols.All: _*)
      .writeStream.format("graft")
      .option("recordKeyFields", "id")
      .option("precombineField", "ver")
      .option("checkpointLocation", tmpDir("ss_ckpt").toString)
      .start(dstDir.toString)
    try {
      q.processAllAvailable()
      val dst = GraftTable.load(spark, dstDir.toString)
      assert(Readers.snapshot(dst).count() === 20)

      // new commits on the source flow through as incremental batches
      src.upsert(Seq((1L, 2L), (21L, 2L)).toDF("id", "ver"))
      q.processAllAvailable()
      val snap = Readers.snapshot(dst)
      assert(snap.count() === 21)
      assert(snap.filter($"id" === 1).select("ver").as[Long].head() === 2L)
    } finally q.stop()
  }

  test("readChangeFeed streams before/after change images per micro-batch") {
    val src = mkSrc("ss_cdc")
    src.bulkInsert((1L to 10L).map(i => (i, 1L)).toDF("id", "ver"))
    val outDir = tmpDir("ss_cdc_out").toString
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(src.basePath.toString)
      .writeStream.format("parquet")
      .option("checkpointLocation", tmpDir("ss_cdc_ckpt").toString)
      .start(outDir)
    try {
      q.processAllAvailable()
      // first batch: everything is an insert
      val b1 = spark.read.parquet(outDir)
      assert(b1.columns.toSet === Set("id", "ver", Readers.ChangeTypeCol))
      assert(b1.filter(col(Readers.ChangeTypeCol) === "insert").count() === 10)
      // a later commit streams update images + deletes, not latest states
      src.upsert(Seq((1L, 2L)).toDF("id", "ver"))
      src.delete(Seq((2L, 1L)).toDF("id", "ver"))
      q.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .filter(col(Readers.ChangeTypeCol) =!= "insert")
        .select("id", "ver", Readers.ChangeTypeCol).as[(Long, Long, String)]
        .collect().toSet
      assert(rows === Set((1L, 1L, "update_before"), (1L, 2L, "update_after"),
        (2L, 1L, "delete")))
    } finally q.stop()
  }

  test("change feed -> cdc_apply sink: replication that honors deletes") {
    val src = mkSrc("ss_repl")
    val dstDir = tmpDir("ss_repl_dst")
    src.bulkInsert((1L to 10L).map(i => (i, 1L)).toDF("id", "ver"))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(src.basePath.toString)
      .writeStream.format("graft")
      .option("operation", "cdc_apply")
      .option("recordKeyFields", "id")
      .option("precombineField", "ver")
      .option("checkpointLocation", tmpDir("ss_repl_ckpt").toString)
      .start(dstDir.toString)
    try {
      q.processAllAvailable()
      val dst = GraftTable.load(spark, dstDir.toString)
      assert(Readers.snapshot(dst).count() === 10)
      // plain incremental replication would keep id=3 forever; the change
      // feed carries the delete and the cdc_apply sink executes it
      src.upsert(Seq((1L, 2L), (11L, 1L)).toDF("id", "ver"))
      src.delete(Seq((3L, 1L)).toDF("id", "ver"))
      q.processAllAvailable()
      val rows = Readers.snapshot(dst).select("id", "ver")
        .as[(Long, Long)].collect().toMap
      assert(rows.size === 10) // 10 + 1 insert - 1 delete
      assert(!rows.contains(3L))
      assert(rows(1L) === 2L && rows(11L) === 1L)
    } finally q.stop()
  }

  test("watermarked windowed aggregation over the graft stream") {
    val src = mkSrc("ss_win")
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    src.bulkInsert((1 to 30).map(i => (i.toLong, at(i % 10), 1L)).toDF("id", "ts", "ver"))

    val agg = spark.readStream.format("graft").load(src.basePath.toString)
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("ss_win_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ss_win_out").select("n").as[Long].collect().sorted
      assert(rows.sum === 30)
      assert(rows.length === 2) // minutes 0-4 and 5-9
    } finally q.stop()
  }

  test("mapGroupsWithState sessionization over the graft stream") {
    val src = mkSrc("ss_state")
    src.bulkInsert((1 to 12).map(i => (i.toLong, (i % 3).toString, 1L)).toDF("id", "user", "ver"))

    val counts = spark.readStream.format("graft").load(src.basePath.toString)
      .selectExpr("user", "id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
    val q = counts.toDF("user", "n").writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ss_state_out").start()
    try {
      q.processAllAvailable()
      val byUser = spark.table("ss_state_out").groupBy("user").agg(max("n").as("n"))
        .as[(String, Long)].collect().toMap
      assert(byUser === Map("0" -> 4L, "1" -> 4L, "2" -> 4L))
    } finally q.stop()
  }
}
