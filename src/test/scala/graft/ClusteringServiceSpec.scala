package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** Inline + async clustering triggers (reference HoodieClusteringConfig
  * inline clustering / SparkAsyncClusteringService): small file groups
  * coalesce automatically as commits accumulate, without changing data.
  */
class ClusteringServiceSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("inline clustering fires every N data commits and coalesces groups") {
    val t = GraftTable.create(spark, tmpDir("incl").toString, TableConfig(
      "incl", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate",
      Map(ConfigKeys.ClusterInline -> "true",
        ConfigKeys.ClusterInlineMaxCommits -> "2",
        ConfigKeys.ClusterSortColumns -> "o_orderkey")))
    val src = spark.read.parquet(s"$sf001/orders.parquet").cache()
    src.count()
    // two bulk loads: each opens fresh groups, so partitions fragment
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    val groupsPerPart = t.view.fileSlices(None).groupBy(_.partitionPath).map(_._2.size)
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0)) // 2nd commit ⇒ trigger
    val clustered = t.timeline.completedInstants()
      .filter(_.action == Action.ReplaceCommit)
      .filter(i => CommitMetadata.fromJson(t.timeline.readContent(i)).operationType == "cluster")
    assert(clustered.nonEmpty, "inline clustering never fired")
    // every partition coalesced to one sorted, size-targeted group
    val after = t.view.fileSlices(None).groupBy(_.partitionPath).map(_._2.size)
    assert(after.forall(_ == 1), s"groups per partition after clustering: $after")
    // data unchanged by the layout rewrite
    assert(Readers.snapshot(t).count() === src.count())
    assert(Readers.snapshot(t).groupBy("o_orderkey").count()
      .filter(col("count") > 1).count() === 0)
    src.unpersist()
  }

  test("inline clustering honors curve-layout table props (hilbert)") {
    val t = GraftTable.create(spark, tmpDir("incl_h").toString, TableConfig(
      "incl_h", TableType.CopyOnWrite, Seq("o_orderkey"), "", "o_orderdate",
      Map(ConfigKeys.ClusterInline -> "true",
        ConfigKeys.ClusterInlineMaxCommits -> "2",
        ConfigKeys.ClusterZOrderColumns -> "o_custkey,o_totalprice",
        ConfigKeys.ClusterCurve -> "hilbert",
        ConfigKeys.MaxFileSize -> (4L * 1024).toString)))
    val src = spark.read.parquet(s"$sf001/orders.parquet").cache()
    src.count()
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0)) // triggers curve cluster
    val clustered = t.timeline.completedInstants()
      .filter(_.action == Action.ReplaceCommit)
      .filter(i => CommitMetadata.fromJson(t.timeline.readContent(i)).operationType == "cluster")
    assert(clustered.nonEmpty, "inline curve clustering never fired")
    assert(Readers.snapshot(t).count() === src.count())
    // curve layout visible: per-file ranges tightened on both columns
    val bases = t.view.fileSlices(None).flatMap(_.baseFile)
    assert(bases.size > 3)
    def frac(c: String): Double = {
      val lo = bases.map(_.colMin(c).toDouble); val hi = bases.map(_.colMax(c).toDouble)
      val span = hi.max - lo.min
      bases.indices.map(i => (hi(i) - lo(i)) / math.max(1e-9, span)).sum / bases.size
    }
    assert(frac("o_custkey") < 0.6 && frac("o_totalprice") < 0.6)
    src.unpersist()
  }

  test("async clustering thread coalesces the ingest destination") {
    val srcCfg = TableConfig("acl_src", TableType.CopyOnWrite, Seq("id"), "", "ver")
    val src = GraftTable.create(spark, tmpDir("acl_src").toString, srcCfg)
    val dst = GraftTable.create(spark, tmpDir("acl_dst").toString,
      TableConfig("acl_dst", TableType.CopyOnWrite, Seq("id"), "", "ver",
        // tiny file target: upserts keep the partition fragmented so the
        // async thread has small groups to coalesce every trigger window
        Map(ConfigKeys.MaxFileSize -> (16L * 1024).toString)))
    src.bulkInsert((1L to 200L).map(i => (i, 1L)).toDF("id", "ver"))
    val ingest = new graft.streaming.Streaming.ContinuousIngest(
      src, dst, pollIntervalMs = 100L, asyncCluster = true,
      clusterEveryCommits = 2).start()
    try {
      (2L to 4L).foreach { v =>
        src.upsert((1L to 200L).filter(_ % v == 0).map(i => (i, v)).toDF("id", "ver"))
        Thread.sleep(300L)
      }
      val deadline = System.currentTimeMillis() + 30000
      def caughtUp: Boolean =
        Readers.snapshot(dst).count() == 200 &&
          Readers.snapshot(dst).filter(col("ver") === 4L).count() ==
            (1L to 200L).count(_ % 4 == 0)
      while ((!caughtUp || ingest.clusterings.isEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(250L)
      assert(ingest.failure.isEmpty, s"ingest failed: ${ingest.failure}")
      assert(caughtUp, "continuous ingest never caught up")
      assert(ingest.clusterings.nonEmpty, "async clustering never ran")
    } finally ingest.stop()
    // destination still equals source exactly after layout rewrites
    val a = Readers.snapshot(src).select("id", "ver").orderBy("id").collect()
    val b = Readers.snapshot(dst).select("id", "ver").orderBy("id").collect()
    assert(a.sameElements(b))
  }
}
