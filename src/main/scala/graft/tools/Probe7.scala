package graft.tools

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

/** Round-6 profiling probe: break down t_mor_upsert / t_merge_into. */
object Probe7 {
  @volatile var jobs = 0
  @volatile var stages = 0
  @volatile var tasks = 0
  val t00: Long = System.nanoTime()

  def time[A](label: String)(f: => A): A = {
    val (j0, s0, k0) = (jobs, stages, tasks)
    val t0 = System.nanoTime()
    println(f"  --- $label begin +${(t0 - t00) / 1e9}%8.3f")
    val r = f
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
      f"jobs=${jobs - j0}%3d stages=${stages - s0}%3d tasks=${tasks - k0}%5d")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("probe7")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
        println(f"  JOB ${j.jobId}%4d start +${(System.nanoTime() - t00) / 1e9}%8.3f")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"  JOB ${j.jobId}%4d   end +${(System.nanoTime() - t00) / 1e9}%8.3f")
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    val orders = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    time("warm: orders count")(orders.count())

    def cfg(tt: String, extra: Map[String, String] = Map.empty) = TableConfig(
      tableName = "probe7", tableType = tt,
      recordKeyFields = Seq("o_orderkey"),
      partitionPathExpr = "year(o_orderdate)",
      precombineField = "", props = extra)

    // warm pass (small) then timed pass — mirrors Bench
    for (pass <- Seq("warm", "timed")) {
      val src = if (pass == "warm") orders.limit(500) else orders
      val base = Paths.get(s"/tmp/probe7_$pass")
      WritePipeline.deleteRecursively(base)

      val mor = new GraftTable(spark, base.resolve("mor"),
        cfg(TableType.MergeOnRead, Map("graft.compact.inline" -> "false")))
      time(s"[$pass] mor bulkInsert")(mor.bulkInsert(src))
      time(s"[$pass] mor upsert")(mor.upsert(src.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)))
      time(s"[$pass] mor snapshot read")(
        Readers.snapshot(mor).write.format("noop").mode("overwrite").save())

      val cow = new GraftTable(spark, base.resolve("cow"), cfg(TableType.CopyOnWrite))
      time(s"[$pass] cow bulkInsert")(cow.bulkInsert(src))
      time(s"[$pass] cow upsert")(cow.upsert(src.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)))
      time(s"[$pass] cow snapshot read")(
        Readers.snapshot(cow).write.format("noop").mode("overwrite").save())

      val mt = new GraftTable(spark, base.resolve("merge"), cfg(TableType.CopyOnWrite))
      time(s"[$pass] merge bulkInsert")(mt.bulkInsert(src))
      val updSource = src.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 0.5)
      val insSource = src.filter(col("o_orderkey") % 11 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + 50000000L)
      time(s"[$pass] merge_into")(
        mt.mergeInto(updSource.unionByName(insSource))
          .whenMatchedDelete(Some("t.o_orderkey % 6 = 0"))
          .whenMatchedUpdate(None, Map("o_totalprice" -> "s.o_totalprice"))
          .whenNotMatchedInsert(None)
          .execute())
      time(s"[$pass] merge snapshot read")(
        Readers.snapshot(mt).write.format("noop").mode("overwrite").save())
      WritePipeline.deleteRecursively(base)
    }
  }
}
