package graft.tools

import java.nio.file.Paths

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

/** Phase-level timing breakdown of the slow bench headliners (dev tool).
  * Prints per-phase wall time and the Spark job count each phase launched,
  * so regressions in job count (each job ≈ 0.2s scheduling at local[32])
  * are visible separately from genuine work.
  */
object PerfProbe {
  @volatile private var jobs = 0
  @volatile private var jobMillis = 0L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    val verbose = sys.env.contains("PERF_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = js.time
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobs += 1
        starts.remove(je.jobId).foreach { s =>
          jobMillis += je.time - s
          if (verbose) println(f"[job] ${je.jobId}%3d ${(je.time - s) / 1e3}%6.2fs")
        }
      }
    })

    def phase[A](name: String)(f: => A): A = {
      val (j0, m0, t0) = (jobs, jobMillis, System.nanoTime())
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[perf] $name%-28s ${dt}%6.2fs  jobs=${jobs - j0}%2d  jobTime=${(jobMillis - m0) / 1e3}%6.2fs")
      r
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def cfgFor(tt: String, props: Map[String, String] = Map.empty) = TableConfig(
      "perf", tt, Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate", props)
    def fresh(name: String, tt: String, props: Map[String, String] = Map.empty): GraftTable = {
      val p = s"/tmp/graft_perf/$name"
      WritePipeline.deleteRecursively(Paths.get(p))
      GraftTable.create(spark, p, cfgFor(tt, props))
    }

    // warm (same as Bench)
    phase("warmup") {
      val w = orders.limit(2000).cache(); w.count()
      val t = fresh("warm", TableType.CopyOnWrite)
      t.bulkInsert(w); t.upsert(w.limit(200))
      Readers.snapshot(t).groupBy("o_orderstatus").count()
        .write.mode("overwrite").format("noop").save()
      w.unpersist()
    }

    println("--- t_upsert ---")
    val t1 = fresh("upsert", TableType.CopyOnWrite)
    phase("bulk_insert")(t1.bulkInsert(orders))
    phase("upsert")(t1.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)))
    phase("snapshot+noop")(Readers.snapshot(t1)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").format("noop").save())

    println("--- t_merge_into ---")
    val t2 = fresh("merge", TableType.CopyOnWrite)
    phase("bulk_insert")(t2.bulkInsert(orders))
    val updSource = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 0.5)
    val insSource = orders.filter(col("o_orderkey") % 11 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + 50000000L)
    phase("merge")(t2.mergeInto(updSource.unionByName(insSource))
      .whenMatchedDelete(Some("t.o_orderkey % 6 = 0"))
      .whenMatchedUpdate(None, Map("o_totalprice" -> "s.o_totalprice"))
      .whenNotMatchedInsert(None)
      .execute())
    phase("snapshot+noop")(Readers.snapshot(t2)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").format("noop").save())

    println("--- t_mor_upsert ---")
    val t3 = fresh("mor", TableType.MergeOnRead, Map("graft.compact.inline" -> "false"))
    phase("bulk_insert")(t3.bulkInsert(orders))
    phase("mor_upsert")(t3.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)))
    phase("mor_snapshot+noop")(Readers.snapshot(t3)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").format("noop").save())

    spark.stop()
  }
}
