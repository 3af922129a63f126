package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 profiling probe: time individual headline queries with the same
  * session config as Bench, after the same warmup.
  */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe6")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warmup as Bench
    {
      val w = spark.read.parquet(s"$sfDir/orders.parquet").limit(2000).cache()
      w.count()
      val p = "/tmp/graft_probe6_warm"
      graft.table.WritePipeline.deleteRecursively(java.nio.file.Paths.get(p))
      val t = graft.table.GraftTable.create(spark, p, graft.core.TableConfig(
        "warm", graft.core.TableType.CopyOnWrite,
        Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
      t.bulkInsert(w)
      t.upsert(w.limit(200))
      graft.read.Readers.snapshot(t).groupBy("o_orderstatus").count()
        .write.mode("overwrite").format("noop").save()
      w.unpersist()
      graft.table.WritePipeline.deleteRecursively(java.nio.file.Paths.get(p))
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("p_dedup_exact", "t_mor_upsert")
    val fns = graft.SparkEntry.queries
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      fns(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[probe6] $n%-24s rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
