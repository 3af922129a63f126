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
    "q15_top_orders", "q26_cheapest_supplier", "q28_dominant_suppliers",
    "t_bulk_insert", "t_upsert", "t_merge_into", "t_mor_upsert",
    "t_incremental_cdc", "t_bucket_index_upsert", "p_dedup_spans",
    "p_dedup_exact", "p_dedup_minhash", "p_dedup_simhash",
    "p_text_stats", "p_text_quality_lang", "p_ann_bruteforce",
    "p_sessionize", "p_asof_join", "p_sample_stratified",
    "p_decontaminate", "p_pack_bins",
    "p_quality_repetition", "p_range_join", "p_chunk_docs",
    "p_dedup_semantic", "p_contamination", "p_c4_clean", "p_pii_scrub",
    "p_lm_perplexity", "p_bm25_topk", "q35_waiting_suppliers",
    "t_materialized_view", "p_image_phash_dedup", "p_audio_fp_dedup",
    "p_video_frames", "p_salted_join", "t_catalog_insert_overwrite")
  // t_ingest_kafka is NOT a headliner: its gate shape is 25 sequential
  // maxEvents-capped ticks at sf0.1 (deliberately, to exercise checkpoint
  // resume), which times the harness loop, not engine throughput

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // iteration aid: restrict the run to a comma-separated subset
    val headline = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) =>
        val want = only.split(",").map(_.trim).filter(_.nonEmpty).toSet
        Bench.headline.filter(want)
      case None => Bench.headline
    }
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
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session before timing (JMH-style warmup iteration): each
    // headline query runs once against a tiny sampled copy of the input
    // tables. One-time costs — whole-stage codegen + janino compilation
    // per plan shape, the ICU collation tables behind lower()/upper()
    // (~15s on first use in this JVM), parquet reader/writer init, the
    // MOR delta-write and merged-read machinery — all JIT on first use;
    // without this the first query of each family absorbs setup time
    // that has nothing to do with the plan under test. A long-lived
    // cluster is always past these costs; the timed pass below measures
    // the steady state a 1000-executor job would actually see.
    val fns = SparkEntry.queries
    locally {
      val warmDir = "/tmp/graft_bench_warm_sf"
      graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(warmDir))
      for (p <- graft.core.PathIO.list(java.nio.file.Paths.get(sfDir))) {
        val n = p.getFileName.toString
        if (n.endsWith(".parquet")) {
          // QUtil.events normalizes the events timestamp type; plain
          // parquet copy is fine for the sampled warm-up tables
          val df =
            if (n == "events.parquet") graft.queries.QUtil.events(spark, sfDir)
            else spark.read.parquet(p.toString)
          df.limit(500).coalesce(1).write.mode("overwrite").parquet(s"$warmDir/$n")
        }
      }
      for (name <- headline)
        // a warm-up failure on 500-row samples is not a bench failure,
        // but it must never be silent — the timed pass below is strict
        try fns(name)(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] WARM-UP FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(warmDir))
    }

    // Timed pass: median of N iterations per query, iterations interleaved
    // ROUND-ROBIN across queries (iter 1 of every query, then iter 2, ...)
    // instead of N consecutive runs per query — consecutive runs all sample
    // the same transient page-cache/GC/JIT state, which is how r11's
    // committed artifact recorded 3.6x phantom swings on identical code.
    // Per-query {min, median, max} is reported alongside the medians, and
    // the artifact self-flags `"noisy": true` when any query's max/min
    // spread exceeds NoisySpread so an untrustworthy run is visibly so.
    // A failed query must surface as a failure, never as a (fast) timing.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val NoisySpread = 2.0
    // iteration 1 of each query is its FIRST run at full SF — it pays
    // one-time costs the sampled warm-up can't reach (parquet footer
    // cache, codegen for the full-size plan variants, page cache for the
    // real files). Two back-to-back full runs on identical code showed
    // per-query medians agreeing within 1.25x while iteration-1 spikes of
    // 4-13x tripped the noise flag — so iteration 1 is recorded
    // separately (`first`) and EXCLUDED from median/min/max/noise, which
    // measure the steady state. A genuinely noisy run still flags: its
    // spread lives in iterations 2..n too.
    val times = scala.collection.mutable.LinkedHashMap(
      headline.map(n => n -> scala.collection.mutable.ArrayBuffer.empty[Double]): _*)
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    for (i <- 0 to iters; name <- headline if !failed.contains(name)) {
      try {
        val t0 = System.nanoTime()
        fns(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        times(name) += (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED $name (iter $i): ${e.getClass.getSimpleName}: ${e.getMessage}")
          failed += name
      }
    }
    val results = headline.filterNot(failed.contains).flatMap { name =>
      val all = times(name).toIndexedSeq
      if (all.length < 2) None
      else {
        val ts = all.drop(1).sorted
        Some((name, ts(ts.length / 2), ts.head, ts.last, all.head))
      }
    }
    val qs = results.map { case (k, med, _, _, _) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val stats = results.map { case (k, med, mn, mx, first) =>
      "\"" + k + "\":" + f"""{"min":$mn%.3f,"med":$med%.3f,"max":$mx%.3f,"first":$first%.3f}"""
    }.mkString("{", ",", "}")
    // noise = TRIMMED spread (drop the single best and worst steady-state
    // iteration, then max/min): the reported number is a median, which
    // tolerates one stalled sweep (GC pause, page-cache eviction) — a run
    // is only untrustworthy when the MIDDLE iterations disagree
    val noisy = headline.filterNot(failed.contains).exists { name =>
      val ts = times(name).toIndexedSeq.drop(1).sorted
      ts.length >= 3 && ts(1) > 0 && ts(ts.length - 2) / ts(1) > NoisySpread
    }
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the parsed artifact line stays SHORT (medians only): r12's enriched
    // single line overflowed the driver's tail capture and the committed
    // bench parsed as null. The full min/med/max/first detail goes to
    // stderr, which the driver shows but never parses.
    System.err.println(s"""[bench-stats] {"iters":$iters,"stats":$stats}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"noisy":$noisy,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
