package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scaling probe: synthesizes a 10× copy of the sf0.1 inputs (keys
  * offset per replica so PK uniqueness AND referential integrity hold —
  * join fan-outs stay realistic, per-key group sizes stay constant),
  * then times a representative headline subset ONCE at sf0.1 and ONCE
  * at sf1. A query whose sf1/sf0.1 ratio grows clearly past the 10×
  * data ratio reveals an accidental super-linearity the sf0.1 bench
  * cannot see (the fixed session/commit overhead in every table op
  * means healthy ratios sit BELOW 10×).
  *
  * Usage: `runMain graft.tools.ScaleProbe [sf01Dir] [sf1Dir] [warmupDir]`
  * (warmupDir defaults to sf01Dir's sibling `sf0.001`, falling back to
  * sf01Dir itself when no such sibling exists — warm-up must never
  * silently skip, or the first timed run absorbs JIT/codegen cost and
  * inflates the ratio). Prints one JSON line: per-query seconds at both
  * SFs + the ratio.
  */
object ScaleProbe {

  /** Headline subset spanning the three catalog groups. */
  val probes: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q26_cheapest_supplier",
    "t_bulk_insert", "t_upsert", "t_incremental_cdc",
    "p_dedup_exact", "p_dedup_minhash", "p_text_stats",
    "p_ann_bruteforce", "p_salted_join", "p_range_join", "p_sessionize")

  /** Per-key-domain replica offsets: every column of a domain shifts by
    * the SAME amount in replica i, so foreign keys keep resolving and
    * every join's per-key cardinality matches the original data.
    */
  private val domainOffsets: Map[String, Long] = Map(
    "o_orderkey" -> 10000000L, "l_orderkey" -> 10000000L,
    "o_custkey" -> 1000000L, "c_custkey" -> 1000000L,
    "s_suppkey" -> 100000L, "l_suppkey" -> 100000L,
    "p_partkey" -> 1000000L, "l_partkey" -> 1000000L,
    "event_id" -> 10000000L, "user_id" -> 1000000L,
    "doc_id" -> 1000000L, "vec_id" -> 1000000L)

  /** nation/region are FIXED-size dimensions at every TPC-H scale
    * factor; everything else scales with SF.
    */
  private val fixedDims = Set("region.parquet", "nation.parquet")

  def buildSf1(spark: SparkSession, sf01: String, out: String, copies: Int = 10): Unit = {
    graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(out))
    for (p <- graft.core.PathIO.list(java.nio.file.Paths.get(sf01))) {
      val name = p.getFileName.toString
      if (name.endsWith(".parquet")) {
        val src = spark.read.parquet(p.toString)
        val scaled =
          if (fixedDims.contains(name)) src
          else (0 until copies).map { i =>
            var df = src
            for (c <- df.columns if domainOffsets.contains(c))
              df = df.withColumn(c, col(c) + lit(i * domainOffsets(c)))
            // replica-unique text keeps content-dedup families bounded
            // (10 near-dups per original doc, constant in SF) instead of
            // exploding exact-dup groups
            if (df.columns.contains("text") && i > 0)
              df = df.withColumn("text",
                concat(col("text"), lit(s" replica$i ")))
            df
          }.reduce(_.unionByName(_))
        scaled.write.mode("overwrite").parquet(s"$out/$name")
      }
    }
  }

  /** Second-decade probe (round-16 directive): the two steepest curves
    * from the first decade (`p_dedup_minhash` 2.43×, `t_incremental_cdc`
    * 1.86×) timed at 10× vs 100× of sf0.1. Only a curve that STEEPENS
    * decade-over-decade reveals a hidden quadratic — the fixed overhead
    * that flatters the first decade is amortized away by the second.
    *
    * The 100× documents table keeps the DUPLICATE-FAMILY SIZE CONSTANT
    * (10 near-dup replicas per family) by splitting copies into GROUPS:
    * replica r of (doc, group g) appends ` replica$r` plus ~120 junk
    * tokens keyed by BOTH doc_id and g. Replicas of one (doc, group)
    * share their junk (within-family jaccard ~0.97 → they dedup); any
    * other pair — same doc across groups, different docs anywhere —
    * shares none of it, so its jaccard is diluted far below the banding
    * reach and candidate pairs grow LINEARLY in groups. The 10× build
    * uses the SAME construction with one group, so doc length and family
    * size are identical at both scales and the ratio isolates ALGORITHM
    * scaling. (Junk keyed by group alone is the trap: every doc in a
    * 50k-doc group would share 120 tokens → jaccard ~0.65 → 10^9
    * candidate pairs by construction.)
    */
  val deepProbes: Seq[String] = Seq("p_dedup_minhash", "t_incremental_cdc")

  private def junkTokens(g: Int): Column =
    concat_ws(" ", (0 until 120).map(k =>
      concat(lit(s"zz${g}x"), col("doc_id"), lit(s"t$k"))): _*)

  def buildDeep(spark: SparkSession, sf01: String, out: String, groups: Int): Unit = {
    graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(out))
    for (p <- graft.core.PathIO.list(java.nio.file.Paths.get(sf01))) {
      val name = p.getFileName.toString
      if (name.endsWith(".parquet")) {
        val src = spark.read.parquet(p.toString)
        val scaled =
          if (fixedDims.contains(name)) src
          else if (name == "documents.parquet") {
            (0 until groups).flatMap(g => (0 until 10).map(r => (g, r))).map {
              case (g, r) =>
                val i = g * 10 + r
                // junk keys on the ORIGINAL doc_id (the family id), so it
                // is computed BEFORE the replica offset is applied
                var df = src.withColumn("text", concat(col("text"),
                  lit(if (r == 0) " " else s" replica$r "), junkTokens(g)))
                for (c <- df.columns if domainOffsets.contains(c))
                  df = df.withColumn(c, col(c) + lit(i * domainOffsets(c)))
                df
            }.reduce(_.unionByName(_))
          } else (0 until groups * 10).map { i =>
            var df = src
            for (c <- df.columns if domainOffsets.contains(c))
              df = df.withColumn(c, col(c) + lit(i * domainOffsets(c)))
            df
          }.reduce(_.unionByName(_))
        scaled.write.mode("overwrite").parquet(s"$out/$name")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--second-decade")) { secondDecade(args.drop(1)); return }
    val sf01 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/graft_sf1")
    val warmupDir = args.lift(2).getOrElse {
      val sibling = java.nio.file.Paths.get(sf01)
        .toAbsolutePath.getParent.resolve("sf0.001")
      if (java.nio.file.Files.isDirectory(sibling)) sibling.toString else sf01
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildSf1(spark, sf01, sf1)
    val fns = graft.SparkEntry.queries

    // codegen/JIT warm-up at the smallest SF so both timed runs measure
    // steady-state plans, then ONE run per (query, sf) — the probe wants
    // the growth CURVE, not tight medians
    for (name <- probes)
      try fns(name)(spark, warmupDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[probe] warm-up failed $name: ${e.getMessage}")
      }

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      fns(name)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = probes.map { name =>
      val a = time(name, sf01)
      val b = time(name, sf1)
      System.err.println(f"[probe] $name%-24s sf0.1=$a%7.2fs  sf1=$b%7.2fs  ratio=${b / a}%5.2fx")
      (name, a, b)
    }
    val qs = rows.map { case (n, a, b) =>
      "\"" + n + "\":" + f"""{"sf01":$a%.3f,"sf1":$b%.3f,"ratio":${b / a}%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","copies":10,"queries":$qs}""")
    spark.stop()
  }

  /** `runMain graft.tools.ScaleProbe --second-decade [sf01Dir] [d1Dir] [d2Dir]` */
  private def secondDecade(args: Array[String]): Unit = {
    val sf01 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val d1 = args.lift(1).getOrElse("/tmp/graft_deep1")
    val d2 = args.lift(2).getOrElse("/tmp/graft_deep2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe-d2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println("[probe2] building 10x (1 group) ...")
    buildDeep(spark, sf01, d1, groups = 1)
    System.err.println("[probe2] building 100x (10 groups) ...")
    buildDeep(spark, sf01, d2, groups = 10)
    val fns = graft.SparkEntry.queries
    for (name <- deepProbes) // JIT/codegen warm-up at the smallest SF
      try fns(name)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[probe2] warm-up failed $name: ${e.getMessage}")
      }
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      fns(name)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = deepProbes.map { name =>
      val a = time(name, d1)
      val b = time(name, d2)
      System.err.println(f"[probe2] $name%-20s 10x=$a%7.2fs  100x=$b%7.2fs  ratio=${b / a}%5.2fx (data 10x)")
      (name, a, b)
    }
    val qs = rows.map { case (n, a, b) =>
      "\"" + n + "\":" + f"""{"x10":$a%.3f,"x100":$b%.3f,"ratio":${b / a}%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe_decade2","queries":$qs}""")
    spark.stop()
  }
}
