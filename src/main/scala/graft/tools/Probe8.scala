package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump just the round-6 new pipeline queries for oracle spot-checking. */
object Probe8 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/graft_probe8"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("probe8")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("p_decontaminate", "p_pack_bins")
    for (n <- names) {
      graft.SparkEntry.queries(n)(spark, d)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[probe8] wrote $n")
    }
    if (args.length > 2 && args(2) == "explain")
      for (n <- names) {
        println(s"===== $n")
        graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      }
    spark.stop()
  }
}
