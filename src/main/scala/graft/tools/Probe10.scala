package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Break down p_decontaminate cost at sf0.1. */
object Probe10 {
  def time[A](l: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $l%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    time("warm count")(docs.count())
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val sh = train.select(col("doc_id").as("_dc_id"), col("text").as("_dc_t"))
      .repartition(col("_dc_id"))
      .select(col("_dc_id"), explode(Dedup.shingles(col("_dc_t"), 8)).as("_dc_s"))
    for (i <- 1 to 2) {
      time(s"explode+count ($i)")(println("  shingles=" + sh.count()))
      time(s"full decontaminate ($i)") {
        graft.pipeline.Decontaminate.decontaminate(train, bench, n = 8)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
