package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 plan audit: count exchanges in the writeMerged-shaped plan
  * (repartition by (part, fileId) + window clustered on the same keys).
  */
object Probe9 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(s"$d/orders.parquet")
      .withColumn("part", year(col("o_orderdate")).cast("string"))
      .withColumn("fid", (col("o_orderkey") % 8).cast("string"))

    // the writeMerged shape: repartition + window over same prefix
    val w = Window.partitionBy(col("part"), col("fid"))
      .orderBy(col("o_orderkey").asc, col("o_orderdate").desc)
    val merged = df.repartition(col("part"), col("fid"))
      .withColumn("_prev", lag(col("o_orderkey"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("o_orderkey"))
      .drop("_prev")
    val plan = merged.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    println(s"PROBE writeMerged-shape exchanges=$exchanges (expect 1)")
    if (exchanges != 1) println(plan.take(4000))
    spark.stop()
  }
}
