package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services, WritePipeline}

object ZProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_zprobe2"
    WritePipeline.deleteRecursively(java.nio.file.Paths.get(dir))
    val t = GraftTable.create(spark, dir, TableConfig("orders_z", TableType.CopyOnWrite,
      Seq("o_orderkey"), "", "o_orderdate",
      Map(ConfigKeys.MaxFileSize -> (16L * 1024).toString)))
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0))
    println("avgRecordSize=" + t.avgRecordSize + " maxFileSize=" + t.maxFileSize)
    println("slices before=" + t.view.fileSlices(None).size)
    val c = Services.cluster(t, zorderColumns = Seq("o_custkey", "o_totalprice"))
    println("commit=" + c)
    val bases = t.view.fileSlices(None).flatMap(_.baseFile)
    println("files after=" + bases.size)
    bases.sortBy(_.relPath).foreach { b =>
      println(f"${b.relPath}%-60s rows=${b.numRecords}%5d cust=[${b.colMin.getOrElse("o_custkey","?")},${b.colMax.getOrElse("o_custkey","?")}] price=[${b.colMin.getOrElse("o_totalprice","?")},${b.colMax.getOrElse("o_totalprice","?")}]")
    }
    spark.stop()
  }
}
