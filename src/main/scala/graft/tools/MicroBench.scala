package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.keygen.KeyGen

/** Raw-primitive timings (dev tool): isolates parquet read, shuffle,
  * keygen, staged write and footer-stat costs from the engine's logic.
  */
object MicroBench {
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

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[micro] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val cfg = TableConfig("m", TableType.CopyOnWrite,
      Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    phase("warm count")(orders.count())
    phase("count again")(orders.count())
    phase("noop scan all cols")(orders.write.mode("overwrite").format("noop").save())
    phase("plain write parquet")(orders.write.mode("overwrite")
      .parquet("/tmp/mb/plain"))
    phase("keygen + noop")(KeyGen.withKeyColumns(orders, cfg)
      .write.mode("overwrite").format("noop").save())
    val keyed = KeyGen.withKeyColumns(orders, cfg)
    phase("keyed repartitionByRange(5) write")(
      keyed.repartitionByRange(5, col(MetaCols.PartitionPath), col(MetaCols.RecordKey))
        .sortWithinPartitions(MetaCols.PartitionPath, MetaCols.RecordKey)
        .write.mode("overwrite").parquet("/tmp/mb/ranged"))
    phase("keyed write partitionBy(part)")(
      keyed.repartition(col(MetaCols.PartitionPath))
        .write.mode("overwrite").partitionBy(MetaCols.PartitionPath)
        .parquet("/tmp/mb/partby"))
    phase("monotonic id + write partitionBy")(
      keyed.withColumn("_seq", concat(lit("x_"), monotonically_increasing_id().cast("string")))
        .repartition(col(MetaCols.PartitionPath))
        .write.mode("overwrite").partitionBy(MetaCols.PartitionPath)
        .parquet("/tmp/mb/partby2"))
    // window dedup analog
    phase("union+window+filter noop") {
      import org.apache.spark.sql.expressions.Window
      val u = keyed.unionByName(keyed.limit(20000))
      val w = Window.partitionBy(col(MetaCols.PartitionPath), col(MetaCols.RecordKey))
        .orderBy(col("o_orderdate").desc)
      u.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .write.mode("overwrite").format("noop").save()
    }
    val files = graft.core.PathIO.list(java.nio.file.Paths.get("/tmp/mb/plain"))
      .iterator
    var n = 0
    phase("footer stats x files") {
      files.foreach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) {
          graft.table.WritePipeline.footerRowCount(p); n += 1
        }
      }
    }
    println(s"[micro] footer files: $n")
    spark.stop()
  }
}
