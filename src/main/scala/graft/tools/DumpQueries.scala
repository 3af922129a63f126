package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: dump a subset of SparkEntry.queries to parquet (plus the
  * full oracle_sql.json) for fast local oracle iteration without running
  * the whole Verify catalog. Usage:
  *   runMain graft.tools.DumpQueries <sfDir> <outDir> <name> [<name>...]
  */
object DumpQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val fns = graft.SparkEntry.queries
    names.foreach { n =>
      fns(n)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[dump] $n")
    }
    val json = org.json4s.jackson.Serialization.write(graft.SparkEntry.oracleSql)(
      org.json4s.DefaultFormats)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
