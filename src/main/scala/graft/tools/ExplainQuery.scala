package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for catalog queries to files — the plan
  * evidence the optimization rounds commit under plans/rNN/.
  *
  *   sbt "runMain graft.tools.ExplainQuery <sfDir> <outDir> <suffix> <name> [<name>...]"
  *
  * Writes `<outDir>/<name>_<suffix>.txt`. The session mirrors Bench's conf
  * so the plan shapes match what the bench times. Note: explain prints the
  * INITIAL adaptive plan (isFinalPlan=false) — Exchange counts, join
  * strategies, PushedFilters and ReadSchema are all visible there.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
