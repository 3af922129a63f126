package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession

/** One local SparkSession shared by all suites. */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), prefix)
    p.toFile.deleteOnExit()
    p
  }

  val sf001 = "/root/testdata/sf0.001"
}
