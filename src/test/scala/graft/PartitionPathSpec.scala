package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** Partition-path value handling: opt-in URL encoding (reference
  * PartitionPathEncodeUtils / hoodie.datasource.write.partitionpath.
  * urlencode) vs slash-nesting as multi-level partitioning.
  */
class PartitionPathSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def rows = Seq(
    (1L, "US/CA", 10L), (2L, "US/CA", 20L),
    (3L, "EU/DE", 30L), (4L, "plain", 40L)).toDF("id", "region", "v")

  test("urlencode flattens slash-bearing values to one partition level") {
    val t = GraftTable.create(spark, tmpDir("pp_enc").toString + "/t",
      TableConfig("pp_enc", TableType.CopyOnWrite, Seq("id"), "region", "v",
        Map(ConfigKeys.UrlEncodePartitions -> "true")))
    t.bulkInsert(rows)
    assert(Readers.snapshot(t).count() === 4)
    val parts = t.view.fileSlices(None).map(_.partitionPath).distinct.sorted
    assert(parts === Seq("EU%2FDE", "US%2FCA", "plain"))
    // partition ops address the encoded (single-level) name
    t.deletePartitions(Seq("US%2FCA"))
    assert(Readers.snapshot(t).select("id").as[Long].collect().toSet === Set(3L, 4L))
    // upsert round trip keeps the encoding stable (no double-encode)
    t.upsert(Seq((3L, "EU/DE", 33L)).toDF("id", "region", "v"))
    assert(t.view.fileSlices(None).map(_.partitionPath).distinct.count(_.startsWith("EU")) === 1)
    assert(Readers.snapshot(t).filter(col("id") === 3).select("v")
      .as[Long].head() === 33L)
  }

  test("without encoding, slashes build multi-level partitions") {
    val t = GraftTable.create(spark, tmpDir("pp_nest").toString + "/t",
      TableConfig("pp_nest", TableType.CopyOnWrite, Seq("id"), "region", "v"))
    t.bulkInsert(rows)
    assert(Readers.snapshot(t).count() === 4)
    val parts = t.view.fileSlices(None).map(_.partitionPath).distinct.sorted
    assert(parts === Seq("EU/DE", "US/CA", "plain"))
    t.deletePartitions(Seq("EU/DE"))
    assert(Readers.snapshot(t).select("id").as[Long].collect().toSet === Set(1L, 2L, 4L))
  }

  test("hive-style partitioning writes name=value directories") {
    val dir = tmpDir("pp_hive").toString + "/t"
    val t = GraftTable.create(spark, dir,
      TableConfig("pp_hive", TableType.CopyOnWrite, Seq("id"), "region", "v",
        Map(ConfigKeys.HiveStylePartitioning -> "true")))
    t.bulkInsert(Seq((1L, "us", 1L), (2L, "eu", 2L)).toDF("id", "region", "v"))
    val parts = t.view.fileSlices(None).map(_.partitionPath).distinct.sorted
    assert(parts === Seq("region=eu", "region=us"))
    // directories on disk carry the hive-style names external engines
    // discover natively
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir).resolve("region=us")))
    // full round trip: upsert stays in its partition, partition ops
    // address the hive-style name
    t.upsert(Seq((1L, "us", 11L)).toDF("id", "region", "v"))
    assert(Readers.snapshot(t).filter(col("id") === 1L)
      .select("v").as[Long].head() === 11L)
    t.deletePartitions(Seq("region=eu"))
    assert(Readers.snapshot(t).select("id").as[Long].collect().toSet === Set(1L))
    // explicit name override for expression partitioning
    val t2 = GraftTable.create(spark, tmpDir("pp_hive2").toString + "/t",
      TableConfig("pp_hive2", TableType.CopyOnWrite, Seq("id"),
        "upper(region)", "v",
        Map(ConfigKeys.HiveStylePartitioning -> "true",
          ConfigKeys.PartitionName -> "region_uc")))
    t2.bulkInsert(Seq((1L, "us", 1L)).toDF("id", "region", "v"))
    assert(t2.view.fileSlices(None).map(_.partitionPath).distinct === Seq("region_uc=US"))
  }

  test("multi-level identity + hive style prefixes EVERY level") {
    val dir = tmpDir("pp_hive_ml").toString + "/t"
    val t = GraftTable.create(spark, dir,
      TableConfig("pp_hive_ml", TableType.CopyOnWrite, Seq("id"),
        "concat_ws('/', cast(`yr` as string), cast(`region` as string))", "v",
        Map(ConfigKeys.HiveStylePartitioning -> "true")))
    t.bulkInsert(Seq((1L, "1995", "us", 1L), (2L, "1995", "eu", 2L),
      (3L, "1996", "us", 3L)).toDF("id", "yr", "region", "v"))
    val parts = t.view.fileSlices(None).map(_.partitionPath).distinct.sorted
    assert(parts === Seq("yr=1995/region=eu", "yr=1995/region=us", "yr=1996/region=us"))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir).resolve("yr=1995").resolve("region=us")))
    // round trip: upsert stays in its leaf, partition ops address the
    // full hive-style name, null levels fall to the default partition
    t.upsert(Seq((1L, "1995", "us", 11L)).toDF("id", "yr", "region", "v"))
    assert(Readers.snapshot(t).filter(col("id") === 1L)
      .select("v").as[Long].head() === 11L)
    t.upsert(Seq((4L, "1996", null, 4L)).toDF("id", "yr", "region", "v"))
    assert(t.view.fileSlices(None).map(_.partitionPath).distinct.sorted
      .contains("yr=1996/region=default"))
    t.deletePartitions(Seq("yr=1995/region=eu"))
    assert(Readers.snapshot(t).select("id").as[Long].collect().toSet ===
      Set(1L, 3L, 4L))
  }

  test("multilevel=false keeps the legacy plain layout for pre-existing tables") {
    // a multi-column hive-style table written BEFORE per-level rendering
    // has plain `1995/eu` paths on disk; the opt-out pins new writes to
    // that layout so existing keys don't move partitions on upgrade
    val dir = tmpDir("pp_hive_ml_legacy").toString + "/t"
    val t = GraftTable.create(spark, dir,
      TableConfig("pp_hive_ml_legacy", TableType.CopyOnWrite, Seq("id"),
        "concat_ws('/', cast(`yr` as string), cast(`region` as string))", "v",
        Map(ConfigKeys.HiveStylePartitioning -> "true",
          ConfigKeys.HiveStyleMultiLevel -> "false")))
    t.bulkInsert(Seq((1L, "1995", "us", 1L), (2L, "1996", "eu", 2L))
      .toDF("id", "yr", "region", "v"))
    assert(t.view.fileSlices(None).map(_.partitionPath).distinct.sorted ===
      Seq("1995/us", "1996/eu"))
    // upserts of existing keys stay in their established partition
    t.upsert(Seq((1L, "1995", "us", 11L)).toDF("id", "yr", "region", "v"))
    assert(t.view.fileSlices(None).map(_.partitionPath).distinct.sorted ===
      Seq("1995/us", "1996/eu"))
    assert(Readers.snapshot(t).filter(col("id") === 1L)
      .select("v").as[Long].head() === 11L)
  }
}
