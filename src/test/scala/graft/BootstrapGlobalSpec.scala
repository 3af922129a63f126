package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services, SortMode}

/** Bootstrap adoption, global-index upsert, and bulk-insert sort modes. */
class BootstrapGlobalSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val src = "/root/testdata/sf0.001/orders.parquet"

  test("METADATA_ONLY bootstrap: snapshot reads adopted file, upsert rewrites the group") {
    val dir = tmpDir("boot")
    val t = GraftTable.bootstrap(spark, dir.toString,
      TableConfig("b", TableType.CopyOnWrite, Seq("o_orderkey"), "", "o_orderdate"),
      Seq(src))
    val n = spark.read.parquet(src).count()
    val snap0 = Readers.snapshot(t)
    assert(snap0.count() === n)
    // meta columns synthesized for the external file
    assert(snap0.filter(col(MetaCols.RecordKey).isNull).count() === 0)
    assert(snap0.filter(col(MetaCols.CommitTime).isNull).count() === 0)

    val before = java.nio.file.Files.size(java.nio.file.Paths.get(src))
    t.upsert(spark.read.parquet(src).filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", lit(42.0)))
    val snap1 = Readers.snapshot(t)
    assert(snap1.count() === n)
    assert(snap1.filter($"o_totalprice" === 42.0).count() ===
      spark.read.parquet(src).filter($"o_orderkey" % 10 === 0).count())
    // the adopted source file is never modified
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(src)) === before)
    // clean never deletes the external file
    Services.clean(t, retainCommits = 1)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(src)))
  }

  test("FULL_RECORD bootstrap: partitioned rewrite, source untouched") {
    val dir = tmpDir("bootfr")
    val before = java.nio.file.Files.size(java.nio.file.Paths.get(src))
    val t = GraftTable.bootstrap(spark, dir.toString,
      TableConfig("bfr", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate"),
      Seq(src), mode = GraftTable.BootstrapMode.FullRecord)
    val n = spark.read.parquet(src).count()
    val snap = Readers.snapshot(t)
    assert(snap.count() === n)
    // unlike METADATA_ONLY: partitioned layout + owned files + footer stats
    assert(t.view.partitions().forall(_.matches("\\d{4}")))
    assert(t.view.fileSlices(None).flatMap(_.baseFile)
      .forall(b => !java.nio.file.Paths.get(b.relPath).isAbsolute && b.minKey.nonEmpty))
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(src)) === before)
    // upserts are plain table writes from here on
    t.upsert(spark.read.parquet(src).filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", lit(7.0)))
    assert(Readers.snapshot(t).filter($"o_totalprice" === 7.0).count() ===
      spark.read.parquet(src).filter($"o_orderkey" % 10 === 0).count())
  }

  test("global-index upsert migrates records whose partition changed") {
    val dir = tmpDir("glob")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "g", TableType.CopyOnWrite, Seq("id"), "p", "ver"))
    t.bulkInsert(Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "b", 1L)).toDF("id", "p", "ver"))
    // move id=1 from partition a to b; update id=3 in place; insert id=4
    t.upsertGlobal(Seq((1L, "b", 2L), (3L, "b", 2L), (4L, "c", 2L)).toDF("id", "p", "ver"))
    val snap = Readers.snapshot(t).select("id", "p", "ver")
      .as[(Long, String, Long)].collect().toSet
    assert(snap === Set((1L, "b", 2L), (2L, "a", 1L), (3L, "b", 2L), (4L, "c", 2L)))
    // exactly one row per key — the old-partition copy of id=1 is gone
    assert(Readers.snapshot(t).groupBy("id").count().filter($"count" > 1).count() === 0)
  }

  test("global delete removes records by key across partitions") {
    val dir = tmpDir("gdel")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "gd", TableType.CopyOnWrite, Seq("id"), "p", "ver"))
    t.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "p", "ver"))
    // delete ids 1 and 3 knowing only the key — no partition info supplied
    t.deleteGlobal(Seq(Tuple1(1L), Tuple1(3L)).toDF("id"))
    val snap = Readers.snapshot(t).select("id").as[Long].collect().toSeq
    assert(snap === Seq(2L))
    // deleting a missing key is a no-op
    t.deleteGlobal(Seq(Tuple1(99L)).toDF("id"))
    assert(Readers.snapshot(t).count() === 1)
  }

  test("deleting every record of a file group replaces it (no resurrection)") {
    val dir = tmpDir("gdel_all")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "ga", TableType.CopyOnWrite, Seq("id"), "p", "ver"))
    t.bulkInsert(Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "b", 1L)).toDF("id", "p", "ver"))
    // wipe partition a's whole group via keyed delete (not delete_partition)
    t.delete(Seq((1L, "a", 1L), (2L, "a", 1L)).toDF("id", "p", "ver"))
    assert(Readers.snapshot(t).select("id").as[Long].collect().toSeq === Seq(3L))
    // and the table still accepts new rows for that partition
    t.upsert(Seq((5L, "a", 2L)).toDF("id", "p", "ver"))
    assert(Readers.snapshot(t).count() === 2)
  }

  test("ALTER TABLE ADD COLUMNS widens the schema; old rows read null") {
    val dir = tmpDir("alter")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "al", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    t.bulkInsert(Seq((1L, 1L)).toDF("id", "ver"))
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "tag", org.apache.spark.sql.types.StringType)))
    val snap = Readers.snapshot(t)
    assert(snap.columns.contains("tag"))
    assert(snap.select("tag").first().isNullAt(0))
    // duplicate add rejected; new column writable
    intercept[IllegalArgumentException] {
      t.addColumns(Seq(org.apache.spark.sql.types.StructField(
        "tag", org.apache.spark.sql.types.StringType)))
    }
    t.upsert(Seq((2L, 1L, "x")).toDF("id", "ver", "tag"))
    assert(Readers.snapshot(t).filter($"tag" === "x").count() === 1)
  }

  test("bulk-insert sort modes produce identical rows") {
    val df = spark.read.parquet(src)
    val expected = df.count()
    Seq(SortMode.GlobalSort, SortMode.PartitionSort, SortMode.NoSort).foreach { m =>
      val dir = tmpDir(s"bsm_${m.toLowerCase}")
      val t = GraftTable.create(spark, dir.toString, TableConfig(
        s"bsm", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
      t.bulkInsert(df, m)
      assert(Readers.snapshot(t).count() === expected, s"mode $m")
    }
  }
}
