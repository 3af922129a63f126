package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** The metadata-driven FileIndex read path: plan-time partition pruning
  * from WHERE clauses, parquet filter pushdown, column pruning.
  */
class FileIndexSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private lazy val table: GraftTable = {
    val dir = tmpDir("fidx")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "fi", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    t.bulkInsert(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"))
    t
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case f: FileSourceScanExec => f }.get

  test("WHERE on the partition column prunes partitions at plan time") {
    val all = Readers.snapshot(table)
    val years = all.select(MetaCols.PartitionPath).distinct().count()
    assert(years > 1)

    val filtered = all.filter(col(MetaCols.PartitionPath) === "1995")
    val scan = scanOf(filtered)
    val listed = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(listed.size === 1, "only the 1995 partition should be listed")
    // and the result is still correct
    assert(filtered.count() ===
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(year($"o_orderdate") === 1995).count())
  }

  test("data predicates reach the parquet scan (PushedFilters)") {
    val df = Readers.snapshot(table).filter($"o_orderkey" === 42L)
    val scan = scanOf(df)
    assert(scan.metadata("PushedFilters").contains("o_orderkey"),
      s"expected pushdown, got ${scan.metadata("PushedFilters")}")
  }

  test("projection prunes the read schema") {
    val df = Readers.snapshot(table).select("o_orderkey", "o_totalprice")
    val scan = scanOf(df)
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read === Set("o_orderkey", "o_totalprice"),
      s"scan should read 2 columns, reads $read")
  }

  test("column-stats data skipping prunes files by value range") {
    val dir = tmpDir("fidx_skip")
    import spark.implicits._
    // two file groups with disjoint id ranges (small-file packing off)
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "sk", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.SmallFileLimit -> "1")))
    t.bulkInsert((1L to 50L).map(i => (i, 1L)).toDF("id", "ver"))
    t.insert((51L to 100L).map(i => (i, 1L)).toDF("id", "ver"))

    val df = Readers.snapshot(t).filter($"id" > 60L)
    val scan = scanOf(df)
    val files = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).flatMap(_.files)
    assert(files.size === 1, "the id<=50 file group should be skipped")
    assert(df.count() === 40)
    // no skipping without a predicate
    val all = scanOf(Readers.snapshot(t))
    assert(all.relation.location.listFiles(Nil, Nil).flatMap(_.files).size === 2)
  }

  test("NESTED struct-leaf stats prune files: range, equality, null-count") {
    val dir = tmpDir("fidx_nested")
    import spark.implicits._
    import org.apache.spark.sql.functions.{struct, lit, col}
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "nsk", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.SmallFileLimit -> "1")))
    // group A: meta.n in 1..50, meta.tag = 'lo', meta.opt never null
    // group B: meta.n in 51..100, meta.tag = 'hi', meta.opt always null
    t.bulkInsert((1L to 50L).map(i => (i, 1L)).toDF("id", "ver")
      .withColumn("meta", struct(col("id").as("n"), lit("lo").as("tag"),
        lit("x").as("opt"))))
    t.insert((51L to 100L).map(i => (i, 1L)).toDF("id", "ver")
      .withColumn("meta", struct(col("id").as("n"), lit("hi").as("tag"),
        lit(null).cast("string").as("opt"))))

    def listedFor(df: org.apache.spark.sql.DataFrame) = {
      val scan = scanOf(df)
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files).size
    }
    // range on a nested numeric leaf skips the low group
    val range = Readers.snapshot(t).filter($"meta.n" > 60L)
    assert(listedFor(range) === 1, "meta.n <= 50 group should be skipped")
    assert(range.count() === 40)
    // equality on a nested categorical leaf (dictionary set or min==max)
    val eq = Readers.snapshot(t).filter($"meta.tag" === "lo")
    assert(listedFor(eq) === 1, "the meta.tag='hi' group should be skipped")
    assert(eq.count() === 50)
    // null-count on a nested leaf
    val nn = Readers.snapshot(t).filter($"meta.opt".isNull)
    assert(listedFor(nn) === 1, "the no-nulls group should be skipped")
    assert(nn.count() === 50)
    // no predicate → both file groups listed; totals intact
    assert(scanOf(Readers.snapshot(t)).relation.location
      .listFiles(Nil, Nil).flatMap(_.files).size === 2)
    assert(Readers.snapshot(t).count() === 100)
  }

  test("null-count stats prune files for IS NULL / IS NOT NULL") {
    val dir = tmpDir("fidx_null")
    import spark.implicits._
    // group A: v never null; group B: v always null
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "nk", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.SmallFileLimit -> "1")))
    t.bulkInsert((1L to 50L).map(i => (i, 1L, s"v$i")).toDF("id", "ver", "v"))
    t.insert((51L to 100L).map(i => (i, 1L, null: String)).toDF("id", "ver", "v"))

    def listedFor(df: org.apache.spark.sql.DataFrame) = {
      val scan = scanOf(df)
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files).size
    }
    val isNull = Readers.snapshot(t).filter($"v".isNull)
    assert(listedFor(isNull) === 1, "the no-nulls group should be skipped")
    assert(isNull.count() === 50)
    val notNull = Readers.snapshot(t).filter($"v".isNotNull).select("id", "v")
    assert(listedFor(notNull) === 1, "the all-nulls group should be skipped")
    assert(notNull.count() === 50)

    // the admin view shows exactly what the pruner sees
    val cs = graft.table.TableAdmin.columnStats(t)
      .filter($"column" === "v")
      .select("null_count", "num_records")
      .collect().map(r => (r.get(0), r.getLong(1))).toSet
    assert(cs === Set((0L, 50L), (50L, 50L)))
  }

  test("dictionary value sets prune equality on categorical columns") {
    val dir = tmpDir("fidx_dict")
    import spark.implicits._
    // Two file groups; `status` is categorical and its [min,max] range
    // ("A".."R") is IDENTICAL in both groups, so range stats cannot prune.
    // The dictionary sets differ: group 1 = {A,N,R}, group 2 = {A,R}.
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "dv", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.SmallFileLimit -> "1")))
    val s1 = Seq("A", "N", "R")
    t.bulkInsert((1L to 60L).map(i => (i, 1L, s1((i % 3).toInt))).toDF("id", "ver", "status"))
    t.insert((61L to 120L).map(i => (i, 1L, if (i % 2 == 0) "A" else "R")).toDF("id", "ver", "status"))

    // the write recorded exhaustive value sets in commit metadata
    val entries = t.view.latestBaseFiles()
    assert(entries.size === 2)
    assert(entries.map(_.colValues("status").toSet).toSet ===
      Set(Set("A", "N", "R"), Set("A", "R")))

    def listedFor(df: org.apache.spark.sql.DataFrame) = {
      val scan = scanOf(df)
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files).size
    }
    // min/max can't separate the groups, the value set can
    val n = Readers.snapshot(t).filter($"status" === "N")
    assert(listedFor(n) === 1, "only the group whose dictionary holds N")
    assert(n.count() === 20)
    // IN follows the same membership test per literal
    val in = Readers.snapshot(t).filter($"status".isin("N", "Z"))
    assert(listedFor(in) === 1)
    assert(in.count() === 20)
    // a value in both dictionaries keeps both groups — and stays correct
    val a = Readers.snapshot(t).filter($"status" === "A")
    assert(listedFor(a) === 2)
    assert(a.count() === 20 + 30)
    // a value in neither prunes everything
    assert(Readers.snapshot(t).filter($"status" === "Z").count() === 0)
  }

  test("snapshot through the index equals the source rows") {
    val snap = Readers.snapshot(table)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    assert(snap.exceptAll(src).count() === 0)
    assert(src.exceptAll(snap).count() === 0)
  }
}
