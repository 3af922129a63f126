package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** Metadata-answered count(*): plan collapses to a LocalRelation (no scan,
  * no jobs) exactly when commit-metadata row counts are exact — and never
  * fires when they aren't (filters, MOR deltas).
  */
class StatsAnswerSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  // the rewrite's fingerprint is the optimized plan collapsing to a
  // LocalRelation (the physical plan hides inside AdaptiveSparkPlanExec,
  // so scanning for FileSourceScanExec is unreliable)
  private def statsAnswered(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined
  private def hasScan(df: org.apache.spark.sql.DataFrame): Boolean =
    !statsAnswered(df)

  test("COW count(*) answers from commit metadata, stays exact across ops") {
    val dir = tmpDir("statcnt")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "sc", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)

    val counted = Readers.snapshot(t).agg(count(lit(1)).as("n"))
    assert(!hasScan(counted), "count(*) should not scan files")
    assert(counted.head.getLong(0) === src.count())
    // Dataset.count() takes the same path
    assert(Readers.snapshot(t).count() === src.count())

    // stays exact through upsert + delete (tombstones never persist in
    // COW bases)
    t.upsert(src.limit(50).withColumn("o_totalprice", lit(1.0)))
    t.delete(src.filter($"o_orderkey" % 10 === 3))
    val expected = src.filter($"o_orderkey" % 10 =!= 3).count()
    val after = Readers.snapshot(t).agg(count(lit(1)).as("n"))
    assert(!hasScan(after))
    assert(after.head.getLong(0) === expected)

    // a filter disables the rewrite and the scan answers correctly
    val filtered = Readers.snapshot(t).filter($"o_orderkey" % 2 === 0)
      .agg(count(lit(1)).as("n"))
    assert(hasScan(filtered))
    assert(filtered.head.getLong(0) ===
      src.filter($"o_orderkey" % 10 =!= 3 && $"o_orderkey" % 2 === 0).count())
    // count over another column (null-sensitive) is NOT stats-answerable
    val colCount = Readers.snapshot(t).agg(count($"o_orderkey").as("n"))
    assert(hasScan(colCount))
  }

  test("MOR with deltas scans; read-optimized answers from metadata") {
    val dir = tmpDir("statcnt_mor")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "scm", TableType.MergeOnRead, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate",
      props = Map("graft.compact.inline" -> "false")))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    t.upsert(src.limit(40).withColumn("o_totalprice", lit(2.0)))
    // snapshot must merge deltas — no metadata shortcut on merged slices
    assert(Readers.snapshot(t).count() === src.count())
    // read-optimized is bases-only: metadata answers
    val ro = Readers.readOptimized(t).agg(count(lit(1)).as("n"))
    assert(!hasScan(ro))
    assert(ro.head.getLong(0) === src.count())
  }
}
