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
    // count over a column answers from recorded null counts
    val colCount = Readers.snapshot(t).agg(count($"o_orderkey").as("n"))
    assert(!hasScan(colCount))
    assert(colCount.head.getLong(0) === expected)
  }

  test("min/max/count(col) answer from the column-stats index") {
    val dir = tmpDir("statmm")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "smm", TableType.CopyOnWrite, Seq("id"), "concat('p=', pmod(id, 3))", ""))
    val src = Seq(
      (1L, 10.5, "cherry", Some(100L)),
      (2L, -3.25, "apple", None),
      (3L, 99.0, "banana", Some(7L)),
      (4L, 0.0, "apricot", None),
      (5L, 42.0, "fig", Some(7000L))).toDF("id", "price", "fruit", "opt")
    t.bulkInsert(src)

    val q = Readers.snapshot(t).agg(
      min($"price").as("lo"), max($"price").as("hi"),
      min($"fruit").as("first"), max($"fruit").as("last"),
      count($"opt").as("n_opt"), count(lit(1)).as("n"),
      min($"opt").as("lo_opt"))
    assert(!hasScan(q), "min/max/count should answer from stats")
    val r = q.head
    assert(r.getDouble(0) === -3.25 && r.getDouble(1) === 99.0)
    assert(r.getString(2) === "apple" && r.getString(3) === "fig")
    assert(r.getLong(4) === 3 && r.getLong(5) === 5)
    assert(r.getLong(6) === 7L)

    // stays exact across upsert + delete (COW bases rewrite)
    t.upsert(Seq((3L, -50.0, "zucchini", Some(1L)))
      .toDF("id", "price", "fruit", "opt"))
    t.delete(Seq((2L, 0.0, "", None: Option[Long])).toDF("id", "price", "fruit", "opt"))
    val q2 = Readers.snapshot(t).agg(
      min($"price").as("lo"), max($"fruit").as("last"), count($"opt").as("n_opt"))
    assert(!hasScan(q2))
    val r2 = q2.head
    assert(r2.getDouble(0) === -50.0)
    assert(r2.getString(1) === "zucchini")
    assert(r2.getLong(2) === 3)

    // an all-null column answers NULL min and zero count
    val t2dir = tmpDir("statmm2")
    val t2 = GraftTable.create(spark, t2dir.toString, TableConfig(
      "smm2", TableType.CopyOnWrite, Seq("id"), "", ""))
    t2.bulkInsert(Seq((1L, None: Option[Long]), (2L, None: Option[Long]))
      .toDF("id", "opt"))
    val q3 = Readers.snapshot(t2).agg(
      min($"opt").as("lo"), count($"opt").as("n"))
    assert(!hasScan(q3))
    assert(q3.head.isNullAt(0) && q3.head.getLong(1) === 0)

    // non-ASCII string stats answer too: the write-side fold orders them
    // by UTF-8 bytes, which is exactly Spark's UTF8_BINARY min/max order
    val t3dir = tmpDir("statmm3")
    val t3 = GraftTable.create(spark, t3dir.toString, TableConfig(
      "smm3", TableType.CopyOnWrite, Seq("id"), "", ""))
    t3.bulkInsert(Seq((1L, "z😀"), (2L, "￥yen")).toDF("id", "s"))
    val q4 = Readers.snapshot(t3).agg(min($"s").as("lo"), max($"s").as("hi"))
    assert(!hasScan(q4))
    // byte order: 'z' (0x7A) < '￥' (EF BF A5) regardless of UTF-16 units
    assert(q4.head.getString(0) === "z😀" && q4.head.getString(1) === "￥yen")

    // distinct / filtered aggregates keep the scan
    assert(hasScan(Readers.snapshot(t).agg(countDistinct($"fruit").as("n"))))
    assert(hasScan(Readers.snapshot(t).filter($"id" > 1).agg(min($"price").as("lo"))))

    // the session kill-switch keeps everything on the scan path
    spark.conf.set("spark.graft.statsAnswer.enabled", "false")
    try {
      val off = Readers.snapshot(t).agg(min($"price").as("lo"))
      assert(hasScan(off))
      assert(off.head.getDouble(0) === -50.0)
      assert(hasScan(Readers.snapshot(t).select("fruit").distinct()))
    } finally spark.conf.unset("spark.graft.statsAnswer.enabled")
  }

  test("NESTED leaf min/max/count and DISTINCT answer from stats") {
    val dir = tmpDir("statnested")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "snst", TableType.CopyOnWrite, Seq("id"), "", ""))
    val src = Seq((1L, 5L, "lo", Some("x")), (2L, 90L, "hi", None),
      (3L, 40L, "lo", Some("y")))
      .toDF("id", "n", "tag", "opt")
      .select($"id", struct($"n", $"tag", $"opt").as("meta"))
    t.bulkInsert(src)

    val mm = Readers.snapshot(t).agg(
      min($"meta.n").as("lo"), max($"meta.n").as("hi"),
      count($"meta.opt").as("nn"))
    assert(!hasScan(mm), "nested min/max/count should answer from stats")
    assert(mm.head match { case r => (r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((5L, 90L, 2L)) })

    val d = Readers.snapshot(t).select($"meta.tag").distinct()
    assert(!hasScan(d), "nested DISTINCT should answer from the dictionary index")
    assert(d.collect().map(_.getString(0)).sorted.toSeq === Seq("hi", "lo"))

    // an array-nested access never answers (no row-semantic stats)
    val arr = Seq((1L, Seq(1L, 2L))).toDF("id", "xs")
    val t2 = GraftTable.create(spark, tmpDir("statnested2").toString,
      TableConfig("snst2", TableType.CopyOnWrite, Seq("id"), "", ""))
    t2.bulkInsert(arr)
    val viaScan = Readers.snapshot(t2).agg(min(element_at($"xs", 1)).as("m"))
    assert(hasScan(viaScan))
    assert(viaScan.head.getLong(0) === 1L)
  }

  test("SELECT DISTINCT col answers from the dictionary value index") {
    val dir = tmpDir("statdist")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "sdist", TableType.CopyOnWrite, Seq("id"), "concat('p=', pmod(id, 2))", ""))
    val src = (1L to 200L).map(i =>
      (i, s"lang${i % 4}", if (i % 7 == 0) None else Some(i % 3), i * 1.5))
      .toDF("id", "lang", "opt", "price")
    t.bulkInsert(src)

    val q = Readers.snapshot(t).select("lang").distinct()
    assert(!hasScan(q), "low-cardinality DISTINCT should answer from dictionaries")
    assert(q.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("lang0", "lang1", "lang2", "lang3"))

    // nullable column: NULL appears exactly once in the distinct set
    val qn = Readers.snapshot(t).select("opt").distinct()
    assert(!hasScan(qn))
    val got = qn.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.length === 4 && got.contains(null))

    // stays exact across upsert + delete
    t.upsert(src.filter($"id" <= 10).withColumn("lang", lit("langX")))
    t.delete(src.filter($"lang" === "lang3" && $"id" > 10))
    val q2 = Readers.snapshot(t).select("lang").distinct()
    assert(!hasScan(q2))
    assert(q2.collect().map(_.getString(0)).sorted.toSeq ===
      Readers.snapshot(t).select("lang").collect()
        .map(_.getString(0)).distinct.sorted.toSeq)

    // high-cardinality (past the per-file dictionary cap) keeps the scan
    val qh = Readers.snapshot(t).select("id").distinct()
    assert(hasScan(qh))
    assert(qh.count() === Readers.snapshot(t).count())
    // double columns are not dictionary-indexed -> scan
    assert(hasScan(Readers.snapshot(t).select("price").distinct()))
    // a filter disables the rewrite
    assert(hasScan(Readers.snapshot(t).filter($"id" > 5).select("lang").distinct()))
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
