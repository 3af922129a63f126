package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** Pre-commit validators: a bad batch is REFUSED before publish — files
  * reclaimed, timeline untouched — while a passing batch commits with the
  * validator seeing the new files' true contents.
  */
class PreCommitValidatorSpec extends AnyFunSuite {
  import SparkTestBase._

  private def mk(name: String, tt: String = TableType.CopyOnWrite): GraftTable =
    GraftTable.create(spark, tmpDir(name).toString, TableConfig(
      name, tt, Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')",
      "o_orderdate"))

  private def src(n: Int) = {
    val df = spark.read.parquet(s"$sf001/orders.parquet").limit(n).cache()
    df.count(); df
  }

  test("rejecting validator aborts the commit; table and files untouched") {
    val t = mk("pcv_reject")
    val s = src(200)
    t.bulkInsert(s)
    val filesBefore = graft.core.Storage.walkPaths(t.basePath)
      .filterNot(_.toString.contains(".graft")).map(_.toString).toSet
    t.registerPreCommitValidator { ctx =>
      val bad = ctx.newData().filter(col("o_totalprice") < 0).count()
      if (bad > 0) throw new IllegalStateException(s"$bad negative prices")
    }
    val e = intercept[IllegalStateException] {
      t.upsert(s.limit(30).withColumn("o_totalprice", lit(-1.0)))
    }
    assert(e.getMessage.contains("negative prices"))
    // nothing published, nothing left behind
    assert(t.timeline.completedDataInstants().size === 1)
    assert(Readers.snapshot(t).filter(col("o_totalprice") < 0).count() === 0)
    val filesAfter = graft.core.Storage.walkPaths(t.basePath)
      .filterNot(_.toString.contains(".graft")).map(_.toString).toSet
    assert(filesAfter === filesBefore)
    // a clean batch then commits through the SAME validator
    t.upsert(s.limit(10).withColumn("o_totalprice", lit(5.0)))
    assert(t.timeline.completedDataInstants().size === 2)
    s.unpersist()
  }

  test("stats-only validator gates volume without reading data") {
    val t = mk("pcv_stats")
    val s = src(100)
    t.bulkInsert(s)
    var sawOp = ""
    t.registerPreCommitValidator { ctx =>
      sawOp = ctx.operationType
      // refuse any batch spraying across too many partitions (fat-finger
      // guard) — judged from write stats alone, zero file IO
      if (ctx.stats.map(_.partitionPath).distinct.size > 3)
        throw new IllegalStateException("too many partitions touched")
    }
    t.upsert(s.filter(year(col("o_orderdate")) === 1995)
      .withColumn("o_totalprice", lit(1.0)))
    assert(sawOp === "upsert")
    intercept[IllegalStateException] {
      t.upsert(s.withColumn("o_totalprice", lit(2.0)))
    }
    assert(Readers.snapshot(t).filter(col("o_totalprice") === 2.0).count() === 0)
    assert(Readers.snapshot(t).count() === 100)
    s.unpersist()
  }

  test("validator runs on the optimistic path and aborts cleanly") {
    val t = mk("pcv_occ")
    val s = src(100)
    t.bulkInsert(s)
    t.registerPreCommitValidator { ctx =>
      if (ctx.newData().filter(col("o_totalprice") < 0).count() > 0)
        throw new IllegalStateException("bad batch")
    }
    intercept[IllegalStateException] {
      t.upsertOptimistic(s.limit(5).withColumn("o_totalprice", lit(-9.0)))
    }
    assert(t.timeline.completedDataInstants().size === 1)
    assert(Readers.snapshot(t).filter(col("o_totalprice") < 0).count() === 0)
    t.upsertOptimistic(s.limit(5).withColumn("o_totalprice", lit(9.0)))
    assert(t.timeline.completedDataInstants().size === 2)
    s.unpersist()
  }

  test("MOR: rejected delta batch leaves merged reads unchanged") {
    val t = mk("pcv_mor", TableType.MergeOnRead)
    val s = src(100)
    t.bulkInsert(s)
    t.registerPreCommitValidator { ctx =>
      if (ctx.newData().filter(col("o_totalprice") < 0).count() > 0)
        throw new IllegalStateException("bad delta")
    }
    intercept[IllegalStateException] {
      t.upsert(s.limit(10).withColumn("o_totalprice", lit(-2.0)))
    }
    assert(Readers.snapshot(t).filter(col("o_totalprice") < 0).count() === 0)
    assert(Readers.snapshot(t).count() === 100)
    s.unpersist()
  }
}
