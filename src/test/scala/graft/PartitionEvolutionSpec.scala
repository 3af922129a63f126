package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Partition-layout evolution: new writes land under the new expression,
  * old data stays readable in place, records migrate lazily on touch,
  * stale handles are refused, rollback restores the previous expression.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def cfg(tt: String) = TableConfig(
    "pevo", tt, Seq("o_orderkey"),
    "date_format(o_orderdate, 'yyyy')", "o_orderdate",
    props = Map("graft.compact.inline" -> "false"))

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("evolve yyyy -> yyyy-MM: lazy migration, exact data, both layouts prunable") {
    val dir = tmpDir("pevo_cow")
    val t = GraftTable.create(spark, dir.toString, cfg(TableType.CopyOnWrite))
    val src = orders
    t.bulkInsert(src)
    val t2 = t.alterPartitionExpr("date_format(o_orderdate, 'yyyy-MM')")

    // untouched rows keep their year dirs; touched rows migrate to month
    t2.upsert(src.filter($"o_orderkey" % 4 === 0)
      .withColumn("o_totalprice", lit(111.0)))
    val parts = Readers.snapshot(t2)
      .select(col(MetaCols.PartitionPath).as("p"), col("o_orderkey"))
    assert(parts.filter($"o_orderkey" % 4 === 0 && !$"p".contains("-")).count() === 0,
      "touched rows must live under the month layout")
    assert(parts.filter($"o_orderkey" % 4 =!= 0 && $"p".contains("-")).count() === 0,
      "untouched rows must stay under the year layout")
    // no duplicates, values exact
    val snap = Readers.snapshot(t2)
    assert(snap.count() === src.count())
    assert(snap.filter($"o_totalprice" === 111.0).count() ===
      src.filter($"o_orderkey" % 4 === 0).count())

    // deletes locate keys across BOTH layouts
    t2.delete(src.filter($"o_orderkey" % 10 === 7))
    assert(Readers.snapshot(t2).count() ===
      src.filter($"o_orderkey" % 10 =!= 7).count())

    // delete markers honored through the global path too
    t2.upsert(src.filter($"o_orderkey" % 10 === 8)
      .withColumn(MetaCols.DeleteFlag, lit(true)))
    assert(Readers.snapshot(t2).count() ===
      src.filter($"o_orderkey" % 10 =!= 7 && $"o_orderkey" % 10 =!= 8).count())

    // insert(dropDups) dedups by key ALONE on evolved tables (the old
    // copy lives under another layout)
    val before = Readers.snapshot(t2).count()
    t2.insert(src.filter($"o_orderkey" % 10 === 1), dropDups = true)
    assert(Readers.snapshot(t2).count() === before)

    // partition pruning still works on both layouts
    assert(Readers.snapshot(t2, partitions = Some(Seq("1996"))).count() > 0)
  }

  test("stale handle refused; rollback restores the previous expression") {
    val dir = tmpDir("pevo_stale")
    val t = GraftTable.create(spark, dir.toString, cfg(TableType.CopyOnWrite))
    val src = orders.limit(300)
    t.bulkInsert(src)
    val t2 = t.alterPartitionExpr("date_format(o_orderdate, 'yyyy-MM')")
    // the pre-evolution handle must not write with the old routing
    val ex = intercept[IllegalArgumentException] {
      t.upsert(src.limit(10).withColumn("o_totalprice", lit(1.0)))
    }
    assert(ex.getMessage.contains("alterPartitionExpr"))

    // rolling back the audit commit flips the persisted expr back
    Services.rollback(t2, t2.timeline.completedInstants().last.ts)
    assert(TableConfig.load(t2.basePath).partitionPathExpr ===
      "date_format(o_orderdate, 'yyyy')")
    // the old handle is current again and writes fine
    val reloaded = GraftTable.load(spark, dir.toString)
    reloaded.upsert(src.limit(10).withColumn("o_totalprice", lit(2.0)))
    assert(Readers.snapshot(reloaded).filter($"o_totalprice" === 2.0).count() === 10)
  }

  test("MOR table evolves and merges across layouts") {
    val dir = tmpDir("pevo_mor")
    val t = GraftTable.create(spark, dir.toString, cfg(TableType.MergeOnRead))
    val src = orders.limit(500)
    t.bulkInsert(src)
    val t2 = t.alterPartitionExpr("date_format(o_orderdate, 'yyyy-MM')")
    t2.upsert(src.filter($"o_orderkey" % 3 === 0)
      .withColumn("o_totalprice", lit(333.0)))
    val snap = Readers.snapshot(t2)
    assert(snap.count() === src.count())
    assert(snap.filter($"o_totalprice" === 333.0).count() ===
      src.filter($"o_orderkey" % 3 === 0).count())
  }

  test("unresolvable or unchanged expressions are refused") {
    val dir = tmpDir("pevo_bad")
    val t = GraftTable.create(spark, dir.toString, cfg(TableType.CopyOnWrite))
    t.bulkInsert(orders.limit(50))
    intercept[IllegalArgumentException] {
      t.alterPartitionExpr("date_format(o_orderdate, 'yyyy')")
    }
    intercept[Exception] {
      t.alterPartitionExpr("date_format(no_such_col, 'yyyy')")
    }
  }
}
