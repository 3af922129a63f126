package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Change-data-capture read ([[Readers.incrementalChanges]]): before/after
  * change images derived by diffing touched file groups — insert /
  * update_before / update_after / delete classification, clustering and
  * compaction transparency, empty windows.
  */
class IncrementalCdcSpec extends AnyFunSuite {
  import SparkTestBase._

  private def mk(name: String, tt: String = TableType.CopyOnWrite,
      props: Map[String, String] = Map.empty): GraftTable =
    GraftTable.create(spark, tmpDir(name).toString, TableConfig(
      name, tt, Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')",
      "o_orderdate", props))

  private def orders(n: Int) = {
    val df = spark.read.parquet(s"$sf001/orders.parquet")
      .orderBy("o_orderkey").limit(n).cache()
    df.count(); df
  }

  private def changes(t: GraftTable, from: String, to: Option[String] = None) =
    Readers.incrementalChanges(t, from, to)
      .select(col("o_orderkey"), col("o_totalprice"), col(Readers.ChangeTypeCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))

  test("COW: insert / update (both images) / delete classification") {
    val t = mk("cdc_cow")
    val src = orders(350)
    val base = src.filter(col("o_orderkey") % 350 < 300)
    val c1 = t.bulkInsert(base)
    t.upsert(base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    val c3 = t.delete(base.filter(col("o_orderkey") % 50 === 0))
    t.insert(src.filter(col("o_orderkey") % 350 >= 300))

    val orig = base.select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = changes(t, c1)
    val byKind = got.groupBy(_._3)
    // deletes: every mod-50 key with its ORIGINAL before image (the
    // intermediate mod-7 update of a later-deleted key must not surface)
    val delKeys = orig.keySet.filter(_ % 50 == 0)
    assert(byKind("delete").map(_._1).toSet === delKeys)
    byKind("delete").foreach { case (k, p, _) => assert(p === orig(k)) }
    // updates: mod-7 keys that survived, before=original, after=doubled
    val updKeys = orig.keySet.filter(k => k % 7 == 0 && k % 50 != 0)
    assert(byKind("update_before").map(_._1).toSet === updKeys)
    assert(byKind("update_after").map(_._1).toSet === updKeys)
    byKind("update_before").foreach { case (k, p, _) => assert(p === orig(k)) }
    byKind("update_after").foreach { case (k, p, _) => assert(p === orig(k) * 2) }
    // inserts: the 50 rows added after the window start
    assert(byKind("insert").map(_._1).toSet ===
      src.filter(col("o_orderkey") % 350 >= 300)
        .collect().map(_.getLong(0)).toSet)
    // bounded sub-window: (c1, c3] excludes the later insert commit
    val sub = changes(t, c1, Some(c3)).groupBy(_._3)
    assert(!sub.contains("insert"))
    assert(sub("delete").map(_._1).toSet === delKeys)
    src.unpersist()
  }

  test("clustering inside the window is physical, not a change") {
    // two bulk inserts ⇒ two small groups per partition ⇒ the cluster
    // plan has real work (same setup as ClusteringServiceSpec)
    val t = mk("cdc_cluster")
    val src = orders(300)
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    val c1 = t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0))
    t.upsert(src.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    assert(Services.cluster(t).nonEmpty)
    val got = changes(t, c1).groupBy(_._3)
    val updKeys = src.filter(col("o_orderkey") % 5 === 0)
      .collect().map(_.getLong(0)).toSet
    // relocated records must not be misread as deletes/inserts
    assert(got.keySet === Set("update_before", "update_after"))
    assert(got("update_after").map(_._1).toSet === updKeys)
    src.unpersist()
  }

  test("MOR: delta updates and tombstones classify; compaction transparent") {
    val t = mk("cdc_mor", TableType.MergeOnRead,
      Map("graft.compact.inline" -> "false"))
    val src = orders(300)
    val c1 = t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", lit(7.0)))
    t.delete(src.filter(col("o_orderkey") % 10 === 0))
    def check(): Unit = {
      val got = changes(t, c1).groupBy(_._3)
      val keys = src.collect().map(_.getLong(0)).toSet
      assert(got("delete").map(_._1).toSet === keys.filter(_ % 10 == 0))
      assert(got("update_after").map(_._1).toSet ===
        keys.filter(k => k % 3 == 0 && k % 10 != 0))
      got("update_after").foreach { case (_, p, _) => assert(p === 7.0) }
    }
    check()
    assert(Services.compact(t).nonEmpty)
    check() // same logical answer after the physical rewrite
    src.unpersist()
  }

  test("SQL: FROM table_changes('view', begin) mirrors the reader") {
    val t = mk("cdc_tvf")
    val src = orders(60)
    val c1 = t.bulkInsert(src)
    t.upsert(src.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 3))
    t.delete(src.filter(col("o_orderkey") % 20 === 0))
    spark.read.format("graft").load(t.basePath.toString)
      .createOrReplaceTempView("cdc_tvf_v")

    val viaSql = spark.sql(
      s"SELECT o_orderkey, o_totalprice, ${Readers.ChangeTypeCol} " +
        s"FROM table_changes('cdc_tvf_v', '$c1') ORDER BY 1, 3")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val viaReader = changes(t, c1).sortBy(r => (r._1, r._3))
    assert(viaSql.toSeq === viaReader.toSeq && viaSql.nonEmpty)

    // composes with ordinary SQL (aggregation over the change feed)
    val n = spark.sql(
      s"SELECT count(*) FROM table_changes('cdc_tvf_v', '$c1') " +
        s"WHERE ${Readers.ChangeTypeCol} = 'delete'").first().getLong(0)
    assert(n === src.filter(col("o_orderkey") % 20 === 0).count())

    // a non-graft name keeps Spark's own unknown-TVF error
    spark.range(3).createOrReplaceTempView("cdc_plain_v")
    intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('cdc_plain_v', '0')").collect()
    }
  }

  test("empty window returns an empty, correctly-shaped frame") {
    val t = mk("cdc_empty")
    val src = orders(100)
    t.bulkInsert(src)
    val latest = t.timeline.lastCompleted().get.ts
    val df = Readers.incrementalChanges(t, latest)
    assert(df.columns.contains(Readers.ChangeTypeCol))
    assert(df.count() === 0)
    src.unpersist()
  }
}
