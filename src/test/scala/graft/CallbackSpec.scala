package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.table.GraftTable

/** Commit callbacks (reference HoodieWriteCommitCallback): fire once per
  * successful data commit with the commit's identity and counts; never
  * fire for failed writes.
  */
class CallbackSpec extends AnyFunSuite {
  import SparkTestBase._

  test("callback fires per successful commit, not on failure") {
    val dir = tmpDir("cb")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "cb_t", TableType.CopyOnWrite, Seq("o_orderkey"),
      "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
    val seen = scala.collection.mutable.ArrayBuffer[GraftTable.CommitCallbackMessage]()
    t.registerCommitCallback(seen += _)
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(200).cache()
    src.count()
    val c1 = t.bulkInsert(src)
    val c2 = t.upsert(src.limit(50).withColumn("o_totalprice", lit(1.0)))
    assert(seen.map(_.commitTime) === Seq(c1, c2))
    assert(seen.head.operationType === "bulk_insert")
    assert(seen.head.tableName === "cb_t")
    assert(seen.head.numWrites === 200)
    // a failing write publishes nothing and must not fire
    intercept[Exception] {
      t.upsert(src.withColumn("o_orderdate", expr("assert_true(false)")))
    }
    assert(seen.size === 2)
    src.unpersist()
  }
}
