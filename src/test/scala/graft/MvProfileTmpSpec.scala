package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.table.{GraftTable, MaterializedView => MV, WritePipeline}

class MvProfileTmpSpec extends AnyFunSuite {
  import SparkTestBase._
  test("profile mv gate phases at sf0.1") {
    val d = "/root/testdata/sf0.1"
    def tm[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      val p = s"/tmp/mvprof/t_$round"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(p))
      val t = GraftTable.create(spark, p, TableConfig(
        "orders_q", TableType.CopyOnWrite, Seq("o_orderkey"),
        "date_format(o_orderdate, 'yyyy')", "o_orderdate"))
      val src = spark.read.parquet(s"$d/orders.parquet")
      tm(s"r$round bulkInsert")(t.bulkInsert(src))
      val vp = s"/tmp/mvprof/v_$round"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(vp))
      val v = MV.create(spark, vp, t,
        Seq("o_orderpriority" -> "o_orderpriority"),
        Seq(MV.ViewAgg("cnt", "count", "*"),
          MV.ViewAgg("total", "sum", "o_totalprice"),
          MV.ViewAgg("min_price", "min", "o_totalprice"),
          MV.ViewAgg("avg_price", "avg", "o_totalprice")))
      tm(s"r$round sync1")(MV.sync(v, t))
      tm(s"r$round upsert")(t.upsert(src.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)))
      tm(s"r$round delete")(t.delete(src.filter(col("o_orderkey") % 5 === 0)))
      tm(s"r$round sync2")(MV.sync(v, t))
      tm(s"r$round read")(MV.read(v).collect())
    }
  }
}
