package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services, ZOrder}

/** Z-order clustering layout: multi-column locality and the file-skipping
  * it buys through per-file column stats.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestBase._

  private def ordersCfg(props: Map[String, String] = Map.empty) =
    TableConfig("orders_z", TableType.CopyOnWrite, Seq("o_orderkey"),
      "", "o_orderdate", props) // nonpartitioned: isolates the z-layout effect

  test("z-order cluster preserves rows and tightens per-file ranges on BOTH columns") {
    val dir = tmpDir("zorder")
    val t = GraftTable.create(spark, dir.toString,
      ordersCfg(Map(ConfigKeys.MaxFileSize -> (4L * 1024).toString)))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    // two disjoint loads => >1 slice, so clustering has something to do
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0))
    val commit = Services.cluster(t, zorderColumns = Seq("o_custkey", "o_totalprice"))
    assert(commit.nonEmpty, "clustering should run")
    assert(Readers.snapshot(t).count() === src.count())

    val bases = t.view.fileSlices(None).flatMap(_.baseFile)
    assert(bases.size > 3, s"want several z-files, got ${bases.size}")
    def spanFraction(colName: String): Double = {
      val los = bases.map(_.colMin(colName).toDouble)
      val his = bases.map(_.colMax(colName).toDouble)
      val glo = los.min; val ghi = his.max
      val spans = bases.indices.map(i => (his(i) - los(i)) / math.max(1e-9, ghi - glo))
      spans.sum / spans.size
    }
    // a random/hash layout gives each file ~ the full range (fraction ≈ 1);
    // z-order must tighten both dimensions simultaneously
    val fCust = spanFraction("o_custkey")
    val fPrice = spanFraction("o_totalprice")
    assert(fCust < 0.6, s"o_custkey avg span fraction $fCust")
    assert(fPrice < 0.6, s"o_totalprice avg span fraction $fPrice")
  }

  test("SPATIAL_CURVE bulk insert lays the initial load on the curve") {
    val dir = tmpDir("zorder_bi")
    val t = GraftTable.create(spark, dir.toString,
      ordersCfg(Map(ConfigKeys.MaxFileSize -> (4L * 1024).toString)))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src, sortMode = graft.table.SortMode.SpatialCurve,
      zorderColumns = Seq("o_custkey", "o_totalprice"))
    assert(Readers.snapshot(t).count() === src.count())
    val bases = t.view.fileSlices(None).flatMap(_.baseFile)
    assert(bases.size > 3, s"want several z-files, got ${bases.size}")
    def spanFraction(colName: String): Double = {
      val los = bases.map(_.colMin(colName).toDouble)
      val his = bases.map(_.colMax(colName).toDouble)
      val glo = los.min; val ghi = his.max
      val spans = bases.indices.map(i => (his(i) - los(i)) / math.max(1e-9, ghi - glo))
      spans.sum / spans.size
    }
    // both curve dimensions tight from the FIRST write — no OPTIMIZE pass
    // (a key-sorted or hash layout gives each file ~the full range ≈ 1.0;
    // with N files a 2-D curve bounds each dimension near 1/sqrt(N))
    assert(spanFraction("o_custkey") < 0.85)
    assert(spanFraction("o_totalprice") < 0.85)
    assert(spanFraction("o_custkey") * spanFraction("o_totalprice") < 0.5)
    // upserts keep working on the curve-grouped files
    t.upsert(src.limit(20).withColumn("o_totalprice", lit(1.0)))
    assert(Readers.snapshot(t)
      .filter(col("o_totalprice") === 1.0).count() === 20)
    // missing columns / bucket layouts refuse
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("zorder_bi2").toString + "/t", ordersCfg())
        .bulkInsert(src, sortMode = graft.table.SortMode.SpatialCurve)
    }
  }

  test("hilbert index: exact space-filling walk (adjacency + bijection)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def idx(coords: Seq[Long], bits: Int): Long =
      graft.functions.HilbertIndex.compute(new GenericArrayData(coords.toArray), bits)
    for ((dims, bits) <- Seq((2, 4), (3, 3))) {
      val side = 1 << bits
      val all = (0 until math.pow(side, dims).toInt).map { v =>
        val c = (0 until dims).map(d => ((v / math.pow(side, d).toInt) % side).toLong)
        c -> idx(c, bits)
      }
      // bijection onto [0, side^dims)
      assert(all.map(_._2).sorted === (0L until all.size.toLong))
      // THE Hilbert property: consecutive indices are grid neighbors
      val walk = all.sortBy(_._2).map(_._1)
      walk.sliding(2).foreach { case Seq(a, b) =>
        val manhattan = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(manhattan === 1L, s"jump between $a and $b (dims=$dims bits=$bits)")
      }
    }
  }

  test("hilbert cluster: same rows, ranges at least as tight as morton") {
    val dir = tmpDir("hilbert")
    val t = GraftTable.create(spark, dir.toString,
      ordersCfg(Map(ConfigKeys.MaxFileSize -> (4L * 1024).toString)))
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0))
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0))
    val commit = Services.cluster(t,
      zorderColumns = Seq("o_custkey", "o_totalprice"), hilbert = true)
    assert(commit.nonEmpty)
    assert(Readers.snapshot(t).count() === src.count())
    val bases = t.view.fileSlices(None).flatMap(_.baseFile)
    assert(bases.size > 3)
    def spanFraction(colName: String): Double = {
      val los = bases.map(_.colMin(colName).toDouble)
      val his = bases.map(_.colMax(colName).toDouble)
      val glo = los.min; val ghi = his.max
      val spans = bases.indices.map(i => (his(i) - los(i)) / math.max(1e-9, ghi - glo))
      spans.sum / spans.size
    }
    assert(spanFraction("o_custkey") < 0.6)
    assert(spanFraction("o_totalprice") < 0.6)
  }

  test("z-order rejects unsupported or too-few columns") {
    val dir = tmpDir("zorder_bad")
    val t = GraftTable.create(spark, dir.toString, ordersCfg())
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src)
    intercept[IllegalArgumentException](
      ZOrder.withZColumn(Readers.snapshot(t), Seq("o_custkey")))
    intercept[IllegalArgumentException](
      ZOrder.withZColumn(Readers.snapshot(t), Seq("o_custkey", "o_orderstatus")))
  }
}
