package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.table.{GraftTable, SecondaryIndex, Services, SortMode}
import graft.read.Readers

/** SECONDARY index: persisted value → file-group mappings for non-key
  * columns — lookup parity with a full filtered scan, group-set pruning,
  * value-move updates, catch-up over foreign commits, clustering remap,
  * dead groups after partition drops, rewind rebuild, MOR, and the
  * unindexed-column fallback.
  */
class SecondaryIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  private def secCfg(extra: Map[String, String] = Map.empty) = TableConfig(
    tableName = "orders_sec",
    tableType = TableType.CopyOnWrite,
    recordKeyFields = Seq("o_orderkey"),
    partitionPathExpr = "date_format(o_orderdate, 'yyyy')",
    precombineField = "o_orderdate",
    props = Map(ConfigKeys.SecondaryIndexColumns -> "o_custkey",
      // small files so the table has many groups and pruning is visible
      ConfigKeys.MaxFileSize -> (64L * 1024).toString,
      ConfigKeys.SmallFileLimit -> (48L * 1024).toString) ++ extra)

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  private def expected(src: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
    src.filter(col("o_custkey").cast("string").isin(keys: _*))

  test("lookupBy == filtered snapshot; probe reads strictly fewer groups") {
    val dir = tmpDir("sec_basic")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    assert(TableConfig.exists(SecondaryIndex.indexPath(t, "o_custkey")))

    val keys = Seq("7", "421", "1000")
    val got = t.lookupBy("o_custkey", keys)
    val want = expected(orders, keys)
    assert(got.count() === want.count())
    assert(got.select("o_orderkey").except(want.select("o_orderkey")).count() === 0)

    val groups = SecondaryIndex.probeGroups(t, "o_custkey", keys).get
    val total = t.view.fileSlices(None).size
    assert(groups.nonEmpty && groups.size < total,
      s"probe did not prune: ${groups.size} of $total groups")
  }

  test("updating the indexed value moves the lookup result") {
    val dir = tmpDir("sec_move")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    // move every order of custkey 7 to custkey 999999
    val moved = orders.filter(col("o_custkey") === 7)
      .withColumn("o_custkey", lit(999999L))
    t.upsert(moved)
    assert(t.lookupBy("o_custkey", Seq("999999")).count() === moved.count())
    // stale (old-value → group) mappings survive as false positives only:
    // the residual filter drops them
    assert(t.lookupBy("o_custkey", Seq("7")).count() === 0)
  }

  test("catch-up: commits from a foreign handle are replayed before a probe") {
    val dir = tmpDir("sec_catchup")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    // a second handle that does NOT maintain the index writes new rows
    val plain = GraftTable.load(spark, dir.toString)
    val news = orders.limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      .withColumn("o_custkey", lit(777777L))
    plain.upsert(news)
    // the original handle's next probe must see them (false negatives are
    // the one forbidden failure mode)
    assert(t.lookupBy("o_custkey", Seq("777777")).count() === 50)
  }

  test("clustering remaps groups; lookup follows the replacecommit") {
    val dir = tmpDir("sec_cluster")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    val src = orders
    t.bulkInsert(src.filter(col("o_orderkey") % 2 === 0), SortMode.NoSort)
    t.bulkInsert(src.filter(col("o_orderkey") % 2 =!= 0), SortMode.NoSort)
    Services.cluster(t, sortColumns = Seq("o_custkey"))
    val keys = Seq("42", "911")
    val got = t.lookupBy("o_custkey", keys)
    assert(got.count() === expected(src, keys).count())
    // after clustering, sorted-by-custkey layout + pruning: few groups
    val groups = SecondaryIndex.probeGroups(t, "o_custkey", keys).get
    assert(groups.size < t.view.fileSlices(None).size)
  }

  test("delete_partition: mappings into dead groups are invisible") {
    val dir = tmpDir("sec_droppart")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    val part = "1995"
    val inPart = orders.filter(date_format(col("o_orderdate"), "yyyy") === part)
    val key = inPart.select("o_custkey").first().getLong(0).toString
    val before = t.lookupBy("o_custkey", Seq(key)).count()
    assert(before > 0)
    t.deletePartitions(Seq(part))
    val want = expected(orders, Seq(key))
      .filter(date_format(col("o_orderdate"), "yyyy") =!= part).count()
    assert(t.lookupBy("o_custkey", Seq(key)).count() === want)
  }

  test("timeline rewind triggers a rebuild; lookups stay exact") {
    val dir = tmpDir("sec_rewind")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    val upd = orders.filter(col("o_custkey") === 421)
      .withColumn("o_custkey", lit(424242L))
    val ts = t.upsert(upd)
    Services.rollback(t, ts)
    // the applied watermark points at a vanished instant → full rebuild
    assert(t.lookupBy("o_custkey", Seq("424242")).count() === 0)
    assert(t.lookupBy("o_custkey", Seq("421")).count() ===
      expected(orders, Seq("421")).count())
  }

  test("MOR: probes read through delta merges") {
    val dir = tmpDir("sec_mor")
    val t = GraftTable.create(spark, dir.toString,
      secCfg(Map("graft.compact.inline" -> "false"))
        .copy(tableType = TableType.MergeOnRead))
    t.bulkInsert(orders, SortMode.NoSort)
    val upd = orders.filter(col("o_custkey") === 1000)
      .withColumn("o_totalprice", lit(123.45))
    t.upsert(upd) // delta files
    val got = t.lookupBy("o_custkey", Seq("1000"))
    assert(got.count() === upd.count())
    assert(got.filter(col("o_totalprice") === 123.45).count() === upd.count())
  }

  test("plan-time file pruning: WHERE on the indexed column lists fewer files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir("sec_plan")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)

    def listedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.executedPlan
        .collectFirst { case f: FileSourceScanExec => f }.get
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    val all = listedFiles(Readers.snapshot(t))
    val pruned = Readers.snapshot(t).filter(col("o_custkey") === 421L)
    assert(listedFiles(pruned) < all,
      s"equality on the indexed column did not prune (listed all $all files)")
    assert(pruned.count() === orders.filter(col("o_custkey") === 421).count())
    // IN-list probes prune too
    val inPruned = Readers.snapshot(t)
      .filter(col("o_custkey").isin(421L, 1000L))
    assert(listedFiles(inPruned) < all)
    assert(inPruned.count() ===
      orders.filter(col("o_custkey").isin(421L, 1000L)).count())

    // a STALE index (foreign handle wrote without maintaining it) must
    // not prune — full listing, still-correct rows
    val plain = GraftTable.load(spark, dir.toString)
    plain.upsert(orders.limit(20)
      .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
      .withColumn("o_custkey", lit(421L)))
    val afterForeign = Readers.snapshot(t).filter(col("o_custkey") === 421L)
    assert(afterForeign.count() ===
      orders.filter(col("o_custkey") === 421).count() + 20)

    // time travel never consults the index (current-live mapping would
    // false-negative replaced groups)
    val firstTs = t.timeline.completedInstants().head.ts
    val tt = Readers.snapshot(t, asOf = Some(firstTs))
      .filter(col("o_custkey") === 421L)
    assert(tt.count() === orders.filter(col("o_custkey") === 421).count())
  }

  test("NESTED column secondary index: lookupBy parity + plan-time pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir("sec_nested")
    val t = GraftTable.create(spark, dir.toString, secCfg(
      Map(ConfigKeys.SecondaryIndexColumns -> "meta.ck")))
    val src = orders.withColumn("meta",
      struct(col("o_custkey").as("ck"), col("o_orderstatus").as("st")))
      .drop("o_custkey")
    t.bulkInsert(src, SortMode.NoSort)
    assert(TableConfig.exists(SecondaryIndex.indexPath(t, "meta.ck")))

    // lookupBy on the dotted name == nested-filtered snapshot
    val keys = Seq("7", "421")
    val got = t.lookupBy("meta.ck", keys)
    val want = src.filter(col("meta.ck").cast("string").isin(keys: _*))
    assert(got.count() === want.count())
    assert(got.select("o_orderkey").except(want.select("o_orderkey")).count() === 0)

    // WHERE meta.ck = v prunes listed files through the index probe
    def listedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.executedPlan
        .collectFirst { case f: FileSourceScanExec => f }.get
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    val all = listedFiles(Readers.snapshot(t))
    val pruned = Readers.snapshot(t).filter(col("meta.ck") === 421L)
    assert(listedFiles(pruned) < all,
      s"nested indexed equality did not prune (listed all $all files)")
    assert(pruned.count() === want.filter(col("meta.ck") === 421L).count())
  }

  test("unindexed column falls back to the filtered snapshot") {
    val dir = tmpDir("sec_fallback")
    val t = GraftTable.create(spark, dir.toString, secCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    val got = t.lookupBy("o_orderpriority", Seq("1-URGENT"))
    assert(got.count() ===
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  // month bucket (selective, partition-correlated: a month lives in one
  // year partition) + case-folded status (move semantics)
  private def exprCfg() = secCfg(Map(
    ConfigKeys.SecondaryIndexExpressions ->
      "om:date_format(o_orderdate, 'yyyyMM');stlc:lower(o_orderstatus)"))

  private def monthOf(t: GraftTable): String = Readers.snapshot(t)
    .select(date_format(col("o_orderdate"), "yyyyMM").as("m"))
    .groupBy("m").count().orderBy("count").first().getString(0)

  test("expression index: lookupBy by name == expression-filtered snapshot; probe prunes") {
    val dir = tmpDir("sec_expr")
    val t = GraftTable.create(spark, dir.toString, exprCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    assert(TableConfig.exists(SecondaryIndex.indexPath(t, "om")))
    assert(TableConfig.exists(SecondaryIndex.indexPath(t, "stlc")))

    val m = monthOf(t)
    val got = t.lookupBy("om", Seq(m))
    val want = orders.filter(date_format(col("o_orderdate"), "yyyyMM") === m)
    assert(got.count() === want.count())
    assert(got.select("o_orderkey").except(want.select("o_orderkey")).count() === 0)

    val groups = SecondaryIndex.probeGroups(t, "om", Seq(m)).get
    val total = t.view.fileSlices(None).size
    assert(groups.nonEmpty && groups.size < total,
      s"expression probe did not prune: ${groups.size} of $total groups")
  }

  test("expression index: updating a source column moves the indexed value") {
    val dir = tmpDir("sec_expr_move")
    val t = GraftTable.create(spark, dir.toString, exprCfg())
    t.bulkInsert(orders, SortMode.NoSort)
    val moved = orders.filter(col("o_orderkey") === 42)
      .withColumn("o_orderstatus", lit("ZZ"))
    t.upsert(moved)
    // the probe value is the EXPRESSION's output (lower case), found via
    // the index after the value moved
    val got = t.lookupBy("stlc", Seq("zz"))
    assert(got.count() === 1)
    assert(got.first().getAs[Long]("o_orderkey") === 42L)
  }

  test("expression index: plan-time pruning for WHERE on the expression") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir("sec_expr_plan")
    val t = GraftTable.create(spark, dir.toString, exprCfg())
    t.bulkInsert(orders, SortMode.NoSort)

    def listedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.executedPlan
        .collectFirst { case f: FileSourceScanExec => f }.get
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    val m = monthOf(t)
    val all = listedFiles(Readers.snapshot(t))
    val pruned = Readers.snapshot(t)
      .filter(expr(s"date_format(o_orderdate, 'yyyyMM') = '$m'"))
    assert(listedFiles(pruned) < all,
      s"equality on the indexed expression did not prune (listed all $all files)")
    assert(pruned.count() ===
      orders.filter(date_format(col("o_orderdate"), "yyyyMM") === m).count())
    // IN-list form prunes too
    val inPruned = Readers.snapshot(t)
      .filter(expr(s"date_format(o_orderdate, 'yyyyMM') in ('$m')"))
    assert(listedFiles(inPruned) < all)
    assert(inPruned.count() === pruned.count())
    // a DIFFERENT expression shape must not consult the index (and the
    // scan stays correct by reading everything)
    val other = Readers.snapshot(t)
      .filter(expr(s"date_format(o_orderdate, 'yyyy-MM') = '$m'"))
    assert(other.count() === 0)
  }
}
