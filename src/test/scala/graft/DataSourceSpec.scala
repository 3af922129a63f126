package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class DataSourceSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("format(graft): write creates table, read round-trips, options route ops") {
    val dir = tmpDir("ds1").toString + "/t"
    val df = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v")
    df.write.format("graft")
      .option("recordKeyFields", "id")
      .option("precombineField", "ver")
      .option("operation", "bulk_insert")
      .save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 2)
    assert(back.columns.contains("_hoodie_record_key"))

    // second write without table options: config comes from the table
    Seq((1L, 2L, "a2"), (3L, 1L, "c")).toDF("id", "ver", "v")
      .write.format("graft").mode(SaveMode.Append).save(dir)
    val snap = spark.read.format("graft").load(dir)
    assert(snap.count() === 3)
    assert(snap.filter($"id" === 1L).select("v").first().getString(0) === "a2")

    // delete routes through the delete op
    Seq((3L, 9L, "x")).toDF("id", "ver", "v")
      .write.format("graft").option("operation", "delete").mode(SaveMode.Append).save(dir)
    assert(spark.read.format("graft").load(dir).count() === 2)
  }

  test("format(graft): filter/column pushdown reaches the inner parquet scan") {
    val dir = tmpDir("ds2").toString + "/t"
    spark.read.parquet(s"$sf001/orders.parquet")
      .write.format("graft")
      .option("recordKeyFields", "o_orderkey")
      .option("partitionPathExpr", "date_format(o_orderdate, 'yyyy')")
      .option("precombineField", "o_orderdate")
      .option("operation", "bulk_insert")
      .save(dir)
    val q = spark.read.format("graft").load(dir)
      .filter($"o_totalprice" > 100000.0)
      .select("o_orderkey", "o_totalprice")
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"expected pushdown in plan:\n$plan")
  }

  test("format(graft): incremental and time-travel query types") {
    val dir = tmpDir("ds3").toString + "/t"
    Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "bulk_insert").save(dir)
    val t = graft.table.GraftTable.load(spark, dir)
    val c1 = t.timeline.lastCompleted().get.ts
    Seq((2L, 2L, "b2")).toDF("id", "ver", "v")
      .write.format("graft").mode(SaveMode.Append).save(dir)

    val inc = spark.read.format("graft")
      .option("queryType", "incremental").option("beginInstant", c1).load(dir)
    assert(inc.count() === 1)
    assert(inc.select("v").first().getString(0) === "b2")

    val tt = spark.read.format("graft")
      .option("queryType", "snapshot").option("asOfInstant", c1).load(dir)
    assert(tt.filter($"id" === 2L).select("v").first().getString(0) === "b")

    // CDC query type: change images instead of latest states
    val cdc = spark.read.format("graft")
      .option("queryType", "incremental_cdc").option("beginInstant", c1).load(dir)
      .select("id", "v", graft.read.Readers.ChangeTypeCol)
      .as[(Long, String, String)].collect().toSet
    assert(cdc === Set((2L, "b", "update_before"), (2L, "b2", "update_after")))

    // incremental glob prune (table is unpartitioned → "" partition path:
    // "*" matches it, a non-empty literal does not)
    assert(spark.read.format("graft")
      .option("queryType", "incremental").option("beginInstant", c1)
      .option("incrPathGlob", "*").load(dir).count() === 1)
    assert(spark.read.format("graft")
      .option("queryType", "incremental").option("beginInstant", c1)
      .option("incrPathGlob", "2024/*").load(dir).count() === 0)

    // commitMeta.* options ride into the commit's extraMetadata (keys
    // arrive lowercased — Spark's option map is case-insensitive)
    Seq((3L, 1L, "c")).toDF("id", "ver", "v")
      .write.format("graft").mode(SaveMode.Append)
      .option("commitMeta.source.offset", "topic,0:42").save(dir)
    val lastMd = graft.core.CommitMetadata.fromJson(
      t.timeline.readContent(t.timeline.completedDataInstants().last))
    assert(lastMd.extraMetadata.get("source.offset").contains("topic,0:42"))
  }

  test("small graft dim reports real sizeInBytes and auto-broadcasts in SQL joins") {
    val dir = tmpDir("ds_stats").toString + "/dim"
    (1L to 50L).map(i => (i, 1L, s"seg${i % 5}")).toDF("id", "ver", "seg")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "bulk_insert").save(dir)
    val dim = spark.read.format("graft")
      .option("includeMetaColumns", "false").load(dir)
    // stats must reflect live file bytes, not spark.sql.defaultSizeInBytes
    val size = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size > 0 && size < 10L * 1024 * 1024,
      s"graft dim reports sizeInBytes=$size — joins would never broadcast")

    dim.createOrReplaceTempView("bc_dim")
    spark.range(0, 10000).withColumn("id", $"id" % 50 + 1)
      .createOrReplaceTempView("bc_fact")
    val joined = spark.sql(
      "SELECT f.id, d.seg FROM bc_fact f JOIN bc_dim d ON f.id = d.id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft dim did not auto-broadcast:\n$plan")

    // non-latest shapes must NOT report live bytes: an as-of or change
    // window can read not-yet-cleaned old versions far bigger than the
    // live set, and auto-broadcasting such a scan would OOM
    val firstTs = graft.table.GraftTable.load(spark, dir)
      .timeline.completedDataInstants().head.ts
    for (histOpts <- Seq(
        Map("asOfInstant" -> firstTs),
        Map("queryType" -> "incremental", "beginInstant" -> "0"))) {
      val hist = histOpts.foldLeft(spark.read.format("graft"))(
        (r, kv) => r.option(kv._1, kv._2)).load(dir)
      val hSize = hist.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(hSize >= BigInt(10L * 1024 * 1024),
        s"historical read ($histOpts) reports live-ish size $hSize — " +
          "could auto-broadcast a large historical scan")
    }
  }

  test("writeStream.format(graft) upserts micro-batches") {
    val tableDir = tmpDir("ds4").toString + "/t"
    val srcDir = tmpDir("ds4src")
    val ckpt = tmpDir("ds4ckpt").toString
    Seq((1L, 1L, "s1"), (2L, 1L, "s2")).toDF("id", "ver", "v")
      .write.mode("overwrite").parquet(srcDir.toString)
    val q = spark.readStream
      .schema("id LONG, ver LONG, v STRING")
      .parquet(srcDir.toString)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("recordKeyFields", "id")
      .option("precombineField", "ver")
      .start(tableDir)
    q.processAllAvailable(); q.stop()
    assert(spark.read.format("graft").load(tableDir).count() === 2)
  }
}
