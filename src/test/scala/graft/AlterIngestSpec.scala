package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.core._
import graft.read.Readers
import graft.streaming.{DfsSource, IngestJob, SqlSource}
import graft.table.GraftTable

/** ALTER TABLE CHANGE COLUMN / RENAME (schema evolution beyond ADD) and
  * the DFS-drop ingest source with mod-time checkpointing.
  */
class AlterIngestSpec extends AnyFunSuite {
  import SparkTestBase._

  private def ordersCfg = TableConfig("orders_ai", TableType.CopyOnWrite,
    Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')", "o_orderdate")

  test("dropColumn: plan-time removal, writable after, schema-as-of shows it before") {
    val dir = tmpDir("alter_drop")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    val c1 = t.bulkInsert(src)
    t.dropColumn("o_orderpriority")
    val snap = Readers.snapshot(t)
    assert(!snap.columns.contains("o_orderpriority"))
    assert(snap.count() === src.count())
    // still writable; a batch WITHOUT the column keeps it dropped
    t.upsert(src.drop("o_orderpriority").filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    assert(Readers.snapshot(t).count() === src.count())
    assert(!Readers.snapshot(t).columns.contains("o_orderpriority"))
    // a batch that DOES carry it re-adds it by additive evolution (same
    // contract as other lakehouse engines) — drop is not a tombstone
    t.upsert(src.filter(col("o_orderkey") % 8 === 0))
    assert(Readers.snapshot(t).columns.contains("o_orderpriority"))
    t.dropColumn("o_orderpriority")
    // time travel BEFORE the drop reads with the then-current schema
    val before = Readers.timeTravel(t, c1)
    assert(before.columns.contains("o_orderpriority"))
    assert(before.filter(col("o_orderpriority").isNotNull).count() > 0)
    // load-bearing columns refuse
    intercept[IllegalArgumentException](t.dropColumn("o_orderkey"))
    intercept[IllegalArgumentException](t.dropColumn("o_orderdate"))
  }

  test("changeColumn widens a type; pre-widening files read widened") {
    val dir = tmpDir("alter_widen")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    t.bulkInsert(src.withColumn("o_totalprice", col("o_totalprice").cast("float")))
    t.changeColumn("o_totalprice", DoubleType)
    assert(t.latestSchema.get("o_totalprice").dataType === DoubleType)
    // untouched float files surface as double
    val snap = Readers.snapshot(t)
    assert(snap.schema("o_totalprice").dataType === DoubleType)
    assert(snap.count() === src.count())
    // post-widening writes carry full double precision
    t.upsert(src.filter(col("o_orderkey") % 4 === 0))
    val after = Readers.snapshot(t).cache()
    val exact = after.join(src.select(col("o_orderkey"), col("o_totalprice").as("exp")), "o_orderkey")
      .filter(col("o_orderkey") % 4 === 0)
      .filter(col("o_totalprice") === col("exp")).count()
    assert(exact === src.filter(col("o_orderkey") % 4 === 0).count())
    after.unpersist()
  }

  test("time travel below a schema-evolution commit shows the old schema") {
    val t = GraftTable.create(spark, tmpDir("tt_schema").toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(200).cache()
    src.count()
    val c1 = t.bulkInsert(src)
    t.upsert(src.limit(40).withColumn("note", lit("x"))) // additive evolution
    // head: evolved schema, nulls backfilled
    assert(Readers.snapshot(t).columns.contains("note"))
    // pinned below the evolution: the schema the table HAD at c1
    val pinned = Readers.timeTravel(t, c1)
    assert(!pinned.columns.contains("note"),
      "time travel leaked a column added after the pinned instant")
    assert(pinned.count() === 200)
    src.unpersist()
  }

  test("changeColumn rejects narrowing and unknown columns") {
    val dir = tmpDir("alter_reject")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    t.bulkInsert(spark.read.parquet(s"$sf001/orders.parquet"))
    intercept[IllegalArgumentException](t.changeColumn("o_totalprice", IntegerType))
    intercept[IllegalArgumentException](t.changeColumn("no_such_col", LongType))
  }

  test("nested ADD pre-declares a struct field; narrow pads, wide populates") {
    val t = GraftTable.create(spark, tmpDir("alter_nested_add").toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(200).cache()
    src.count()
    t.bulkInsert(src.withColumn("meta", struct(col("o_orderstatus").as("st"))))
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "meta.pri", org.apache.spark.sql.types.StringType)))
    // schema-only commit: the declared field reads back as typed null
    val declared = Readers.snapshot(t)
    assert(declared.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq === Seq("st", "pri"))
    assert(declared.filter(col("meta.pri").isNotNull).count() === 0)
    assert(declared.count() === 200)
    // a post-ALTER NARROW batch pads instead of regressing the schema
    t.upsert(src.limit(40).withColumn("meta", struct(lit("X").as("st"))))
    val afterNarrow = t.latestSchema.get("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(afterNarrow.fieldNames.toSeq === Seq("st", "pri"),
      "narrow batch after nested ALTER regressed the declared field")
    // a wide batch populates it
    t.upsert(src.limit(10).withColumn("meta",
      struct(col("o_orderstatus").as("st"), lit("HI").as("pri"))))
    assert(Readers.snapshot(t).filter(col("meta.pri") === "HI").count() === 10)
    // duplicate nested add refuses with the path named
    val e = intercept[IllegalArgumentException](t.addColumns(Seq(
      org.apache.spark.sql.types.StructField(
        "meta.pri", org.apache.spark.sql.types.StringType))))
    assert(e.getMessage.contains("meta.pri"))
    src.unpersist()
  }

  test("nested changeColumn widens a struct leaf; narrowing refuses") {
    val t = GraftTable.create(spark, tmpDir("alter_nested_widen").toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(100)
    t.bulkInsert(src.withColumn("meta",
      struct(col("o_custkey").cast("int").as("ck"))))
    t.changeColumn("meta.ck", LongType)
    val snap = Readers.snapshot(t)
    assert(snap.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("ck").dataType === LongType)
    assert(snap.filter(col("meta.ck").isNotNull).count() === snap.count())
    intercept[IllegalArgumentException](t.changeColumn("meta.ck", IntegerType))
    intercept[IllegalArgumentException](t.changeColumn("meta.nope", LongType))
    intercept[IllegalArgumentException](t.changeColumn("o_orderstatus.x", LongType))
  }

  test("nested dropColumn vanishes at plan time; last-field drop refuses") {
    val t = GraftTable.create(spark, tmpDir("alter_nested_drop").toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(100)
    val c1 = t.bulkInsert(src.withColumn("meta",
      struct(col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"))))
    t.dropColumn("meta.pri")
    val snap = Readers.snapshot(t)
    assert(snap.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq === Seq("st"))
    assert(snap.count() === 100)
    // time travel before the drop still shows the field, populated
    val before = Readers.timeTravel(t, c1)
    assert(before.filter(col("meta.pri").isNotNull).count() === 100)
    // the struct's only remaining field refuses (empty struct unreadable)
    val e = intercept[IllegalArgumentException](t.dropColumn("meta.st"))
    assert(e.getMessage.contains("only field"))
  }

  test("renameTable updates config in place") {
    val dir = tmpDir("alter_rename")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    t.bulkInsert(spark.read.parquet(s"$sf001/orders.parquet"))
    val renamed = t.renameTable("orders_renamed")
    assert(renamed.cfg.tableName === "orders_renamed")
    assert(TableConfig.load(new org.apache.hadoop.fs.Path(dir.toString)).tableName === "orders_renamed")
    assert(Readers.snapshot(renamed).count() > 0)
  }

  test("DfsSource ingests only files newer than the checkpoint") {
    val dir = tmpDir("ingest_dfs")
    val drop = tmpDir("ingest_drop")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    val src = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

    def dropBatch(df: org.apache.spark.sql.DataFrame, sub: String, mtime: Long): Unit = {
      df.write.parquet(s"$drop/$sub")
      graft.core.PathIO.walk(Paths.get(s"$drop/$sub")).foreach(p =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(mtime)))
    }

    val source = new DfsSource(drop.toString)
    dropBatch(src.filter(col("o_orderkey") % 2 === 0), "b1", 1000000L)
    val c1 = IngestJob.syncOnce(spark, source, t)
    assert(c1.isDefined)
    assert(IngestJob.lastCheckpoint(t) === Some("1000000"))
    val n1 = Readers.snapshot(t).count()
    assert(n1 === src.filter(col("o_orderkey") % 2 === 0).count())

    // nothing new -> no commit
    assert(IngestJob.syncOnce(spark, source, t).isEmpty)
    assert(t.timeline.completedDataInstants().size === 1)

    // second drop at a later mod time: only its rows are added
    dropBatch(src.filter(col("o_orderkey") % 2 =!= 0), "b2", 2000000L)
    val c2 = IngestJob.syncOnce(spark, source, t)
    assert(c2.isDefined)
    assert(IngestJob.lastCheckpoint(t) === Some("2000000"))
    assert(Readers.snapshot(t).count() === src.count())
  }

  test("DfsSource ingests gzip-compressed jsonl drops") {
    val dir = tmpDir("ingest_gz")
    val drop = tmpDir("ingest_gzdrop")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "gz_docs", TableType.CopyOnWrite, Seq("id"), "", ""))
    val gz = Paths.get(s"$drop/docs.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(
      "{\"id\": 1, \"text\": \"alpha\"}\n{\"id\": 2, \"text\": \"beta\"}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    Files.setLastModifiedTime(gz, FileTime.fromMillis(1000000L))
    val source = new DfsSource(drop.toString, format = "json",
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "id LONG, text STRING")))
    assert(IngestJob.syncOnce(spark, source, t).isDefined)
    val got = Readers.snapshot(t).select("id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Array((1L, "alpha"), (2L, "beta")))
  }

  test("SqlSource runs the query each tick; transformer applies") {
    val dir = tmpDir("ingest_sql")
    val t = GraftTable.create(spark, dir.toString, ordersCfg)
    spark.read.parquet(s"$sf001/orders.parquet").limit(100)
      .createOrReplaceTempView("ai_orders_src")
    val source = new SqlSource("SELECT * FROM ai_orders_src")
    IngestJob.syncOnce(spark, source, t,
      transform = _.withColumn("o_orderpriority", lit("INGESTED")))
    val snap = Readers.snapshot(t)
    assert(snap.count() === 100)
    assert(snap.filter(col("o_orderpriority") === "INGESTED").count() === 100)
  }

  test("sqlFileTransformer reads its template from a file") {
    val f = tmpDir("sqlfile").resolve("tr.sql")
    Files.writeString(f, "SELECT o_orderkey, o_totalprice * 10 AS o_totalprice FROM <SRC>")
    val src = spark.read.parquet(s"$sf001/orders.parquet").limit(5)
    val out = graft.streaming.Streaming.sqlFileTransformer(f.toString)(src)
    assert(out.columns.toSeq === Seq("o_orderkey", "o_totalprice"))
    assert(out.agg(min(col("o_totalprice"))).head.getDouble(0) >=
      src.agg(min(col("o_totalprice") * 10)).head.getDouble(0))
  }
}
