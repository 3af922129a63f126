package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SqlDmlSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def makeView(name: String): String = {
    val dir = tmpDir(s"sql_$name").toString + "/t"
    Seq((1L, 1L, 10.0, "a"), (2L, 1L, 20.0, "b"), (3L, 1L, 30.0, "c"))
      .toDF("id", "ver", "price", "tag")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "bulk_insert")
      .save(dir)
    spark.read.format("graft").option("includeMetaColumns", "false")
      .load(dir).createOrReplaceTempView(name)
    dir
  }

  private def reread(dir: String, name: String): Unit =
    spark.read.format("graft").option("includeMetaColumns", "false")
      .load(dir).createOrReplaceTempView(name)

  test("SQL UPDATE rewrites through the engine") {
    val dir = makeView("tu")
    spark.sql("UPDATE tu SET price = price * 10, tag = 'up' WHERE id >= 2")
    reread(dir, "tu")
    val got = spark.sql("SELECT id, price, tag FROM tu ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got === Array((1L, 10.0, "a"), (2L, 200.0, "up"), (3L, 300.0, "up")))
  }

  test("SQL UPDATE and MERGE assign NESTED struct fields") {
    val dir = tmpDir("sql_nested_set").toString + "/t"
    Seq((1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "c", 30L))
      .toDF("id", "ver", "st", "n")
      .select($"id", $"ver", struct($"st", $"n").as("meta"))
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "bulk_insert")
      .save(dir)
    def rr(): Unit = spark.read.format("graft")
      .option("includeMetaColumns", "false")
      .load(dir).createOrReplaceTempView("tns")
    rr()
    // nested UPDATE: only the named field changes; siblings carried
    spark.sql("UPDATE tns SET meta.st = 'UP' WHERE id >= 2")
    rr()
    val got = spark.sql("SELECT id, meta.st, meta.n FROM tns ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got === Array((1L, "a", 10L), (2L, "UP", 20L), (3L, "UP", 30L)))
    // nested MERGE SET: field from source, sibling untouched
    Seq((2L, 2L, 999L), (3L, 2L, 888L)).toDF("id", "ver", "nn")
      .createOrReplaceTempView("src_ns")
    spark.sql("""
      MERGE INTO tns t USING src_ns s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET meta.n = s.nn, ver = s.ver""")
    rr()
    val got2 = spark.sql("SELECT id, meta.st, meta.n FROM tns ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got2 === Array((1L, "a", 10L), (2L, "UP", 999L), (3L, "UP", 888L)))
    // a missing nested path refuses named instead of silently no-oping
    val e = intercept[Exception] {
      spark.sql("UPDATE tns SET meta.nope = 'x' WHERE id = 1")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("SQL DELETE rewrites through the engine") {
    val dir = makeView("td")
    spark.sql("DELETE FROM td WHERE tag = 'b'")
    reread(dir, "td")
    assert(spark.sql("SELECT count(*) FROM td").first().getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM td WHERE id = 2").first().getLong(0) === 0)
  }

  test("MERGE evolves the schema: new source columns become table columns") {
    val dir = makeView("tev")
    Seq((2L, 2L, 50.0, "s2", "noteB"), (9L, 1L, 90.0, "new", "noteN"))
      .toDF("id", "ver", "price", "tag", "note").createOrReplaceTempView("src_ev")
    // WITHOUT the evolution clause, extra source columns are ignored
    // (plain ANSI MERGE) and the schema stays put
    spark.sql("""
      MERGE INTO tev t USING src_ev s ON t.id = s.id
      WHEN MATCHED AND s.id = 0 THEN UPDATE SET *""")
    reread(dir, "tev")
    assert(!spark.table("tev").columns.contains("note"))

    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO tev t USING src_ev s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    reread(dir, "tev")
    val got = spark.sql("SELECT id, price, note FROM tev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(got === Array((1L, 10.0, null), (2L, 50.0, "noteB"),
      (3L, 30.0, null), (9L, 90.0, "noteN")))

    // MOR: the widened columns ride delta files and merge on read
    val mdir = tmpDir("sql_tev_mor").toString + "/t"
    val t = graft.table.GraftTable.create(spark, mdir, graft.core.TableConfig(
      "tev_mor", graft.core.TableType.MergeOnRead, Seq("id"), "", "ver",
      Map("graft.compact.inline" -> "false")))
    t.bulkInsert(Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("id", "ver", "price"))
    t.mergeInto(Seq((2L, 2L, 99.0, "mB"), (5L, 1L, 55.0, "mN"))
        .toDF("id", "ver", "price", "note"))
      .withSchemaEvolution()
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .execute()
    val snap = graft.read.Readers.snapshot(t)
      .select("id", "price", "note").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(snap === Array((1L, 10.0, null), (2L, 99.0, "mB"), (5L, 55.0, "mN")))
    // compaction folds the widened deltas into the base
    assert(graft.table.Services.compact(t).isDefined)
    val ro = graft.read.Readers.readOptimized(t)
      .select("id", "note").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(ro === Array((1L, null), (2L, "mB"), (5L, "mN")))
  }

  test("SQL MERGE evolves NESTED struct shapes (same contract as upsert)") {
    val dir = tmpDir("sql_tnev").toString + "/t"
    Seq((1L, 1L, "A"), (2L, 1L, "B")).toDF("id", "ver", "st")
      .select(col("id"), col("ver"), struct(col("st")).as("meta"))
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "bulk_insert").save(dir)
    reread(dir, "tnev")
    // the source's struct carries an ADDED nested field
    Seq((2L, 2L, "B2", "HI"), (3L, 1L, "C", "LO")).toDF("id", "ver", "st", "pri")
      .select(col("id"), col("ver"),
        struct(col("st"), col("pri")).as("meta"))
      .createOrReplaceTempView("src_nev")
    spark.sql("""
      MERGE INTO tnev t USING src_nev s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    reread(dir, "tnev")
    val got = spark.sql(
      "SELECT id, meta.st, meta.pri FROM tnev ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got === Array((1L, "A", null), (2L, "B2", "HI"), (3L, "C", "LO")))
  }

  test("SCHEMA EVOLUTION leaves explicit partial clauses untouched") {
    val dir = makeView("tevp")
    Seq((2L, 2L, 50.0, "s2", "noteB"), (9L, 1L, 90.0, "new", "noteN"))
      .toDF("id", "ver", "price", "tag", "note").createOrReplaceTempView("src_evp")
    // the UPDATE lists price only: the new column must NOT be silently
    // written on matched rows (Spark/Delta populate new columns via star
    // or explicit reference only); INSERT * does populate it for new rows
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO tevp t USING src_evp s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET price = s.price
      WHEN NOT MATCHED THEN INSERT *""")
    reread(dir, "tevp")
    val got = spark.sql("SELECT id, price, note FROM tevp ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(got === Array((1L, 10.0, null), (2L, 50.0, null),
      (3L, 30.0, null), (9L, 90.0, "noteN")))
  }

  test("SQL MERGE INTO with update, delete and insert clauses") {
    val dir = makeView("tm")
    Seq((2L, 2L, 99.0, "s2"), (3L, 2L, 0.0, "DEL"), (9L, 1L, 90.0, "new"))
      .toDF("id", "ver", "price", "tag").createOrReplaceTempView("src_m")
    spark.sql("""
      MERGE INTO tm t USING src_m s ON t.id = s.id
      WHEN MATCHED AND s.tag = 'DEL' THEN DELETE
      WHEN MATCHED THEN UPDATE SET price = s.price + t.price, ver = s.ver
      WHEN NOT MATCHED THEN INSERT *
    """)
    reread(dir, "tm")
    val got = spark.sql("SELECT id, ver, price, tag FROM tm ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got === Array(
      (1L, 1L, 10.0, "a"),     // untouched
      (2L, 2L, 119.0, "b"),    // 99 + 20, unassigned tag keeps target
      (9L, 1L, 90.0, "new"))) // inserted; id=3 deleted
  }

  test("SQL MERGE with WHEN NOT MATCHED BY SOURCE update and delete") {
    val dir = makeView("tnms")
    // source matches only id=1
    Seq((1L, 2L, 111.0, "s1"))
      .toDF("id", "ver", "price", "tag").createOrReplaceTempView("src_nms")
    spark.sql("""
      MERGE INTO tnms t USING src_nms s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET price = s.price, ver = s.ver
      WHEN NOT MATCHED BY SOURCE AND t.tag = 'b' THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'
    """)
    reread(dir, "tnms")
    val got = spark.sql("SELECT id, price, tag FROM tnms ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got === Array(
      (1L, 111.0, "a"),      // matched update
      (3L, 30.0, "stale")))  // id=2 ('b') deleted; id=3 nms-updated
  }

  test("programmatic NOT MATCHED BY SOURCE on MOR appends deltas only") {
    import graft.core.{TableConfig, TableType}
    val dir = tmpDir("nms_mor").toString + "/t"
    val t = graft.table.GraftTable.create(spark, dir, TableConfig(
      "nms_mor", TableType.MergeOnRead, Seq("id"), "", "ver",
      Map("graft.compact.inline" -> "false")))
    t.bulkInsert(Seq((1L, 0L, "a"), (2L, 0L, "b"), (3L, 0L, "c"))
      .toDF("id", "ver", "tag"))
    t.mergeInto(Seq((1L, 1L, "a2")).toDF("id", "ver", "tag"))
      .whenMatchedUpdate(None, Map("tag" -> "s.tag", "ver" -> "s.ver"))
      .whenNotMatchedBySourceDelete(Some("t.id = 2"))
      .whenNotMatchedBySourceUpdate(None, Map("tag" -> "'stale'"))
      .execute()
    val got = graft.read.Readers.snapshot(t)
      .select("id", "tag").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Array((1L, "a2"), (3L, "stale")))
    // MOR path appended deltas (no full-group rewrite)
    assert(t.view.fileSlices(None).exists(_.deltaFiles.nonEmpty))
  }

  test("CREATE TABLE ... USING graft + INSERT INTO through the catalog") {
    val loc = tmpDir("sql_cat").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS cat_t")
    spark.sql(s"""
      CREATE TABLE cat_t USING graft
      OPTIONS (recordKeyFields 'id', precombineField 'ver', operation 'bulk_insert')
      LOCATION '$loc'
      AS SELECT 1L AS id, 1L AS ver, 'x' AS v
    """)
    assert(spark.sql("SELECT * FROM cat_t").count() === 1)
    spark.sql("INSERT INTO cat_t SELECT 2L, 1L, 'y'")
    assert(spark.sql("SELECT * FROM cat_t WHERE v = 'y'").count() === 1)
    // upsert semantics via the source: inserting an existing key keeps count
    spark.sql("INSERT INTO cat_t SELECT 2L, 2L, 'y2'")
    val rows = spark.sql("SELECT id, v FROM cat_t ORDER BY id").collect()
    assert(rows.length === 3 || rows.length === 2) // insert op may add or pack
    spark.sql("DROP TABLE cat_t")
  }

  test("KEYLESS table: CTAS without a primary key gets uuid record keys") {
    val loc = tmpDir("sql_nokey").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS nokey_t")
    // no recordKeyFields option anywhere (reference UuidKeyGenerator)
    spark.sql(s"""
      CREATE TABLE nokey_t USING graft
      LOCATION '$loc'
      AS SELECT 1L AS n, 'a' AS v
    """)
    spark.sql("INSERT INTO nokey_t SELECT 2L, 'b'")
    spark.sql("INSERT INTO nokey_t SELECT 2L, 'b'") // duplicate row: append-only keeps both
    assert(spark.sql("SELECT * FROM nokey_t").count() === 3)
    val t = graft.table.GraftTable.load(spark, loc)
    // synthetic keys are unique even for identical rows
    val keys = graft.read.Readers.snapshot(t)
      .select(graft.core.MetaCols.RecordKey).collect().map(_.getString(0))
    assert(keys.distinct.length === 3)
    // filter-addressed SQL DML still works; key-addressed ops refuse clearly
    spark.sql("DELETE FROM nokey_t WHERE v = 'b'")
    assert(spark.sql("SELECT * FROM nokey_t").count() === 1)
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((9L, "z")).toDF("n", "v"))
    }
    assert(e.getMessage.contains("keyless"))
    spark.sql("DROP TABLE nokey_t")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF on a temp view") {
    val dir = makeView("ttv")
    val t = graft.table.GraftTable.load(spark, dir)
    val c1 = t.timeline.lastCompleted().get.ts
    spark.sql("UPDATE ttv SET price = price * 10 WHERE id = 1")
    reread(dir, "ttv")
    // head sees the update
    assert(spark.sql("SELECT price FROM ttv WHERE id = 1").first().getDouble(0) === 100.0)
    // VERSION AS OF a raw instant pins the pre-update state
    assert(spark.sql(s"SELECT price FROM ttv VERSION AS OF '$c1' WHERE id = 1")
      .first().getDouble(0) === 10.0)
    // TIMESTAMP AS OF a wall-clock cutoff: instants are UTC
    // yyyyMMddHHmmssSSS, so c1's own millisecond is an exact cutoff (a
    // whole-second .999 cutoff would swallow a same-second later commit)
    val cutoff = s"${c1.substring(0, 4)}-${c1.substring(4, 6)}-${c1.substring(6, 8)} " +
      s"${c1.substring(8, 10)}:${c1.substring(10, 12)}:${c1.substring(12, 14)}." +
      c1.substring(14, 17)
    assert(spark.sql(s"SELECT price FROM ttv TIMESTAMP AS OF '$cutoff' WHERE id = 1")
      .first().getDouble(0) === 10.0)
    // the whole row set is the old snapshot, not just one column
    assert(spark.sql(s"SELECT count(*) FROM ttv VERSION AS OF '$c1'")
      .first().getLong(0) === 3L)
  }

  test("SQL time travel on a catalog table; non-graft names fall through") {
    val dir = tmpDir("sql_ttc").toString + "/t"
    Seq((1L, 1L, 5.0)).toDF("id", "ver", "price")
      .write.format("graft")
      .option("recordKeyFields", "id").option("precombineField", "ver")
      .option("operation", "bulk_insert").save(dir)
    graft.sql.CatalogSync.sync(spark, dir, "ttcdb", "tt_cat")
    val t = graft.table.GraftTable.load(spark, dir)
    val c1 = t.timeline.lastCompleted().get.ts
    t.upsert(Seq((1L, 2L, 50.0)).toDF("id", "ver", "price"))
    spark.sessionState.catalog.refreshTable(
      org.apache.spark.sql.catalyst.TableIdentifier("tt_cat", Some("ttcdb")))
    assert(spark.sql("SELECT price FROM ttcdb.tt_cat").first().getDouble(0) === 50.0)
    assert(spark.sql(s"SELECT price FROM ttcdb.tt_cat VERSION AS OF '$c1'")
      .first().getDouble(0) === 5.0)
    spark.sql("DROP TABLE ttcdb.tt_cat")
    // a non-graft relation keeps Spark's own time-travel error
    spark.range(3).createOrReplaceTempView("plain_range")
    intercept[Exception] {
      spark.sql("SELECT * FROM plain_range VERSION AS OF '1'").collect()
    }
  }

  test("OPTIMIZE WHERE prunes which partitions cluster") {
    val dir = tmpDir("sql_optw").toString + "/t"
    for (i <- 0 until 2)
      (1 to 40).map(j => ((i * 100 + j).toLong, 1L, j * 1.0))
        .toDF("id", "ver", "price")
        .write.format("graft")
        .option("recordKeyFields", "id").option("precombineField", "ver")
        .option("partitionPathExpr", "concat('p=', pmod(id, 2))")
        .option("operation", "bulk_insert")
        .mode("append").save(dir)
    spark.read.format("graft").option("includeMetaColumns", "false")
      .load(dir).createOrReplaceTempView("optw_t")
    val t = graft.table.GraftTable.load(spark, dir)
    def groups(p: String) =
      t.view.fileSlices(None).count(_.partitionPath == p)
    val (b0, b1) = (groups("p=0"), groups("p=1"))
    assert(b0 >= 2 && b1 >= 2)

    val inst = spark.sql("OPTIMIZE optw_t WHERE partition = 'p=0'")
      .first().getString(0)
    assert(inst.forall(_.isDigit), s"expected an instant, got $inst")
    val t2 = graft.table.GraftTable.load(spark, dir)
    def groups2(p: String) =
      t2.view.fileSlices(None).count(_.partitionPath == p)
    assert(groups2("p=0") < b0, "selected partition did not pack")
    assert(groups2("p=1") === b1, "unselected partition was rewritten")
    assert(spark.sql("SELECT count(*) FROM optw_t").first().getLong(0) === 80L)
  }

  test("OPTIMIZE / VACUUM / DESCRIBE HISTORY drive maintenance from SQL") {
    val dir = tmpDir("sql_maint").toString + "/t"
    // three small commits -> three small file groups per partition
    for (i <- 0 until 3)
      (1 to 50).map(j => ((i * 100 + j).toLong, 1L, j * 1.0))
        .toDF("id", "ver", "price")
        .write.format("graft")
        .option("recordKeyFields", "id").option("precombineField", "ver")
        .option("operation", "bulk_insert") // no packing: fresh groups per commit
        .mode("append").save(dir)
    spark.read.format("graft").option("includeMetaColumns", "false")
      .load(dir).createOrReplaceTempView("maint_t")
    val t = graft.table.GraftTable.load(spark, dir)
    val groupsBefore = t.view.fileSlices(None).size
    assert(groupsBefore >= 3)

    val inst = spark.sql("OPTIMIZE maint_t ZORDER BY (id, price)")
      .first().getString(0)
    assert(inst.forall(_.isDigit), s"expected a replacecommit instant, got $inst")
    val t2 = graft.table.GraftTable.load(spark, dir)
    assert(t2.view.fileSlices(None).size < groupsBefore, "clustering did not pack")
    assert(spark.sql("SELECT count(*) FROM maint_t").first().getLong(0) === 150L)

    // DRY RUN lists the reclaimable files without deleting anything
    val dry = spark.sql("VACUUM maint_t RETAIN 1 COMMITS DRY RUN").collect()
    assert(dry.nonEmpty && dry.forall(_.getString(0).endsWith(".parquet")))
    assert(spark.sql("SELECT count(*) FROM maint_t").first().getLong(0) === 150L)
    assert(graft.table.GraftTable.load(spark, dir).timeline
      .completedInstants().forall(_.action != graft.core.Action.Clean),
      "DRY RUN must not commit a clean")

    // VACUUM retains 1 commit: the pre-clustering files become deletable
    val cleaned = spark.sql("VACUUM maint_t RETAIN 1 COMMITS").first().getString(0)
    assert(cleaned.forall(_.isDigit), s"expected a clean instant, got $cleaned")
    // the real clean reclaimed exactly what the dry run listed
    val cleanMd = graft.core.Json.read[graft.core.CleanMetadata](
      graft.table.GraftTable.load(spark, dir).timeline.readContent(
        graft.table.GraftTable.load(spark, dir).timeline.completedInstants()
          .filter(_.action == graft.core.Action.Clean).last))
    assert(cleanMd.deletedPaths.toSet === dry.map(_.getString(0)).toSet)
    assert(spark.sql("SELECT count(*) FROM maint_t").first().getLong(0) === 150L)

    // history: three bulk inserts + one replacecommit, newest first
    val hist = spark.sql("DESCRIBE HISTORY maint_t").collect()
    assert(hist.length === 4)
    assert(hist.head.getString(1) === "replacecommit")
    assert(hist.map(_.getString(2)).count(_ == "bulk_insert") === 3)
    // idempotent no-op forms
    assert(spark.sql("VACUUM maint_t").first().getString(0) === "nothing to clean")
    assert(spark.sql("OPTIMIZE maint_t").first().getString(0).nonEmpty)
  }
}
