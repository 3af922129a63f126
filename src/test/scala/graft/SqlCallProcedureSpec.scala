package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** `CALL <proc>(...)` SQL procedures — the stored-procedure admin surface
  * (reference-line-plus; the 0.x reference exposes these only via the Java
  * client/CLI). Each procedure must behave exactly like the Services/
  * TableAdmin call it wraps.
  */
class SqlCallProcedureSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def makeTable(name: String, mor: Boolean = false,
      props: Map[String, String] = Map.empty): (GraftTable, String) = {
    val dir = tmpDir(s"call_$name").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      name, if (mor) TableType.MergeOnRead else TableType.CopyOnWrite,
      Seq("id"), "", "ver",
      (if (mor) Map("graft.compact.inline" -> "false")
       else Map.empty[String, String]) ++ props))
    t.bulkInsert(Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0))
      .toDF("id", "ver", "price"))
    spark.read.format("graft").load(dir).createOrReplaceTempView(name)
    (t, dir)
  }

  test("show_commits / show_fsview_all / show_table_properties") {
    val (t, _) = makeTable("c_show")
    t.upsert(Seq((2L, 2L, 99.0)).toDF("id", "ver", "price"))
    val commits = spark.sql("CALL show_commits(table => 'c_show')").collect()
    assert(commits.length === 2)
    // newest first, schema matches DESCRIBE HISTORY
    assert(commits(0).getAs[String]("instant") > commits(1).getAs[String]("instant"))
    assert(commits.map(_.getAs[String]("operation")).toSet === Set("bulk_insert", "upsert"))
    val limited = spark.sql("CALL show_commits(table => 'c_show', limit => 1)").collect()
    assert(limited.length === 1 && limited(0).getAs[String]("operation") === "upsert")

    val fsview = spark.sql("CALL show_fsview_all(table => 'c_show')").collect()
    assert(fsview.nonEmpty && fsview.forall(_.getAs[Long]("base_records") > 0))

    val props = spark.sql("CALL show_table_properties(table => 'c_show')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.table.name") === "c_show")
    assert(props("graft.table.recordkey.fields") === "id")
  }

  test("run_clustering then run_clean mutate the table like the service calls") {
    // a second bulk insert lands in its own file group, which makes the
    // single partition clustering-eligible (two small groups)
    val (t, dir) = makeTable("c_maint")
    t.bulkInsert(Seq((4L, 1L, 40.0), (5L, 1L, 50.0)).toDF("id", "ver", "price"))
    t.upsert(Seq((1L, 2L, 11.0)).toDF("id", "ver", "price"))
    val inst = spark.sql("CALL run_clustering(table => 'c_maint')")
      .first().getString(0)
    assert(inst.forall(_.isDigit), s"expected a replacecommit instant, got $inst")
    val cleaned = spark.sql("CALL run_clean(table => 'c_maint', retain_commits => 1)")
      .first().getString(0)
    assert(cleaned.forall(_.isDigit))
    val cleans = spark.sql("CALL show_cleans(table => 'c_maint')").collect()
    assert(cleans.length === 1 && cleans(0).getAs[Long]("files_deleted") > 0)
    // table still reads correctly after maintenance
    val t2 = GraftTable.load(spark, dir)
    assert(Readers.snapshot(t2).count() === 5)
    assert(Readers.snapshot(t2).filter(col("id") === 1L)
      .first().getAs[Double]("price") === 11.0)
  }

  test("run_compaction schedule + run on MOR; show_compaction lists the plan") {
    val (t, dir) = makeTable("c_compact", mor = true)
    t.upsert(Seq((1L, 2L, 77.0)).toDF("id", "ver", "price"))
    val planned = spark.sql("CALL run_compaction(table => 'c_compact', op => 'schedule')")
      .first().getString(0)
    assert(planned.forall(_.isDigit))
    val pending = spark.sql("CALL show_compaction(table => 'c_compact')").collect()
    assert(pending.length === 1 && pending(0).getString(0) === planned &&
      pending(0).getAs[Long]("file_groups") >= 1)
    val ran = spark.sql("CALL run_compaction(table => 'c_compact', op => 'run')")
      .first().getString(0)
    assert(ran === planned)
    assert(spark.sql("CALL show_compaction(table => 'c_compact')").collect().isEmpty)
    val t2 = GraftTable.load(spark, dir)
    assert(Readers.readOptimized(t2).filter(col("id") === 1L)
      .first().getAs[Double]("price") === 77.0)
  }

  test("savepoint lifecycle: create, show, rollback_to_savepoint, delete") {
    val (t, dir) = makeTable("c_save")
    val pinned = t.timeline.completedDataInstants().last.ts
    val sp = spark.sql("CALL create_savepoint(table => 'c_save')").first().getString(0)
    assert(sp.forall(_.isDigit))
    val shown = spark.sql("CALL show_savepoints(table => 'c_save')").collect()
    assert(shown.length === 1 && shown(0).getString(1) === pinned)

    t.upsert(Seq((3L, 2L, 999.0)).toDF("id", "ver", "price"))
    // restore by the SAVEPOINTED commit ts (the other accepted form)
    spark.sql(s"CALL rollback_to_savepoint(table => 'c_save', instant => '$pinned')")
    val t2 = GraftTable.load(spark, dir)
    assert(Readers.snapshot(t2).filter(col("id") === 3L)
      .first().getAs[Double]("price") === 30.0)
    val rb = spark.sql("CALL show_rollbacks(table => 'c_save')").collect()
    assert(rb.nonEmpty)

    spark.sql(s"CALL delete_savepoint(table => 'c_save', instant => '$pinned')")
    assert(spark.sql("CALL show_savepoints(table => 'c_save')").collect().isEmpty)
  }

  test("rollback_to_instant undoes the newest commit") {
    val (t, dir) = makeTable("c_rb")
    val bad = t.upsert(Seq((1L, 2L, -1.0)).toDF("id", "ver", "price"))
    spark.sql(s"CALL rollback_to_instant(table => 'c_rb', instant => '$bad')")
    val t2 = GraftTable.load(spark, dir)
    assert(Readers.snapshot(t2).filter(col("id") === 1L)
      .first().getAs[Double]("price") === 10.0)
  }

  test("export_snapshot / symlink_manifest / show_column_stats / show_metrics") {
    val (t, _) = makeTable("c_export")
    val out = tmpDir("c_export_out").toString + "/snap"
    val inst = spark.sql(
      s"CALL export_snapshot(table => 'c_export', output => '$out', format => 'parquet')")
      .first().getString(0)
    assert(inst.forall(_.isDigit))
    val exported = spark.read.parquet(out)
    assert(exported.count() === 3 &&
      !exported.columns.exists(_.startsWith("_hoodie")))

    val n = spark.sql("CALL symlink_manifest(table => 'c_export')")
      .first().getString(0).toInt
    assert(n >= 1)

    val stats = spark.sql(
      "CALL show_column_stats(table => 'c_export', column => 'price')").collect()
    assert(stats.nonEmpty && stats.forall(_.getString(3) === "price"))
    assert(stats.map(_.getString(4).toDouble).min === 10.0)

    val metrics = spark.sql("CALL show_metrics(table => 'c_export')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(metrics.get("commit.totalRecordsWritten").exists(_ >= 3L) ||
      metrics.nonEmpty)
  }

  test("copy_snapshot via CALL: loadable copy; manifest files read back") {
    val (t, _) = makeTable("c_copy")
    val out = tmpDir("c_copy_out").toString + "/backup"
    // both spellings resolve (verb-first + reference-style alias)
    val dst = spark.sql(
      s"CALL copy_snapshot(table => 'c_copy', output => '$out')")
      .first().getString(0)
    val copy = GraftTable.load(spark, dst)
    assert(Readers.snapshot(copy).count() === Readers.snapshot(t).count())
    val out2 = tmpDir("c_copy_out2").toString + "/backup2"
    spark.sql(s"CALL snapshot_copy(table => 'c_copy', output => '$out2')")
    assert(Readers.snapshot(GraftTable.load(spark, out2)).count() === 3)
    // export + manifest round-trip: the manifest's absolute paths read
    // back as parquet and cover every snapshot row
    val n = spark.sql("CALL symlink_manifest(table => 'c_copy')")
      .first().getString(0).toInt
    assert(n >= 1)
    val manifests = graft.core.PathIO.walk(
        java.nio.file.Paths.get(t.basePath.toString, "_symlink_format_manifest"))
      .filter(_.getFileName.toString == "manifest")
    val paths = manifests.flatMap(m =>
      java.nio.file.Files.readString(m).linesIterator.filter(_.nonEmpty))
    assert(paths.nonEmpty)
    val viaManifest = spark.read.parquet(paths.map(
      _.stripPrefix("file:")): _*)
    assert(viaManifest.count() === Readers.snapshot(t).count())
  }

  test("DESCRIBE DETAIL and SHOW PARTITIONS over a graft name") {
    val dir = tmpDir("call_detail").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "c_detail", TableType.CopyOnWrite, Seq("id"),
      "concat('p=', pmod(id, 2))", "ver"))
    t.bulkInsert(Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0))
      .toDF("id", "ver", "price"))
    spark.read.format("graft").load(dir).createOrReplaceTempView("c_detail")

    val d = spark.sql("DESCRIBE DETAIL c_detail").first()
    assert(d.getAs[String]("format") === "graft")
    assert(d.getAs[String]("name") === "c_detail")
    assert(d.getAs[String]("record_key_fields") === "id")
    assert(d.getAs[Long]("num_partitions") === 2)
    assert(d.getAs[Long]("num_commits") === 1)
    assert(d.getAs[Long]("size_bytes") > 0)

    val parts = spark.sql("SHOW PARTITIONS c_detail").collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("p=0", "p=1"))
    assert(parts.map(_.getAs[Long]("base_records")).sum === 3)

    // non-graft names keep Spark's own SHOW PARTITIONS behavior
    spark.range(3).createOrReplaceTempView("plain_v")
    intercept[Exception] { spark.sql("SHOW PARTITIONS plain_v").collect() }
  }

  test("argument forms: positional table, quoted strings, unknown proc falls through") {
    val (_, _) = makeTable("c_args")
    assert(spark.sql("CALL show_commits('c_args')").collect().length === 1)
    // system. qualifier accepted
    assert(spark.sql("CALL system.show_commits(table => 'c_args')")
      .collect().length === 1)
    // an unknown procedure name is NOT intercepted -> Spark's own error
    val e = intercept[Exception] {
      spark.sql("CALL no_such_proc(table => 'c_args')").collect()
    }
    assert(!e.getMessage.contains("unknown procedure"),
      s"unknown CALL must fall through to Spark, got: ${e.getMessage}")
  }

  test("run_decontaminate_sync + update_benchmark: graded SQL-only drive") {
    val root = tmpDir("call_decon").toString
    def mk(n: String) = GraftTable.create(spark, s"$root/$n", TableConfig(
      n, TableType.CopyOnWrite, Seq("doc_id"), "", ""))
    val srcT = mk("source")
    mk("clean")
    val strict = "the secret eval answer is fortytwo exactly here now ok"
    Seq(strict).toDF("text").createOrReplaceTempView("bench_v")
    spark.sql(s"CALL update_benchmark(index => '$root/index', " +
      "benchmark => 'bench_v', suite => 'strict')")
    srcT.bulkInsert(Seq(
      (1L, s"prefix words $strict suffix words"), // contaminated
      (2L, "an entirely clean document with its own words")).toDF("doc_id", "text"))
    val r = spark.sql(s"CALL run_decontaminate_sync(source => '$root/source', " +
      s"clean => '$root/clean', index => '$root/index', " +
      "thresholds => 'strict:0.0')").collect()
    assert(r.length === 1 && r(0).getString(0).nonEmpty)
    assert(Readers.snapshot(GraftTable.load(spark, s"$root/clean"))
      .select("doc_id").as[Long].collect().toSet === Set(2L))
    // unchanged source: the tick reports no new data
    val again = spark.sql(s"CALL run_decontaminate_sync(source => '$root/source', " +
      s"clean => '$root/clean', index => '$root/index', " +
      "thresholds => 'strict:0.0')").collect()
    assert(again(0).getString(0) === "no new data")
  }

  test("run_dedup_sync and run_hash_dedup_sync tick from SQL") {
    val root = tmpDir("call_dedup").toString
    def mk(n: String) = GraftTable.create(spark, s"$root/$n", TableConfig(
      n, TableType.CopyOnWrite, Seq("doc_id"), "", ""))
    val srcT = mk("source"); mk("clean"); mk("clean_h")
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    srcT.bulkInsert(Seq(
      (1L, base),
      (2L, base + " extra"), // near-dup of 1 (minhash catches it)
      (3L, "completely different text about graph partitioning at scale"),
      (4L, base)) // exact copy of 1 (identical simhash)
      .toDF("doc_id", "text"))
    spark.sql(s"CALL run_dedup_sync(source => '$root/source', " +
      s"clean => '$root/clean', index => '$root/idx_minhash')").collect()
    val kept = Readers.snapshot(GraftTable.load(spark, s"$root/clean"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(3L) && kept.contains(1L) && !kept.contains(2L),
      s"minhash tick kept $kept")
    spark.sql(s"CALL run_hash_dedup_sync(source => '$root/source', " +
      s"clean => '$root/clean_h', index => '$root/idx_simhash')").collect()
    val keptH = Readers.snapshot(GraftTable.load(spark, s"$root/clean_h"))
      .select("doc_id").as[Long].collect().toSet
    // the exact copy (identical simhash) drops; the one-token near-dup is
    // minhash's job, not a 3-bit-hamming guarantee
    assert(keptH.contains(3L) && keptH.contains(1L) && !keptH.contains(4L),
      s"simhash tick kept $keptH")
  }

  test("run_rollup_sync: ';'-separated aggs, incremental second tick") {
    val root = tmpDir("call_rollup").toString
    val srcT = GraftTable.create(spark, s"$root/source", TableConfig(
      "src", TableType.CopyOnWrite, Seq("event_id"), "", ""))
    GraftTable.create(spark, s"$root/rollup", TableConfig(
      "rollup", TableType.CopyOnWrite, Seq("user_id"), "", ""))
    srcT.bulkInsert(Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 1.0))
      .toDF("event_id", "user_id", "value"))
    def tick() = spark.sql(s"CALL run_rollup_sync(source => '$root/source', " +
      s"rollup => '$root/rollup', group_cols => 'user_id', " +
      "aggs => 'sum(value) AS total; count(1) AS n')").collect()
    tick()
    def state() = Readers.snapshot(GraftTable.load(spark, s"$root/rollup"))
      .select("user_id", "total", "n").as[(Long, Double, Long)].collect().toSet
    assert(state() === Set((10L, 12.0, 2L), (20L, 1.0, 1L)))
    srcT.upsert(Seq((4L, 20L, 3.0)).toDF("event_id", "user_id", "value"))
    tick()
    assert(state() === Set((10L, 12.0, 2L), (20L, 4.0, 2L)))
  }

  test("parseArgs: '=>' inside a quoted literal is not a name separator") {
    import graft.sql.CallProcedures.{parseArgs, Arg}
    assert(parseArgs("'t', '/tmp/a=>b'") ===
      Seq(Arg(None, "t"), Arg(None, "/tmp/a=>b")))
    assert(parseArgs("table => 't', path => '{\"k\" => 1}'") ===
      Seq(Arg(Some("table"), "t"), Arg(Some("path"), "{\"k\" => 1}")))
    // commas inside quotes still don't split; doubled '' unescapes
    assert(parseArgs("'a,b=>c', limit => 3") ===
      Seq(Arg(None, "a,b=>c"), Arg(Some("limit"), "3")))
    assert(parseArgs("'it''s'") === Seq(Arg(None, "it's")))
  }
}
