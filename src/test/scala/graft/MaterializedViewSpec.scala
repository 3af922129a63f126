package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, MaterializedView => MV}
import graft.table.MaterializedView.ViewAgg

/** Incremental materialized-view maintenance: every sync must land the
  * view bit-identical to a from-scratch aggregate of the source's state
  * at the checkpoint — inserts, updates (including group-moving ones),
  * deletes, vanished/new groups, and min/max retraction all covered.
  */
class MaterializedViewSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import SparkTestBase._
  import spark.implicits._

  // pin the INCREMENTAL fold for this suite: tiny single-file-group
  // tables make every tick's window rival the live bytes, so the adaptive
  // rebuild (covered by its own test below) would otherwise shadow the
  // delta/repair machinery these tests exist to exercise
  override def beforeAll(): Unit =
    spark.conf.set(MV.RebuildRatioConf, "1e18")
  override def afterAll(): Unit =
    spark.conf.unset(MV.RebuildRatioConf)

  private def cfg(name: String) = TableConfig(
    name, TableType.CopyOnWrite, Seq("id"), "", "")

  private def rows(xs: (Long, String, Double)*): DataFrame =
    xs.toDF("id", "grp", "v")

  private def mk(prefix: String): (GraftTable, GraftTable) = {
    val d = tmpDir(prefix)
    val t = GraftTable.create(spark, s"$d/src", cfg(prefix))
    val v = MV.create(spark, s"$d/view", t,
      Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "v"),
        ViewAgg("lo", "min", "v"), ViewAgg("mean", "avg", "v")))
    (t, v)
  }

  /** From-scratch expectation over the source's CURRENT state, shaped
    * exactly like MV.read's projection.
    */
  private def recompute(t: GraftTable): DataFrame =
    Readers.snapshot(t)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(28,8)")).as("total"),
        min(col("v")).as("lo"),
        (sum(col("v").cast("decimal(28,8)")).cast("double") /
          count(col("v")).cast("double")).as("mean"))

  private def assertMatches(v: GraftTable, t: GraftTable): Unit = {
    val got = MV.read(v).orderBy("grp").collect().map(_.toSeq).toSeq
    val want = recompute(t).orderBy("grp").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("adaptive fold: first sync bulk-inserts; big windows rebuild; small ticks stay delta") {
    spark.conf.set(MV.RebuildRatioConf, "1.0") // the production default
    try {
      val d = tmpDir("mv_adaptive")
      // partitioned source: a one-partition tick stays below the ratio
      val t = GraftTable.create(spark, s"$d/src", TableConfig(
        "mv_ad", TableType.CopyOnWrite, Seq("id"), "grp", ""))
      val v = MV.create(spark, s"$d/view", t, Seq("grp" -> "grp"),
        Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "v")))
      t.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0),
        (4, "a", 4.0), (5, "b", 5.0), (6, "c", 6.0)))
      def check(): Unit = {
        val got = MV.read(v).select(col("grp"), col("cnt"),
          col("total").cast("double")).orderBy("grp")
          .collect().map(_.toSeq).toSeq
        val want = Readers.snapshot(t).groupBy("grp")
          .agg(count(lit(1)).as("cnt"), sum("v").cast("double").as("total"))
          .orderBy("grp").collect().map(_.toSeq).toSeq
        assert(got === want)
      }
      def lastMd = CommitMetadata.fromJson(
        v.timeline.readContent(v.timeline.completedDataInstants().last))

      MV.sync(v, t)
      // create + first sync = ONE bulk-insert view commit
      assert(lastMd.operationType === "bulk_insert")
      assert(lastMd.extraMetadata.get(MV.FoldKindKey).contains("rebuild"))
      assert(v.timeline.completedDataInstants().size === 1)
      check()

      // small tick (one partition of three): incremental fold
      t.upsert(rows((1, "a", 10.0)))
      MV.sync(v, t)
      assert(lastMd.extraMetadata.get(MV.FoldKindKey).contains("delta"))
      check()

      // window rewriting every partition: CDC would read more than the
      // table — the sync flips to a from-scratch rebuild, same answer
      t.upsert(rows((1, "a", 7.0), (2, "b", 8.0), (3, "c", 9.0),
        (4, "a", 1.0), (5, "b", 2.0), (6, "c", 3.0)))
      MV.sync(v, t)
      assert(lastMd.extraMetadata.get(MV.FoldKindKey).contains("rebuild"))
      check()
    } finally spark.conf.set(MV.RebuildRatioConf, "1e18") // restore suite pin
  }

  test("initial sync equals a full aggregate") {
    val (t, v) = mk("mv_init")
    t.bulkInsert(rows((1, "a", 1.5), (2, "a", 2.5), (3, "b", 10.0)))
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
  }

  test("incremental fold: inserts, updates, deletes, group moves") {
    val (t, v) = mk("mv_incr")
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)))
    MV.sync(v, t)
    t.upsert(rows((2, "a", 20.0))) // value update
    t.upsert(rows((3, "a", 3.0)))  // moves b -> a: retract + add
    t.delete(Seq(4L).toDF("id").withColumn("grp", lit("b")).withColumn("v", lit(0.0)))
    t.insert(rows((5, "c", 50.0))) // brand-new group
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
    // group b vanished entirely (3 moved, 4 deleted)
    assert(!MV.read(v).select("grp").as[String].collect().contains("b"))
  }

  test("MOR source: folds over delta-file change images; compaction stays silent") {
    val d = tmpDir("mv_mor")
    val t = GraftTable.create(spark, s"$d/src", TableConfig(
      "mv_mor", TableType.MergeOnRead, Seq("id"), "", "",
      Map("graft.compact.inline" -> "false")))
    val v = MV.create(spark, s"$d/view", t,
      Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "v"),
        ViewAgg("lo", "min", "v"), ViewAgg("mean", "avg", "v")))
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)))
    MV.sync(v, t)
    // updates + delete land in DELTA files — the change feed must read
    // the merged MOR view on both sides of the diff
    t.upsert(rows((2, "a", 20.0), (4, "b", 4.0)))
    t.delete(Seq(3L).toDF("id").withColumn("grp", lit("b")).withColumn("v", lit(0.0)))
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
    // compaction is a physical rewrite, not a logical change: the next
    // sync must be a no-op, and the state stays exact afterwards
    assert(graft.table.Services.compact(t).isDefined)
    assert(MV.sync(v, t).isEmpty)
    assertMatches(v, t)
    t.upsert(rows((1, "a", 100.0)))
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
  }

  test("min retraction: deleting the minimum repairs from the source") {
    val (t, v) = mk("mv_minfix")
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0)))
    MV.sync(v, t)
    t.delete(rows((1, "a", 1.0)))
    MV.sync(v, t)
    val lo = MV.read(v).select("lo").as[Double].head()
    assert(lo === 5.0)
    assertMatches(v, t)
  }

  test("selective repair: inline min paths stay exact without a rescan") {
    val (t, v) = mk("mv_minpaths")
    t.bulkInsert(rows((1, "a", 5.0), (2, "a", 9.0)))
    MV.sync(v, t)
    t.insert(rows((3, "a", 1.0))) // new min arrives by insert: inline least
    MV.sync(v, t)
    assert(MV.read(v).select("lo").as[Double].head() === 1.0)
    t.delete(rows((2, "a", 9.0))) // non-min retraction: no displacement
    MV.sync(v, t)
    assert(MV.read(v).select("lo").as[Double].head() === 1.0)
    t.upsert(rows((3, "a", 7.0))) // the min's own row moves up: repair path
    MV.sync(v, t)
    assert(MV.read(v).select("lo").as[Double].head() === 5.0)
    assertMatches(v, t)
  }

  test("untouched groups keep exact state across many folds") {
    val (t, v) = mk("mv_many")
    t.bulkInsert(rows((1, "a", 0.1), (2, "b", 0.2), (3, "c", 0.3)))
    MV.sync(v, t)
    for (i <- 4 to 9) {
      t.upsert(rows((i.toLong, "a", i * 0.1)))
      assert(MV.sync(v, t).isDefined)
    }
    assertMatches(v, t)
  }

  test("source rollback: sync rebuilds instead of replaying stale deltas") {
    val (t, v) = mk("mv_rollback")
    t.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0)))
    MV.sync(v, t)
    // the folded-then-rolled-back commit also creates group c, which must
    // vanish from the view on recovery
    val c2 = t.upsert(rows((3, "c", 30.0), (1, "a", 10.0)))
    MV.sync(v, t)
    assert(MV.read(v).select("grp").as[String].collect().toSet === Set("a", "b", "c"))
    graft.table.Services.rollback(t, c2)
    // the view is folded past commits that no longer exist
    assert(!MV.isFresh(v, t))
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
    assert(MV.read(v).select("grp").as[String].collect().toSet === Set("a", "b"))
    assert(MV.read(v).filter($"grp" === "a")
      .select(col("total").cast("double")).as[Double].head() === 1.0)
    assert(MV.isFresh(v, t))
    // incremental folding resumes after the recovery checkpoint
    t.upsert(rows((4, "a", 4.0)))
    MV.sync(v, t)
    assertMatches(v, t)
  }

  test("concurrent syncs serialize: folds never double-count a window") {
    val (t, v) = mk("mv_conc")
    t.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0)))
    MV.sync(v, t)
    // 4 writer threads each commit then sync — without the view-lock
    // serialization two syncs can both fold the same window onto the
    // state they both read (a permanent double count)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val futs = (0 until 4).map { i =>
      Future {
        t.upsert(rows((10L + i, "a", 1.0 + i), (20L + i, s"g$i", 5.0)))
        MV.sync(v, t)
      }
    }
    Await.result(Future.sequence(futs), 120.seconds)
    MV.sync(v, t) // settle any window a racing sync declined
    assertMatches(v, t)
  }

  test("source restore to a savepoint also triggers the rebuild") {
    val (t, v) = mk("mv_restore")
    t.bulkInsert(rows((1, "a", 1.0)))
    val sp = t.timeline.lastCompleted().get.ts
    graft.table.Services.savepoint(t, sp)
    MV.sync(v, t)
    t.upsert(rows((2, "b", 2.0)))
    MV.sync(v, t)
    graft.table.Services.restore(t, sp)
    assert(!MV.isFresh(v, t))
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
    assert(MV.read(v).select("grp").as[String].collect().toSet === Set("a"))
  }

  test("up-to-date sync is a no-op; service commits on the source too") {
    val (t, v) = mk("mv_noop")
    t.bulkInsert(rows((1, "a", 1.0)))
    MV.sync(v, t)
    val commits = v.timeline.completedDataInstants().size
    assert(MV.sync(v, t).isEmpty)
    // a source service commit (clean) is not a data change
    assert(MV.sync(v, t).isEmpty)
    assert(v.timeline.completedDataInstants().size === commits)
  }

  test("view is a full graft table: time travel sees pre-fold state") {
    val (t, v) = mk("mv_tt")
    t.bulkInsert(rows((1, "a", 1.0)))
    val c1 = MV.sync(v, t).get
    t.upsert(rows((1, "a", 100.0)))
    MV.sync(v, t)
    val before = Readers.timeTravel(v, c1)
      .select(col("total").cast("double")).as[Double].head()
    assert(before === 1.0)
  }

  test("count(expr) ignores nulls while count(*) keeps them") {
    val d = tmpDir("mv_nulls")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_nulls"))
    val v = MV.create(spark, s"$d/view", t,
      Seq("grp" -> "grp"),
      Seq(ViewAgg("all_rows", "count", "*"), ViewAgg("with_v", "count", "v")))
    t.bulkInsert(Seq((1L, "a", Some(1.0)), (2L, "a", None), (3L, "a", Some(3.0)))
      .toDF("id", "grp", "v"))
    MV.sync(v, t)
    t.delete(Seq((3L, "a", Option.empty[Double])).toDF("id", "grp", "v"))
    MV.sync(v, t)
    val r = MV.read(v).head()
    assert(r.getAs[Long]("all_rows") === 2L)
    assert(r.getAs[Long]("with_v") === 1L)
  }

  test("approx_ndv: HLL state unions on insert, rebuilds on retraction") {
    val d = tmpDir("mv_ndv")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_ndv"))
    val v = MV.create(spark, s"$d/view", t, Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("ndv", "approx_ndv", "v")))
    // small cardinalities: the sketch is exact, so equality asserts hold
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 2.0), (3, "a", 2.0), (4, "b", 9.0)))
    MV.sync(v, t)
    def ndv() = MV.read(v).orderBy("grp").select("ndv").as[Long].collect().toSeq
    assert(ndv() === Seq(2L, 1L))
    t.insert(rows((5, "a", 7.0))) // insert-only tick: inline union
    MV.sync(v, t)
    assert(ndv() === Seq(3L, 1L))
    t.delete(rows((1, "a", 1.0))) // retraction: group sketch rebuilds
    MV.sync(v, t)
    assert(ndv() === Seq(2L, 1L))
    // duplicate of a surviving value retracted: ndv must NOT drop
    t.delete(rows((2, "a", 2.0)))
    MV.sync(v, t)
    assert(ndv() === Seq(2L, 1L))
  }

  test("approx_ndv through SQL: approx_count_distinct in the definition") {
    val d = tmpDir("mv_ndv_sql")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_ndv_sql"))
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 1.0), (3, "b", 2.0)))
    spark.read.format("graft").load(s"$d/src").createOrReplaceTempView("mv_ndv_src")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mv_ndv_view LOCATION '$d/view' AS
         |SELECT grp, approx_count_distinct(v) AS ndv, count(*) AS cnt
         |FROM mv_ndv_src GROUP BY grp""".stripMargin)
    val got = spark.sql("SELECT grp, ndv, cnt FROM mv_ndv_view")
      .orderBy("grp").as[(String, Long, Long)].collect()
    assert(got === Array(("a", 1L, 2L), ("b", 1L, 1L)))
    spark.sql("DROP MATERIALIZED VIEW mv_ndv_view")
  }

  test("registered view auto-syncs on every source commit") {
    val (t, v) = mk("mv_auto")
    t.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0)))
    MV.sync(v, t)
    MV.register(v, t)
    t.upsert(rows((1, "a", 10.0), (3, "c", 3.0)))
    t.delete(rows((2, "b", 2.0)))
    // no explicit sync: the post-commit hook already folded both commits
    assert(MV.sync(v, t).isEmpty)
    assertMatches(v, t)
    MV.unregister(v, t)
    t.upsert(rows((4, "d", 4.0)))
    // after unregister the view goes stale until an explicit sync
    assert(MV.sync(v, t).isDefined)
    assertMatches(v, t)
  }

  test("cascading views: a view over a view refreshes transitively") {
    val d = tmpDir("mv_cascade")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_cascade"))
    val v1 = MV.create(spark, s"$d/v1", t, Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "v")))
    val v2 = MV.create(spark, s"$d/v2", v1, Seq("band" -> "cast(cnt % 2 as int)"),
      Seq(ViewAgg("groups", "count", "*")))
    MV.register(v1, t)
    MV.register(v2, v1)
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)))
    // a: cnt=2 (band 0), b: cnt=1 (band 1)
    val got = MV.read(v2).orderBy("band").as[(Int, Long)].collect()
    assert(got === Array((0, 1L), (1, 1L)))
  }

  test("filtered view: selection folds through the change images") {
    val d = tmpDir("mv_where")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_where"))
    val v = MV.create(spark, s"$d/view", t, Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "v")),
      where = Some("v >= 2.0"))
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 5.0), (3, "b", 9.0)))
    MV.sync(v, t)
    t.upsert(rows((1, "a", 3.0)))  // moves INTO the predicate
    t.upsert(rows((3, "b", 0.5)))  // moves OUT -> group b vanishes
    MV.sync(v, t)
    val got = MV.read(v).orderBy("grp")
      .select(col("grp"), col("cnt"), col("total").cast("double"))
      .as[(String, Long, Double)].collect()
    assert(got === Array(("a", 2L, 8.0)))
  }

  test("SQL surface: CREATE / live read / REFRESH / DROP") {
    val d = tmpDir("mv_sql")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_sql"))
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)))
    spark.read.format("graft").load(s"$d/src").createOrReplaceTempView("mv_sql_src")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mv_sql_view AUTO REFRESH LOCATION '$d/view' AS
         |SELECT grp, count(*) AS cnt, sum(v) AS total, avg(v) AS mean
         |FROM mv_sql_src WHERE v > 0 GROUP BY grp""".stripMargin)
    def readView() = spark.sql(
      "SELECT grp, cnt, CAST(total AS DOUBLE) AS total, mean FROM mv_sql_view")
      .orderBy("grp").as[(String, Long, Double, Double)].collect()
    assert(readView() === Array(("a", 2L, 3.0, 1.5), ("b", 1L, 3.0, 3.0)))
    // AUTO REFRESH: the upsert folds post-commit; the temp view reads live
    t.upsert(rows((2, "a", 20.0)))
    assert(readView() === Array(("a", 2L, 21.0, 10.5), ("b", 1L, 3.0, 3.0)))
    // REFRESH is an explicit no-op here (already current) but must parse+run
    spark.sql("REFRESH MATERIALIZED VIEW mv_sql_view")
    assert(readView() === Array(("a", 2L, 21.0, 10.5), ("b", 1L, 3.0, 3.0)))
    // SHOW MATERIALIZED VIEWS lists the registration with its freshness
    val shown = spark.sql("SHOW MATERIALIZED VIEWS ON mv_sql_src").collect()
    assert(shown.length === 1)
    assert(shown.head.getString(0).endsWith("/view"))
    assert(shown.head.getBoolean(2), "auto-synced view should be fresh")
    spark.sql("DROP MATERIALIZED VIEW mv_sql_view")
    assert(!spark.catalog.tableExists("mv_sql_view"))
    assert(MV.registered(t).isEmpty)
    // regular SQL still parses through the delegating parser
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) === 2)
  }

  test("SQL surface: non-aggregate definition is refused") {
    val d = tmpDir("mv_sql_bad")
    val t = GraftTable.create(spark, s"$d/src", cfg("mv_sql_bad"))
    t.bulkInsert(rows((1, "a", 1.0)))
    spark.read.format("graft").load(s"$d/src").createOrReplaceTempView("mv_sql_bad_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE MATERIALIZED VIEW mv_bad LOCATION '$d/view' AS " +
        "SELECT grp, v FROM mv_sql_bad_src")
    }
    assert(e.getMessage.contains("aggregate query"))
  }

  test("expression group keys maintain correctly") {
    val d = tmpDir("mv_expr")
    val t = GraftTable.create(spark, s"$d/src", TableConfig(
      "mv_expr", TableType.CopyOnWrite, Seq("id"), "", ""))
    val v = MV.create(spark, s"$d/view", t,
      Seq("bucket" -> "cast(id % 3 as int)"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("hi", "max", "v")))
    t.bulkInsert((1L to 9L).map(i => (i, i * 1.0)).toDF("id", "v"))
    MV.sync(v, t)
    t.delete(Seq((9L, 0.0)).toDF("id", "v")) // bucket 0's max
    MV.sync(v, t)
    val got = MV.read(v).orderBy("bucket").as[(Int, Long, Double)].collect()
    assert(got === Array((0, 2L, 6.0), (1, 3L, 7.0), (2, 3L, 8.0)))
  }

  // ------------------------------------------------------ star-join views

  private def mkStar(prefix: String): (GraftTable, GraftTable, GraftTable) = {
    val d = tmpDir(prefix)
    val fact = GraftTable.create(spark, s"$d/fact", cfg(prefix))
    val dim = GraftTable.create(spark, s"$d/dim", TableConfig(
      s"${prefix}_dim", TableType.CopyOnWrite, Seq("k"), "", ""))
    val v = MV.create(spark, s"$d/view", fact,
      Seq("region" -> "dm.region"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "f.v"),
        ViewAgg("lo", "min", "f.v")),
      dims = Seq(MV.DimJoin("dm", dim, "f.grp = dm.k")))
    (fact, dim, v)
  }

  private def starRecompute(fact: GraftTable, dim: GraftTable): DataFrame =
    Readers.snapshot(fact).alias("f")
      .join(Readers.snapshot(dim).alias("dm"), expr("f.grp = dm.k"))
      .groupBy(col("dm.region").as("region"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("f.v").cast("decimal(28,8)")).as("total"),
        min(col("f.v")).as("lo"))

  private def assertStar(v: GraftTable, fact: GraftTable, dim: GraftTable): Unit = {
    val got = MV.read(v).orderBy("region").collect().map(_.toSeq).toSeq
    val want = starRecompute(fact, dim).orderBy("region").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("star view: fact ticks fold incrementally through the dim join") {
    val (fact, dim, v) = mkStar("mv_star")
    dim.bulkInsert(Seq(("a", "east"), ("b", "east"), ("c", "west"))
      .toDF("k", "region"))
    fact.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 4.0)))
    assert(MV.sync(v, fact).isDefined)
    assertStar(v, fact, dim)
    // fold path: inserts, a group-moving update and a delete in one tick
    fact.upsert(rows((4, "a", 8.0), (2, "c", 16.0)))
    fact.delete(rows((3, "c", 0.0)))
    assert(MV.sync(v, fact).isDefined)
    assertStar(v, fact, dim)
    // INNER semantics: a fact row with no dim match never reaches the view
    fact.upsert(rows((9, "zz", 99.0)))
    MV.sync(v, fact)
    assert(!MV.read(v).collect().map(_.toSeq.toString).exists(_.contains("99")))
    assertStar(v, fact, dim)
  }

  test("star view: a dim write makes the view stale and forces a rebuild") {
    val (fact, dim, v) = mkStar("mv_star_dim")
    dim.bulkInsert(Seq(("a", "east"), ("b", "west")).toDF("k", "region"))
    fact.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0), (3, "b", 4.0)))
    MV.sync(v, fact)
    assert(MV.isFresh(v, fact))
    // dim-only write: fact checkpoint still covers, but the view is stale
    dim.upsert(Seq(("b", "east")).toDF("k", "region"))
    assert(!MV.isFresh(v, fact))
    assert(MV.sync(v, fact).isDefined) // rebuild, not a no-op
    assert(MV.isFresh(v, fact))
    assertStar(v, fact, dim)
    // groups vanished by the dim move are tombstoned
    assert(MV.read(v).filter(col("region") === "west").count() === 0)
    // repeated sync with nothing new is a no-op again
    assert(MV.sync(v, fact).isEmpty)
  }

  test("SQL: CREATE MATERIALIZED VIEW over a star join; dim writes auto-refresh") {
    val d = tmpDir("mv_star_sql")
    val fact = GraftTable.create(spark, s"$d/fact", cfg("mv_star_sql"))
    val dim = GraftTable.create(spark, s"$d/dim", TableConfig(
      "mv_star_sql_dim", TableType.CopyOnWrite, Seq("k"), "", ""))
    dim.bulkInsert(Seq(("a", "east"), ("b", "west")).toDF("k", "region"))
    fact.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0)))
    spark.read.format("graft").load(fact.basePath.toString)
      .createOrReplaceTempView("star_fact")
    spark.read.format("graft").load(dim.basePath.toString)
      .createOrReplaceTempView("star_dim")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW star_v AUTO REFRESH LOCATION '$d/view' AS
         |SELECT dm.region AS region, count(*) AS cnt, sum(f.v) AS total
         |FROM star_fact f JOIN star_dim dm ON f.grp = dm.k
         |GROUP BY dm.region""".stripMargin)
    def state(): Set[(String, Long, Double)] = spark.sql(
      "SELECT region, cnt, CAST(total AS DOUBLE) AS total FROM star_v")
      .as[(String, Long, Double)].collect().toSet
    assert(state() === Set(("east", 1L, 1.0), ("west", 1L, 2.0)))
    // fact write: the fact-side hook folds the change images
    fact.upsert(rows((3, "a", 4.0)))
    assert(state() === Set(("east", 2L, 5.0), ("west", 1L, 2.0)))
    // dim write: the dim-side hook re-syncs — recorded dim heads force
    // the rebuild, the vanished 'west' group tombstones
    dim.upsert(Seq(("b", "east")).toDF("k", "region"))
    assert(state() === Set(("east", 3L, 7.0)))
  }

  test("star view: WHERE over dim columns; alias validation") {
    val d = tmpDir("mv_star_where")
    val fact = GraftTable.create(spark, s"$d/fact", cfg("mv_star_where"))
    val dim = GraftTable.create(spark, s"$d/dim", TableConfig(
      "mv_star_where_dim", TableType.CopyOnWrite, Seq("k"), "", ""))
    dim.bulkInsert(Seq(("a", "east"), ("b", "west")).toDF("k", "region"))
    fact.bulkInsert(rows((1, "a", 1.0), (2, "b", 2.0), (3, "a", 4.0)))
    val v = MV.create(spark, s"$d/view", fact,
      Seq("grp" -> "f.grp"),
      Seq(ViewAgg("cnt", "count", "*")),
      where = Some("dm.region = 'east'"),
      dims = Seq(MV.DimJoin("dm", dim, "f.grp = dm.k")))
    MV.sync(v, fact)
    assert(MV.read(v).as[(String, Long)].collect().toSet === Set(("a", 2L)))
    // an update moving a fact row out of the dim predicate retracts it
    fact.upsert(rows((3, "b", 4.0)))
    MV.sync(v, fact)
    assert(MV.read(v).as[(String, Long)].collect().toSet === Set(("a", 1L)))
    intercept[IllegalArgumentException] {
      MV.create(spark, s"$d/v2", fact, Seq("g" -> "grp"),
        Seq(ViewAgg("cnt", "count", "*")),
        dims = Seq(MV.DimJoin("f", dim, "f.grp = f.k")))
    }
    intercept[IllegalArgumentException] {
      MV.create(spark, s"$d/v3", fact, Seq("g" -> "grp"),
        Seq(ViewAgg("cnt", "count", "*")),
        dims = Seq(MV.DimJoin("x", dim, "f.grp = x.k"),
          MV.DimJoin("x", dim, "f.grp = x.k")))
    }
  }
}
