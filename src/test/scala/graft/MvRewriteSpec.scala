package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.table.{GraftTable, MaterializedView => MV}
import graft.table.MaterializedView.ViewAgg

/** Aggregate navigation (MvRewriteRule): a source-table aggregate must be
  * answered from a fresh registered view — the plan reads ONLY the view's
  * files — and must silently fall back to the source whenever the rewrite
  * would not be equivalent (stale view, unmatched filter, unmatched
  * group/agg, time travel, conf off).
  */
class MvRewriteSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def cfg(name: String) = TableConfig(
    name, TableType.CopyOnWrite, Seq("id"), "", "")

  private def rows(xs: (Long, String, Double)*): DataFrame =
    xs.toDF("id", "grp", "v")

  /** Source with a registered, auto-synced view over (grp). */
  private def mk(prefix: String): (GraftTable, GraftTable, String) = {
    val d = tmpDir(prefix)
    val t = GraftTable.create(spark, s"$d/src", cfg(prefix))
    t.bulkInsert(rows((1, "a", 1.5), (2, "a", 2.5), (3, "b", 10.0),
      (4, "b", 4.0), (5, "c", 7.0)))
    val v = MV.create(spark, s"$d/view", t,
      Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "v"),
        ViewAgg("lo", "min", "v"), ViewAgg("hi", "max", "v"),
        ViewAgg("mean", "avg", "v")))
    MV.sync(v, t)
    MV.register(v, t)
    (t, v, d.toString)
  }

  private def srcDf(t: GraftTable): DataFrame =
    spark.read.format("graft").load(t.basePath.toString)

  /** True when the physical plan reads the view's files and none of the
    * source's.
    */
  private def answeredFromView(df: DataFrame, d: String): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains(s"$d/view") && !p.contains(s"$d/src")
  }

  test("exact-grouping aggregate answers from the view") {
    val (t, _, d) = mk("mvr_exact")
    val q = srcDf(t).groupBy("grp").agg(
      count(lit(1)).as("cnt"), sum("v").as("total"),
      min("v").as("lo"), max("v").as("hi"), avg("v").as("mean"))
    assert(answeredFromView(q, d), q.queryExecution.executedPlan.toString)
    // sum(v: double) keeps its double output type (cast from the view's
    // decimal fold state); min/max are exact; avg is sum/cnt in double
    val got = q.orderBy("grp").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("a", 2L, 4.0, 1.5, 2.5, 2.0),
      Seq("b", 2L, 14.0, 4.0, 10.0, 7.0),
      Seq("c", 1L, 7.0, 7.0, 7.0, 7.0)))
  }

  test("rollup: global aggregate re-aggregates the view's groups") {
    val (t, _, d) = mk("mvr_rollup")
    // sum() is not stats-answerable, so this shape exercises the VIEW
    // rollup; a pure count/min global aggregate short-circuits to the
    // column-stats index BEFORE the view rewrite (zero IO — checked below)
    val q = srcDf(t).agg(count(lit(1)).as("cnt"), min("v").as("lo"),
      sum("v").as("total"))
    assert(answeredFromView(q, d))
    assert(q.collect().map(_.toSeq).toSeq === Seq(Seq(5L, 1.5, 25.0)))
    val q2 = srcDf(t).agg(count(lit(1)).as("cnt"), min("v").as("lo"))
    assert(!q2.queryExecution.executedPlan.toString.contains(s"$d/src"),
      "count/min should answer from stats, never scan the source")
    assert(q2.collect().map(_.toSeq).toSeq === Seq(Seq(5L, 1.5)))
  }

  test("filter on a group column remaps onto the view") {
    val (t, _, d) = mk("mvr_filter")
    val q = srcDf(t).filter(col("grp") =!= "c")
      .groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q, d))
    assert(q.orderBy("grp").collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 2L), Seq("b", 2L)))
  }

  test("filter on a non-group column disables the rewrite") {
    val (t, _, d) = mk("mvr_nofilter")
    val q = srcDf(t).filter(col("v") > 2.0)
      .groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(q, d))
    assert(q.orderBy("grp").collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 1L), Seq("b", 2L), Seq("c", 1L)))
  }

  test("stale view (concurrent write before sync) disables the rewrite") {
    val (t, v, d) = mk("mvr_stale")
    MV.unregister(v, t) // stop auto-sync so the next write leaves it stale
    t.upsert(rows((6, "d", 3.0)))
    MV.register(v, t)
    val q = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(q, d))
    assert(q.filter(col("grp") === "d").collect().head.getLong(1) === 1L)
    // post-commit sync catches up -> rewrite resumes
    MV.sync(v, t)
    val q2 = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q2, d))
    assert(q2.filter(col("grp") === "d").collect().head.getLong(1) === 1L)
  }

  test("auto-synced view stays rewrite-eligible through source writes") {
    val (t, _, d) = mk("mvr_auto")
    t.upsert(rows((6, "a", 9.0)))
    t.delete(rows((3, "b", 10.0)))
    val q = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"), max("v").as("hi"))
    assert(answeredFromView(q, d))
    assert(q.orderBy("grp").collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 3L, 9.0), Seq("b", 1L, 4.0), Seq("c", 1L, 7.0)))
  }

  test("filtered view: matching WHERE rewrites, missing WHERE does not") {
    val d = tmpDir("mvr_where")
    val t = GraftTable.create(spark, s"$d/src", cfg("mvr_where"))
    t.bulkInsert(rows((1, "a", 1.0), (2, "a", 5.0), (3, "b", 9.0)))
    val v = MV.create(spark, s"$d/view", t, Seq("grp" -> "grp"),
      Seq(ViewAgg("cnt", "count", "*")), where = Some("v > 2.0"))
    MV.sync(v, t); MV.register(v, t)
    val hit = srcDf(t).filter(col("v") > 2.0)
      .groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(hit, d.toString))
    assert(hit.orderBy("grp").collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 1L), Seq("b", 1L)))
    // unfiltered query over a filtered view must NOT rewrite
    val miss = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(miss, d.toString))
    assert(miss.orderBy("grp").collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 2L), Seq("b", 1L)))
  }

  test("approx_count_distinct rolls up via HLL union") {
    val d = tmpDir("mvr_hll")
    val t = GraftTable.create(spark, s"$d/src", cfg("mvr_hll"))
    t.bulkInsert((1 to 400).map(i => (i.toLong, s"g${i % 4}", (i % 97).toDouble))
      .toDF("id", "grp", "v"))
    val v = MV.create(spark, s"$d/view", t, Seq("grp" -> "grp"),
      Seq(ViewAgg("ndv", "approx_ndv", "v")))
    MV.sync(v, t); MV.register(v, t)
    val q = srcDf(t).agg(approx_count_distinct("v").as("ndv"))
    assert(answeredFromView(q, d.toString))
    val est = q.collect().head.getLong(0)
    assert(math.abs(est - 97L) <= 5, s"ndv=$est")
  }

  test("time travel and unmatched aggregates never rewrite") {
    val (t, _, d) = mk("mvr_guards")
    val asOf = t.timeline.lastCompleted().get.ts
    t.upsert(rows((7, "e", 2.0)))
    val tt = spark.read.format("graft")
      .option("asOfInstant", asOf).load(t.basePath.toString)
      .groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(tt, d))
    // sum(v + 1) has no view state
    val um = srcDf(t).groupBy("grp").agg(sum(col("v") + 1).as("s"))
    assert(!answeredFromView(um, d))
    // distinct count has no exact state
    val dc = srcDf(t).groupBy("grp").agg(countDistinct("v").as("c"))
    assert(!answeredFromView(dc, d))
  }

  test("source rollback disables the rewrite until the view resyncs") {
    val (t, v, d) = mk("mvr_rollback")
    val c2 = t.upsert(rows((6, "z", 1.0))) // auto-synced into the view
    assert(answeredFromView(
      srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt")), d))
    graft.table.Services.rollback(t, c2)
    // the view still holds group z; serving it would be wrong
    val q = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(q, d))
    assert(!q.collect().map(_.getString(0)).contains("z"))
    MV.sync(v, t) // rebuild recovery
    val q2 = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q2, d))
    assert(!q2.collect().map(_.getString(0)).contains("z"))
  }

  test("spark.graft.mv.rewrite=false disables the rule") {
    val (t, _, d) = mk("mvr_off")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try {
      val q = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
      assert(!answeredFromView(q, d))
    } finally spark.conf.unset("spark.graft.mv.rewrite")
    val q2 = srcDf(t).groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q2, d))
  }

  test("SQL over a temp view of the source rewrites too") {
    val (t, _, d) = mk("mvr_sql")
    srcDf(t).createOrReplaceTempView("mvr_sql_src")
    val q = spark.sql(
      "SELECT grp, count(*) AS cnt, CAST(sum(v) AS DOUBLE) AS total " +
        "FROM mvr_sql_src WHERE grp <> 'c' GROUP BY grp")
    assert(answeredFromView(q, d), q.queryExecution.executedPlan.toString)
    assert(q.orderBy("grp").collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 2L, 4.0), Seq("b", 2L, 14.0)))
  }

  // ----------------------------------------------- star-join navigation

  /** Fact + dim with a registered star view grouped by the dim attr. */
  private def mkStar(prefix: String): (GraftTable, GraftTable, String) = {
    val d = tmpDir(prefix)
    val fact = GraftTable.create(spark, s"$d/src", cfg(prefix))
    val dim = GraftTable.create(spark, s"$d/dim", TableConfig(
      s"${prefix}_dim", TableType.CopyOnWrite, Seq("k"), "", ""))
    dim.bulkInsert(Seq(("a", "east"), ("b", "east"), ("c", "west"))
      .toDF("k", "region"))
    fact.bulkInsert(rows((1, "a", 1.5), (2, "a", 2.5), (3, "b", 10.0),
      (4, "b", 4.0), (5, "c", 7.0)))
    val v = MV.create(spark, s"$d/view", fact,
      Seq("region" -> "dm.region"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "f.v")),
      dims = Seq(MV.DimJoin("dm", dim, "f.grp = dm.k")))
    MV.sync(v, fact)
    MV.register(v, fact)
    (fact, dim, d.toString)
  }

  private def dimDf(d: String): DataFrame =
    spark.read.format("graft").load(s"$d/dim")

  test("star: a fact-join-dim aggregate answers from the star view") {
    val (fact, _, d) = mkStar("mvr_star")
    val q = srcDf(fact).join(dimDf(d), expr("grp = k"))
      .groupBy("region")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(answeredFromView(q, d), q.queryExecution.executedPlan.toString)
    assert(!q.queryExecution.executedPlan.toString.contains(s"$d/dim"),
      "dim still scanned")
    assert(q.orderBy("region").collect().map(_.toSeq).toSeq ===
      Seq(Seq("east", 4L, 18.0), Seq("west", 1L, 7.0)))
    // reversed sides match too (either side may be the fact)
    val q2 = dimDf(d).join(srcDf(fact), expr("grp = k"))
      .groupBy("region").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q2, d), q2.queryExecution.executedPlan.toString)
  }

  test("star: rollup to global, residual filter on the group column") {
    val (fact, _, d) = mkStar("mvr_star_roll")
    val q = srcDf(fact).join(dimDf(d), expr("grp = k"))
      .filter(col("region") === "east")
      .agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q, d), q.queryExecution.executedPlan.toString)
    assert(q.collect().head.getLong(0) === 4L)
  }

  test("star: two dims — snowflake-lite aggregate answers from the view") {
    val d = tmpDir("mvr_star2").toString
    val fact = GraftTable.create(spark, s"$d/src", TableConfig(
      "mvr_star2", TableType.CopyOnWrite, Seq("id"), "", ""))
    val dimA = GraftTable.create(spark, s"$d/dima", TableConfig(
      "mvr_star2_a", TableType.CopyOnWrite, Seq("k"), "", ""))
    val dimB = GraftTable.create(spark, s"$d/dimb", TableConfig(
      "mvr_star2_b", TableType.CopyOnWrite, Seq("u"), "", ""))
    dimA.bulkInsert(Seq(("a", "east"), ("b", "west")).toDF("k", "region"))
    dimB.bulkInsert(Seq((1L, "gold"), (2L, "base")).toDF("u", "tier"))
    fact.bulkInsert(Seq((10L, "a", 1L, 2.0), (11L, "a", 2L, 3.0),
      (12L, "b", 1L, 5.0)).toDF("id", "grp", "cust", "v"))
    val v = MV.create(spark, s"$d/view", fact,
      Seq("region" -> "da.region", "tier" -> "db.tier"),
      Seq(ViewAgg("cnt", "count", "*"), ViewAgg("total", "sum", "f.v")),
      dims = Seq(MV.DimJoin("da", dimA, "f.grp = da.k"),
        MV.DimJoin("db", dimB, "f.cust = db.u")))
    MV.sync(v, fact)
    MV.register(v, fact)
    val q = srcDf(fact)
      .join(spark.read.format("graft").load(s"$d/dima"), expr("grp = k"))
      .join(spark.read.format("graft").load(s"$d/dimb"), expr("cust = u"))
      .groupBy("region", "tier")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(answeredFromView(q, d), q.queryExecution.executedPlan.toString)
    assert(q.orderBy("region", "tier").collect().map(_.toSeq).toSeq === Seq(
      Seq("east", "base", 1L, 3.0), Seq("east", "gold", 1L, 2.0),
      Seq("west", "gold", 1L, 5.0)))
    // rollup across one dim's attribute still answers from the view
    val q2 = srcDf(fact)
      .join(spark.read.format("graft").load(s"$d/dima"), expr("grp = k"))
      .join(spark.read.format("graft").load(s"$d/dimb"), expr("cust = u"))
      .groupBy("tier").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q2, d), q2.queryExecution.executedPlan.toString)
    assert(q2.orderBy("tier").collect().map(_.toSeq).toSeq ===
      Seq(Seq("base", 1L), Seq("gold", 2L)))
  }

  test("star: no rewrite on a different join condition, dim write stales") {
    val (fact, dim, d) = mkStar("mvr_star_guard")
    // different join condition — never answered from the view
    val qBad = srcDf(fact).join(dimDf(d), expr("grp = region"))
      .groupBy("region").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(qBad, d))
    // a dim write makes the view stale: falls back to the real join
    dim.upsert(Seq(("c", "east")).toDF("k", "region"))
    val q = srcDf(fact).join(dimDf(d), expr("grp = k"))
      .groupBy("region").agg(count(lit(1)).as("cnt"))
    assert(!answeredFromView(q, d), "stale star view still answered")
    assert(q.orderBy("region").collect().map(_.toSeq).toSeq ===
      Seq(Seq("east", 5L)))
    // re-sync restores the rewrite
    MV.sync(GraftTable.load(spark, s"$d/view"), fact)
    val q3 = srcDf(fact).join(dimDf(d), expr("grp = k"))
      .groupBy("region").agg(count(lit(1)).as("cnt"))
    assert(answeredFromView(q3, d), q3.queryExecution.executedPlan.toString)
  }
}
