package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the headline relational queries —
  * the properties the 100 TB story depends on, pinned so a refactor that
  * silently de-broadcasts a dimension or un-pushes a scan filter fails
  * here instead of in a cluster bill:
  *  - dimension joins broadcast (no shuffle of the fact side for dims)
  *  - scan-level predicate pushdown reaches the parquet reader
  *  - the hot aggregation paths stay inside whole-stage codegen
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestBase._

  private def executed(name: String): String = {
    val df = graft.queries.Relational.queries(name)(spark, sf001)
    df.collect() // finalize AQE so codegen spans and final joins appear
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter is pushed to the parquet scan, agg is codegen'd") {
    val plan = executed("q1_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("*("), s"no whole-stage codegen span:\n$plan")
    assert(plan.contains("HashAggregate"))
  }

  test("cleaning ops are pure map plans: zero Exchange, codegen'd") {
    for (name <- Seq("p_c4_clean", "p_pii_scrub",
        "p_html_extract", "p_line_dedup_within", "p_url_domains",
        "p_url_canonical", "p_url_psl", "p_text_normalize",
        "p_text_nfkc", "p_url_idn", "p_text_scripts", "p_pii_cc")) {
      val df = graft.queries.PipelineQueries.queries(name)(spark, sf001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name shuffles:\n$plan")
      assert(plan.contains("*("), s"$name lost codegen:\n$plan")
    }
  }

  test("span dedup: fingerprint-keyed shuffles only, never pairwise") {
    val df = graft.queries.PipelineQueries.queries("p_dedup_spans")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"pairwise pass:\n$plan")
    // window fingerprinting + surgery are row-local; the windows
    // relation moves ONCE (fingerprint-partitioned count window), then
    // the per-doc start collection and the join back to the docs:
    // 3 real exchanges — the AQE tree string prints Final + Initial
    // plans, so each appears twice
    assert("Exchange".r.findAllIn(plan).size <= 6, s"extra shuffles:\n$plan")
  }

  test("q36: five-table profit join broadcasts every dimension, no cartesian") {
    val plan = executed("q36_nation_profit")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    // the part name filter reaches the part scan, not the joined stream
    assert(plan.contains("PushedFilters: [IsNotNull(p_name)"),
      s"p_name filter not pushed:\n$plan")
  }

  test("q37: disjunctive predicate clusters keep the part join broadcast") {
    val plan = executed("q37_disjunctive_revenue")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("q38: the ship-date window reaches the lineitem scan") {
    val plan = executed("q38_priority_class_by_flag")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"date filter not pushed:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q3: customer dimension joins broadcast") {
    val plan = executed("q3_shipping_priority")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"))
  }

  test("q5: region/nation chain broadcasts; no cartesian anywhere") {
    val plan = executed("q5_local_supplier")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("q2: correlated aggregate runs as ONE window, not a re-executed subquery") {
    val plan = executed("q2_above_avg_balance")
    assert(plan.contains("Window"))
    assert(!plan.contains("Subquery"), s"subquery re-execution:\n$plan")
    // one exchange for the nation partition, nothing more
    assert("Exchange".r.findAllIn(plan).size <= 2, s"extra shuffles:\n$plan")
  }

  test("q4: EXISTS compiles to a semi join, lineitem scan pruned to two columns") {
    val plan = executed("q4_order_priority")
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    // column pruning: the lineitem side must read only join+residual cols
    val readSchemas = "ReadSchema: [^\\n]*lineitem[^\\n]*".r.findAllIn(plan).toSeq
    val liSchema = "struct<l_orderkey:bigint,l_shipdate:timestamp[^>]*>"
    assert(plan.contains("l_orderkey") && !plan.contains("l_extendedprice"),
      s"lineitem scan not pruned:\n${readSchemas.mkString("\n")}")
  }

  test("q26: argmin is ONE window over one exchange; supplier join broadcasts") {
    val plan = executed("q26_cheapest_supplier")
    assert(plan.contains("Window"), s"no window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"supplier not broadcast:\n$plan")
    // lineitem scan pruned to the three needed columns
    assert(!plan.contains("l_returnflag"), s"lineitem scan not pruned:\n$plan")
  }

  test("q27: anti join on orders; the 1-row aggregate broadcasts") {
    val plan = executed("q27_lapsed_customers")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(plan.contains("Broadcast"), s"aggregate not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("CDC read plans exactly ONE join — single-pass change emit") {
    import org.apache.spark.sql.functions._
    import graft.core.{TableConfig, TableType}
    val t = graft.table.GraftTable.create(spark, tmpDir("cdc_plan").toString,
      TableConfig("cdc_plan", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    import spark.implicits._
    val c1 = t.bulkInsert((1L to 100L).map(i => (i, 0L)).toDF("id", "ver"))
    t.upsert(Seq((1L, 1L), (101L, 1L)).toDF("id", "ver"))
    t.delete(Seq((2L, 2L)).toDF("id", "ver"))
    val df = graft.read.Readers.incrementalChanges(t, c1)
    assert(df.count() === 4) // 1 insert + 1 delete + update before/after
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
      .r.findAllIn(finalPlan).size
    assert(joins == 1, s"CDC plan has $joins joins (want 1):\n$plan")
    assert(finalPlan.contains("Generate explode"), s"no single-pass explode:\n$plan")
  }

  test("q28: fraction-of-total is agg + window, no self join of lineitem") {
    val plan = executed("q28_dominant_suppliers")
    assert(plan.contains("Window"))
    // exactly one lineitem scan in the FINAL plan (the AQE string repeats
    // every node in its "Initial Plan" section) — a self join would scan twice
    val finalPlan = plan.split("== Initial Plan ==").head
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(finalPlan).size
    assert(liScans == 1, s"lineitem scanned $liScans times:\n$plan")
  }

  test("q32: the revenue argmax joins a broadcast 1-row max, no global sort") {
    val plan = executed("q32_top_supplier")
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"max not broadcast:\n$plan")
    assert(!finalPlan.contains("Window"), s"argmax fell back to a window:\n$plan")
    // shipdate window pushed to the scan
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate filter not pushed:\n$plan")
  }

  test("q33: brand filter broadcasts part BEFORE the lineitem join") {
    val plan = executed("q33_small_qty_revenue")
    assert(plan.contains("BroadcastHashJoin"), s"part not broadcast:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand"),
      s"brand filter not pushed to the part scan:\n$plan")
  }

  test("q35: the semi+anti pair collapses to ONE lineitem scan + windows") {
    val plan = executed("q35_waiting_suppliers")
    val finalPlan = plan.split("== Initial Plan ==").head
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(finalPlan).size
    assert(liScans == 1, s"lineitem scanned $liScans times (correlated re-scan):\n$plan")
    assert(plan.contains("Window"))
  }

  // sf0.01: at sf0.001 these two return empty and AQE collapses the plan
  // to EmptyRelation, leaving nothing to pin
  private def executed001(name: String): String = {
    val df = graft.queries.Relational.queries(name)(spark, "/root/testdata/sf0.01")
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q43: the global threshold is ONE broadcast row, fact scanned once per side") {
    val plan = executed001("q43_value_concentration")
    val finalPlan = plan.split("== Initial Plan ==").head
    // the 1-row threshold side broadcasts (nested-loop of a single row,
    // never a shuffle), and the filtered fact subtree feeds both sides
    assert(finalPlan.contains("BroadcastNestedLoopJoin"),
      s"threshold not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(n_name), EqualTo(n_name"),
      s"nation filter not pushed:\n$plan")
  }

  test("q44: complaint list and part dims broadcast; no fact pre-distinct") {
    val plan = executed001("q44_supplier_part_counts")
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
    // the NOT IN exclusion is an anti join of a broadcast side
    assert(finalPlan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(s_acctbal), LessThan(s_acctbal"),
      s"acctbal filter not pushed to the supplier scan:\n$plan")
  }

  test("bm25: postings prune via broadcast of query terms, no vocab-wide shuffle join") {
    import org.apache.spark.sql.functions._
    val docsDf = spark.read.parquet(s"$sf001/documents.parquet")
    val qs = docsDf.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.pipeline.Repetition.tokens(col("text")), 1, 8), " ").as("text"))
    val df = graft.pipeline.TextSearch.bm25TopK(docsDf, qs, k = 10)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // every join in the search path is broadcast — the only shuffles are
    // the posting aggregate and the per-(query, doc) score aggregate
    assert(!finalPlan.contains("SortMergeJoin") && !finalPlan.contains("ShuffledHashJoin"),
      s"non-broadcast join in the search path:\n$finalPlan")
    assert(finalPlan.contains("BroadcastHashJoin"), s"no broadcast join:\n$finalPlan")
  }
}
