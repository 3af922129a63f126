package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query catalog over the raw testdata tables — the operator
  * categories the reference delegates to its host engine (SURVEY §2.5):
  * joins (broadcast/shuffle, semi/anti), aggregations (hash, distinct,
  * rollup), windows, set ops, scalar functions, time-bucketed aggs.
  * Every query has a DuckDB oracle twin; aggregate doubles are rounded in
  * BOTH engines to absorb summation-order differences.
  */
object Relational {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan + filter + hash agg, fully pushed down
    "q1_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // correlated scalar-subquery shape (TPC-H Q2's inner aggregate):
    // customers above their nation's average balance. Spark-first
    // expression: the correlated aggregate is a window over the nation
    // partition — one shuffle, no per-row subquery re-execution. The
    // boundary compare is decimal sum × count, exact in both engines.
    "q2_above_avg_balance" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
      t(s, d, "customer")
        .withColumn("nat_sum", sum(col("c_acctbal").cast("decimal(18,4)")).over(w))
        .withColumn("nat_cnt", count(lit(1)).over(w))
        .filter(col("c_acctbal").cast("decimal(18,4)") * col("nat_cnt") > col("nat_sum"))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    }),

    // TPC-H Q4 shape: EXISTS-driven priority histogram — a left-semi join
    // with a non-equi residual, then a tiny agg
    "q4_order_priority" -> ((s, d) => {
      val ord = t(s, d, "orders").filter(year(col("o_orderdate")) === 1995)
      val li = t(s, d, "lineitem")
      ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q3 shape: 3-way join (dim side broadcastable) + agg
    "q3_shipping_priority" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1997-01-01"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1997-01-01"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"))
    }),

    // TPC-H Q5 shape: 5-way snowflake join through region/nation
    "q5_local_supplier" -> ((s, d) => {
      // The region predicate is pushed BELOW the big joins: Catalyst does
      // not reorder inner joins (no CBO), so filtering customer and
      // supplier to ASIA nations first shrinks every lineitem-side
      // intermediate by the region's selectivity (~5x) — the difference
      // between shuffling 100 TB and 20 TB. The dimension chain
      // (region ⋈ nation) is rows-tiny and broadcast everywhere.
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val custAsia = t(s, d, "customer")
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      val supAsia = t(s, d, "supplier")
        .join(broadcast(asiaNations.select(col("n_nationkey").as("_sn"))),
          col("s_nationkey") === col("_sn"), "left_semi")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(supAsia, li("l_suppkey") === supAsia("s_suppkey"))
        .join(custAsia, ord("o_custkey") === custAsia("c_custkey") &&
          supAsia("s_nationkey") === custAsia("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"))
    }),

    // TPC-H Q6 shape: tight filter + single-row agg
    "q6_forecast_revenue" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
          && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)")).cast("double").as("revenue"))
    }),

    // window: top-3 orders per customer
    "q7_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // grouping sets
    "q8_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
    }),

    // distinct aggregation
    "q9_distinct_parts" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // semi + anti joins: customer order activity
    "q10_semi_anti" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val active = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
      val inactive = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
      active.join(inactive, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("with_orders"), lit(0L)).as("with_orders"),
          coalesce(col("without_orders"), lit(0L)).as("without_orders"))
    }),

    // set operation: customers ordering in both years
    "q11_intersect_years" -> ((s, d) => {
      val ord = t(s, d, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .intersect(ord.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
    }),

    // set operation: customers who ordered in 1995 but NOT in 1996
    "q24_except_years" -> ((s, d) => {
      val ord = t(s, d, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .except(ord.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
    }),

    // generator/LATERAL VIEW: explode document tokens, top-10 words per
    // source by (count, word) — exercises explode + two-level aggregation
    "q25_explode_top_words" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val words = docs.select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("source", "word").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n").desc, col("word"))
      words.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("word"), col("n"), col("rk"))
    }),

    // scalar function projection battery
    "q12_scalar_funcs" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_retailprice") * 2).as("double_price"),
        pmod(col("p_partkey"), lit(7)).as("key_mod"),
        length(col("p_name")).as("name_len"),
        when(col("p_size") > 25, "large").otherwise("small").as("size_class"))
    }),

    // time-bucketed aggregation over the events stream table
    "q13_events_hourly" -> ((s, d) => {
      QUtil.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
    }),

    // global top-k: total order + limit
    "q15_top_orders" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // HAVING: post-aggregation filter
    "q16_big_customers" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_spend"))
        .filter(col("n_orders") >= 10)
    }),

    // correlated EXISTS subquery shape (decorrelated by Catalyst)
    "q17_custs_with_urgent" -> ((s, d) => {
      val ord = t(s, d, "orders")
      t(s, d, "customer")
        .join(ord.filter(col("o_orderpriority").startsWith("1"))
          .select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // conditional aggregation (TPC-H Q12 shape)
    "q14_priority_by_year" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          sum(when(col("o_orderpriority").startsWith("1") ||
            col("o_orderpriority").startsWith("2"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!(col("o_orderpriority").startsWith("1") ||
            col("o_orderpriority").startsWith("2")), 1L).otherwise(0L)).as("low_line_count"),
          (sum(col("o_totalprice").cast("decimal(18,4)")).cast("double") / count(lit(1))).as("avg_price"))
    }),

    // CUBE: all grouping-column combinations in one aggregation pass
    "q18_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
    }),

    // GROUPING SETS via rollup-free explicit sets (Spark SQL surface)
    "q19_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (yr), ())""".stripMargin)
    }),

    // window FRAMES: per-customer moving average over the last 3 orders
    // (ROWS BETWEEN) — the frame-based window family q7's ranking misses
    "q20_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      // exact decimal frame-sum then ONE double division: engines may
      // accumulate frame doubles in different orders, decimals they can't
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        (sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("avg3"))
    }),

    // PIVOT-style conditional aggregation: status × priority count matrix
    // (engine-portable form of PIVOT — same SQL shape in DuckDB)
    "q22_pivot_priority" -> ((s, d) => {
      def cnt(p: String) = count(when(col("o_orderpriority") === p, 1))
      t(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(cnt("1-URGENT").as("p_urgent"), cnt("2-HIGH").as("p_high"),
          cnt("3-MEDIUM").as("p_medium"), cnt("5-LOW").as("p_low"),
          count(lit(1)).as("total"))
    }),

    // exact discrete percentiles: values are actual data elements, so the
    // hash comparison is interpolation-free
    "q23_percentiles" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"),
          count(lit(1)).as("n"))),

    // lead/lag offsets: days between a customer's consecutive orders
    "q21_order_gaps" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
    }),

    // TPC-H Q2's argmin shape: per part, the supplier(s) with the lowest
    // observed unit price. Spark-first: one window min over the part
    // partition instead of a correlated MIN subquery re-joining lineitem;
    // ties keep all achieving suppliers in both engines. No float column
    // in the output — the comparison is row-exact, the result is keys.
    "q26_cheapest_supplier" -> ((s, d) => {
      val u = t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("up"))
      val w = Window.partitionBy(col("l_partkey"))
      u.withColumn("mn", min(col("up")).over(w))
        .filter(col("up") === col("mn"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("partkey"), col("s_name"))
        .distinct()
    }),

    // TPC-H Q22 shape: above-average-balance customers with NO orders in
    // the window (anti join). The above-average predicate multiplies
    // through by the count (decimal-exact on both engines) instead of
    // comparing against a float average.
    "q27_lapsed_customers" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val agg = cust.agg(
        sum(col("c_acctbal").cast("decimal(18,4)")).as("tot"),
        count(lit(1)).as("cnt"))
      val rich = cust.join(broadcast(agg))
        .filter(col("c_acctbal").cast("decimal(18,4)") * col("cnt") > col("tot"))
      val active = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01")).select("o_custkey")
      rich.join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("totacctbal"))
    }),

    // ordered-funnel event analytics: users completing view -> click ->
    // purchase in strict timestamp order. Each stage's earliest qualifying
    // time feeds the next stage's residual predicate — three bounded aggs
    // over the user key, no per-user sequence scan, no window over the
    // whole event stream.
    "q29_funnel" -> ((s, d) => {
      val ev = QUtil.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
        .filter(col("t_view").isNotNull)
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.agg(count(lit(1)).as("users_view")).join(
        c.agg(count(lit(1)).as("users_click"))).join(
        p.agg(count(lit(1)).as("users_purchase")))
    }),

    // weekly cohort retention: cohort = ISO week of a user's first event;
    // cell (cohort, offset) = distinct users from that cohort active
    // offset weeks later. Two aggregations; the per-user cohort frame is
    // user-cardinality (broadcastable at any event volume).
    "q30_retention_cohorts" -> ((s, d) => {
      val ev = QUtil.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      ev.join(broadcast(cohort), Seq("user_id"))
        .groupBy(col("cw"), (datediff(col("wk"), col("cw")) / 7).cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
    }),

    // TPC-H Q7 shape: bi-directional trade volume between two nations by
    // ship year — the lineitem fact joins orders→customer on one side and
    // supplier on the other, with BOTH nation dims broadcast, and the
    // (supp, cust) nation pair filter applied before the fact join
    "q31_nation_volume" -> ((s, d) => {
      val pair = Seq("NATION_1", "NATION_2")
      val nat = t(s, d, "nation").filter(col("n_name").isInCollection(pair))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(s, d, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      t(s, d, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("volume"))
    }),

    // TPC-H Q20's nested-aggregate shape: suppliers shipping an outsized
    // share (>15%) of a part's total quantity. Two aggregation levels
    // collapse to one groupBy + one window sum (fraction-of-total without
    // a self join); decimal sums and the cross-multiplied threshold keep
    // the comparison exact in both engines.
    "q28_dominant_suppliers" -> ((s, d) => {
      val ps = t(s, d, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sqty"))
      val w = Window.partitionBy(col("l_partkey"))
      ps.withColumn("tqty", sum(col("sqty")).over(w))
        .filter(col("sqty") * 20 > col("tqty") * 3)
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("partkey"), col("s_name"),
          col("sqty").cast("double").as("supp_qty"))
    }),

    // TPC-H Q15 shape: the top supplier(s) by revenue over a quarter.
    // The argmax is a broadcast of the 1-row max aggregate joined back
    // (q27's pattern) — NOT a global window, which would single-partition
    // sort every supplier at scale. Decimal revenue keeps the max
    // comparison exact in both engines.
    "q32_top_supplier" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      val top = rev.agg(max(col("rev")).as("maxrev"))
      rev.join(broadcast(top), col("rev") === col("maxrev"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev").cast("double").as("total_revenue"))
    }),

    // TPC-H Q17 shape: revenue lost to small-quantity orders for one
    // brand — the correlated per-part average collapses to a per-part
    // aggregate joined back to the fact (no correlated re-scan); the
    // brand filter prunes parts BEFORE the lineitem join and broadcasts
    "q33_small_qty_revenue" -> ((s, d) => {
      val parts = t(s, d, "part").filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val li = t(s, d, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      // qty < 0.2 * avg(qty) cross-multiplies to qty * n * 5 < sum(qty):
      // all-decimal arithmetic, so the boundary is exact in both engines
      val avgq = li.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sumq"),
          count(lit(1)).as("cnt"))
      li.join(avgq, Seq("l_partkey"))
        .filter(col("l_quantity").cast("decimal(18,4)") * col("cnt") * 5 < col("sumq"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,4)")) / 7.0)
          .cast("double").as("avg_yearly"))
    }),

    // TPC-H Q18 shape: large-volume orders — the HAVING on the order-level
    // quantity sum runs as one fact aggregate, then only the surviving
    // handful of orders join out to customer/orders (both joins tiny)
    "q34_big_volume_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty").cast("double").as("sum_qty"))
    }),

    // TPC-H Q21 shape (adapted to this schema's dates): suppliers who
    // were the SOLE late shipper on a multi-supplier order — one fact
    // aggregate to per-(order, supplier) lateness, then the exists /
    // not-exists pair becomes counts over the order: >=2 suppliers,
    // exactly 1 late, and it's this one. No correlated re-scans of
    // lineitem — the reference semantics' semi+anti pair collapses into
    // a single per-order profile joined once.
    // TPC-H Q9 shape (product-type profit, sans the partsupp table the
    // testdata lacks): 5-table join — part filter broadcasts before the
    // lineitem probe, supplier→nation chain broadcasts, one agg over
    // (nation, order year)
    "q36_nation_profit" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_name").contains("red"))
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation").select("n_nationkey", "n_name"),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_profit"))
    }),

    // TPC-H Q10 shape (returned-item revenue): customers who returned
    // goods in a quarter, ranked by lost revenue — 4-table join, exact
    // decimal revenue, deterministic top-20 (revenue desc, custkey asc)
    // TPC-H Q13 shape (customer order-count distribution; the comment
    // NOT LIKE filter stands in as an order-priority exclusion): LEFT
    // join so order-less customers count at zero, then a second
    // aggregation over the counts — the double-aggregation histogram
    "q41_custdist" -> ((s, d) => {
      t(s, d, "customer").select("c_custkey")
        .join(t(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q40_returned_revenue" -> ((s, d) => {
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_name", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation").select("n_nationkey", "n_name"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q12 shape (shipping-priority classes; the testdata lacks
    // l_shipmode so l_returnflag stands in): fact-side date window +
    // conditional CASE sums per class after the orders join
    "q38_priority_class_by_flag" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
    }),

    // TPC-H Q14 shape (promo revenue share): conditional revenue fraction
    // over one month — exact decimal sums, one double division at the end
    "q39_promo_revenue" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-03-01")
        .join(t(s, d, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double")).as("promo_share"))
    }),

    // TPC-H Q19 shape: disjunction of conjunctive clusters across the
    // join (brand/size on part, quantity on lineitem) — the OR must not
    // defeat the broadcast or produce a cartesian
    "q37_disjunctive_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "part").select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
      li.filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 40)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(5, 50) &&
          col("l_quantity") >= 20))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q8 shape (national market share): one nation's share of a
    // region market's revenue per order year — 7-table join where every
    // dimension chain (part filter, customer→nation→region, supplier→
    // nation) broadcasts before the single lineitem probe; conditional
    // decimal sums, one double division at the end
    "q42_market_share" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")
      val amerCust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(t(s, d, "nation").select("n_nationkey", "n_regionkey"),
          col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "AMERICA")
          .select("r_regionkey"), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_type") === "ECONOMY")
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1997-01-01")
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", rev)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    "q35_waiting_suppliers" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .cast("int").as("late"))
      val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("supp_late"))
      val w = Window.partitionBy(col("l_orderkey"))
      val profiled = perSupp
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(col("supp_late")).over(w))
      profiled
        .filter(col("n_supp") >= 2 && col("n_late") === 1 && col("supp_late") === 1)
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q11 shape (important-stock value concentration, adapted: the
    // schema has no partsupp, so lineitem plays the part-supplier fact):
    // per-part value held by one nation's suppliers, keeping parts whose
    // value exceeds a fixed fraction of that nation's total. The global
    // threshold is ONE scalar row cross-joined (broadcast nested loop of
    // a 1-row side) against the per-part aggregate — both sides reuse the
    // same filtered fact subtree, no self-join of the fact against itself
    "q43_value_concentration" -> ((s, d) => {
      val v = (col("l_extendedprice") * col("l_quantity")).cast("decimal(18,4)")
      val natSupp = t(s, d, "supplier")
        .join(t(s, d, "nation").filter(col("n_name") === "NATION_1")
          .select("n_nationkey"), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val fact = t(s, d, "lineitem")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), v.as("v"))
      val threshold = fact.agg((sum(col("v")).cast("double") * lit(0.001)).as("thr"))
      fact.groupBy(col("l_partkey"))
        .agg(sum(col("v")).cast("double").as("value"))
        .crossJoin(broadcast(threshold))
        .filter(col("value") > col("thr"))
        .select(col("l_partkey"), col("value"))
    }),

    // TPC-H Q16 shape (supplier-part relationship counts): distinct
    // supplier count per (brand, type, size) over the observed
    // part-supplier pairs, excluding a "complaints" supplier list via
    // NOT IN — a broadcast anti-join, never a per-row subquery; the
    // pair-distinct happens inside the aggregate (count distinct), so no
    // pre-distinct shuffle of the fact
    "q44_supplier_part_counts" -> ((s, d) => {
      val excluded = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("x_suppkey"))
      t(s, d, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(excluded), col("l_suppkey") === col("x_suppkey"), "left_anti")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" && !col("p_type").startsWith("PROMO") &&
            col("p_size").isInCollection(Seq(1, 4, 7, 10, 13, 16, 19, 22)))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }))

  val oracles: Map[String, String] = Map(
    "q32_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, CAST(r.rev AS DOUBLE) AS total_revenue
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.rev = (SELECT max(rev) FROM rev)""".stripMargin,
    "q33_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l.* FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
        |), a AS (
        |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sumq, count(*) AS cnt
        |  FROM li GROUP BY 1
        |)
        |SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM li l JOIN a ON l.l_partkey = a.l_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * a.cnt * 5 < a.sumq""".stripMargin,
    "q34_big_volume_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 300
        |)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o.o_totalprice, CAST(b.sum_qty AS DOUBLE) AS sum_qty
        |FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q41_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q40_returned_revenue" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin,
    "q38_priority_class_by_flag" ->
      """SELECT l.l_returnflag,
        |CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q39_promo_revenue" ->
      """SELECT 100.0 *
        |CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |  THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
        |  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |AS promo_share
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1996-03-01'""".stripMargin,
    "q36_nation_profit" ->
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
        |CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q42_market_share" ->
      """SELECT year(o.o_orderdate) AS o_year,
        |CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |  THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
        |  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1997-01-01'
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_disjunctive_revenue" ->
      """SELECT
        |CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |count(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 40)
        |   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 5 AND 50 AND l.l_quantity >= 20)""".stripMargin,
    "q35_waiting_suppliers" ->
      """WITH li AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
        |), ps AS (
        |  SELECT l_orderkey, l_suppkey, max(late) AS supp_late FROM li GROUP BY 1, 2
        |), pr AS (
        |  SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |    sum(supp_late) OVER (PARTITION BY l_orderkey) AS n_late
        |  FROM ps
        |)
        |SELECT s.s_name, count(*) AS numwait
        |FROM pr JOIN supplier s ON pr.l_suppkey = s.s_suppkey
        |WHERE pr.n_supp >= 2 AND pr.n_late = 1 AND pr.supp_late = 1
        |GROUP BY 1""".stripMargin,
    "q29_funnel" ->
      """WITH v AS (SELECT user_id, min(CASE WHEN event_type='view' THEN ts END) AS t_view
        |           FROM events GROUP BY 1 HAVING t_view IS NOT NULL),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS users_view,
        |       (SELECT count(*) FROM c) AS users_click,
        |       (SELECT count(*) FROM p) AS users_purchase""".stripMargin,
    "q30_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |co AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY 1)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', cw, e.wk) / 7 AS INT) AS week_offset,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN co ON e.user_id = co.user_id
        |GROUP BY cw, week_offset""".stripMargin,
    "q31_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN supplier s ON l_suppkey = s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l_orderkey = o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin,
    "q26_cheapest_supplier" ->
      """WITH u AS (SELECT l_partkey, l_suppkey,
        |  l_extendedprice / l_quantity AS up FROM lineitem),
        |m AS (SELECT l_partkey, min(up) AS mn FROM u GROUP BY 1)
        |SELECT DISTINCT u.l_partkey AS partkey, s.s_name
        |FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.up = m.mn
        |JOIN supplier s ON u.l_suppkey = s.s_suppkey""".stripMargin,
    "q27_lapsed_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT count(*) FROM customer)
        |      > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= DATE '1998-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    "q28_dominant_suppliers" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |  sum(CAST(l_quantity AS DECIMAL(18,4))) AS sqty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_partkey AS partkey, s_name, CAST(sqty AS DOUBLE) AS supp_qty
        |FROM (SELECT l_partkey, l_suppkey, sqty,
        |        sum(sqty) OVER (PARTITION BY l_partkey) AS tqty FROM ps) w
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE sqty * 20 > tqty * 3""".stripMargin,
    "q23_percentiles" ->
      """SELECT o_orderpriority,
        |quantile_disc(o_totalprice, 0.5) AS p50,
        |quantile_disc(o_totalprice, 0.9) AS p90,
        |min(o_totalprice) AS lo, max(o_totalprice) AS hi, count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q22_pivot_priority" ->
      """SELECT o_orderstatus,
        |count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
        |count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
        |count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
        |count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low,
        |count(*) AS total FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q20_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |  / count(*) OVER w AS avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q21_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(date_diff('day',
        |  lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  o_orderdate) AS INT) AS days_since_prev
        |FROM orders""".stripMargin,
    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q19_grouping_sets" ->
      """SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (yr), ())""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_above_avg_balance" ->
      """SELECT c_custkey, c_name, c_nationkey FROM (
        |SELECT c_custkey, c_name, c_nationkey,
        |CAST(c_acctbal AS DECIMAL(18,4)) AS bal,
        |SUM(CAST(c_acctbal AS DECIMAL(18,4))) OVER (PARTITION BY c_nationkey) AS nat_sum,
        |COUNT(*) OVER (PARTITION BY c_nationkey) AS nat_cnt
        |FROM customer) WHERE bal * nat_cnt > nat_sum""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders o
        |WHERE year(o_orderdate) = 1995 AND EXISTS (
        |SELECT 1 FROM lineitem l
        |WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
        |AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) WHERE rn <= 3""".stripMargin,
    "q8_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q9_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q10_semi_anti" ->
      """SELECT c_mktsegment,
        |count(*) FILTER (WHERE has_o) AS with_orders,
        |count(*) FILTER (WHERE NOT has_o) AS without_orders
        |FROM (SELECT c_mktsegment,
        |  EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
        |  FROM customer)
        |GROUP BY c_mktsegment""".stripMargin,
    "q11_intersect_years" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q24_except_years" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q25_explode_top_words" ->
      """WITH words AS (
        |  SELECT source, w AS word, count(*) AS n
        |  FROM (SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |    FROM documents)
        |  GROUP BY source, w)
        |SELECT source, word, n, rk FROM (
        |  SELECT source, word, n,
        |    row_number() OVER (PARTITION BY source ORDER BY n DESC, word) AS rk
        |  FROM words)
        |WHERE rk <= 10""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT p_partkey,
        |upper(substring(p_name, 1, 8)) AS name_prefix,
        |concat_ws('/', p_brand, p_type) AS brand_type,
        |p_retailprice * 2 AS double_price,
        |p_partkey % 7 AS key_mod,
        |length(p_name) AS name_len,
        |CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
        |FROM part""".stripMargin,
    "q13_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
        |count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q15_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q16_big_customers" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 10""".stripMargin,
    "q17_custs_with_urgent" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%')""".stripMargin,
    "q14_priority_by_year" ->
      """SELECT year(o_orderdate) AS yr,
        |CAST(sum(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(sum(CASE WHEN NOT (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q43_value_concentration" ->
      """WITH fact AS (
        |  SELECT l.l_partkey, CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(18,4)) AS v
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_1'
        |)
        |SELECT l_partkey, CAST(sum(v) AS DOUBLE) AS value
        |FROM fact GROUP BY 1
        |HAVING CAST(sum(v) AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM fact)""".stripMargin,
    "q44_supplier_part_counts" ->
      """SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
        |  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin)
}
