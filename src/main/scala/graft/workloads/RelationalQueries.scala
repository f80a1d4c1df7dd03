package graft.workloads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.CatalogQuery
import graft.sources.Tables

/** Core relational operator catalog over the TPC-H-ish fixtures.
  *
  * Re-expresses, Spark-first, the operator surface catalogued in
  * SURVEY.md §2 from the reference's workloads (TPC-DS/ImpalaKit SQL,
  * Join/AggregationPerformance DSL — e.g. reference
  * `P/tpcds/TPCDS_1_4_Queries.scala`, `P/JoinPerformance.scala:38-70`,
  * `P/AggregationPerformance.scala:11-66`): hash aggregation, all join
  * shapes incl. semi/anti/correlated subqueries, window functions with
  * frames, rollup/cube/grouping sets, set operations, scalar function
  * families, top-k.
  *
  * Everything is declarative DataFrame DSL (or SQL text) so Catalyst
  * does pushdown / pruning / join selection; small dims are explicitly
  * broadcast. No collect(), no driver-side loops — every query is a
  * distributed plan that would run unchanged on a 1000-executor cluster.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Register views then run SQL text (the reference's SQL-text query
    * surface, cf. `P/Benchmark.scala:200-207`). */
  private def sqlQuery(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }

  val all: Seq[CatalogQuery] = Seq(

    // ------------------------------------------------------------------
    // Aggregation family (SURVEY §2.4)
    // ------------------------------------------------------------------
    CatalogQuery(
      "q01_pricing_summary",
      "Grouped hash aggregation with filter pushdown: sum/avg/count per flag+status (TPC-H Q1 shape)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Parity.dsum(col("l_quantity"), 0).as("sum_qty"),
            Parity.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
            Parity.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
            Parity.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
            Parity.davg(col("l_quantity"), 0).as("avg_qty"),
            Parity.davg(col("l_extendedprice"), 2).as("avg_price"),
            Parity.davg(col("l_discount"), 2).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
             |  ${Parity.dsumSql("l_quantity", 0)} AS sum_qty,
             |  ${Parity.dsumSql("l_extendedprice", 2)} AS sum_base_price,
             |  ${Parity.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
             |  ${Parity.dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
             |  ${Parity.davgSql("l_quantity", 0)} AS avg_qty,
             |  ${Parity.davgSql("l_extendedprice", 2)} AS avg_price,
             |  ${Parity.davgSql("l_discount", 2)} AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    CatalogQuery(
      "q02_scalar_stats",
      "Global (no-group) aggregate: count, count distinct, min/max, stddev_samp (AggregationPerformance scalar sweep shape)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  count(DISTINCT l_orderkey) AS n_orders,
             |  round(min(l_extendedprice), 2) AS min_price,
             |  round(max(l_extendedprice), 2) AS max_price,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(stddev_samp(l_extendedprice), 4) AS sd_price
             |FROM lineitem""".stripMargin)),

    CatalogQuery(
      "q07_conditional_agg",
      "Conditional aggregation: avg/sum over CASE WHEN (TPC-DS q27/q34/q88 pattern)",
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            Parity.davg(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")), 2).as("avg_urgent_price"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1L)).otherwise(lit(0L))).as("n_high"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus,
             |  count(*) AS n,
             |  ${Parity.davgSql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END", 2)} AS avg_urgent_price,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_high
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------------
    // Join family (SURVEY §2.3)
    // ------------------------------------------------------------------
    CatalogQuery(
      "q03_top_orders",
      "3-way join + grouped agg + top-k (TPC-H Q3 shape); dim filter pushed below join",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(Parity.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, o_orderdate,
             |  ${Parity.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin)),

    CatalogQuery(
      "q04_order_priority",
      "Semi join (EXISTS) + grouped count (TPC-H Q4 shape)",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val returned = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-07-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    CatalogQuery(
      "q05_region_volume",
      "5-way star join with broadcast dims (TPC-H Q5 shape; ImpalaKit q19 5-dim map-join chain)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val su = broadcast(t(s, dir, "supplier"))
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(Parity.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
             |  ${Parity.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    CatalogQuery(
      "q06_forecast_revenue",
      "Scalar filter aggregate with BETWEEN range predicates (TPC-H Q6 shape)",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
          .agg(Parity.dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
      },
      Some(s"""SELECT ${Parity.dsumSql("l_extendedprice * l_discount", 4)} AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    CatalogQuery(
      "q08_left_join",
      "Left outer join preserving unmatched rows + null-skipping count/coalesce",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(Parity.dsum(col("o_totalprice"), 2), lit(0.0)).as("total_spent"))
          .filter(col("n_orders") <= 2)
          .orderBy(col("c_custkey"))
      },
      Some(s"""SELECT c_custkey, c_name,
             |  count(o_orderkey) AS n_orders,
             |  coalesce(${Parity.dsumSql("o_totalprice", 2)}, 0.0) AS total_spent
             |FROM customer
             |LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name
             |HAVING count(o_orderkey) <= 2
             |ORDER BY c_custkey""".stripMargin)),

    CatalogQuery(
      "q09_full_outer",
      "Full outer join of two aggregated sides on a shared key",
      (s, dir) => {
        val cs = t(s, dir, "customer")
          .groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val ss = t(s, dir, "supplier")
          .groupBy(col("s_nationkey").cast("long").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        cs.join(ss, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH cs AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_cust
             |            FROM customer GROUP BY 1),
             |     ss AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n_supp
             |            FROM supplier GROUP BY 1)
             |SELECT nationkey, coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
             |FROM cs FULL OUTER JOIN ss USING (nationkey)
             |ORDER BY nationkey""".stripMargin)),

    CatalogQuery(
      "q10_anti_join",
      "Anti join (NOT EXISTS): customers with no urgent orders",
      (s, dir) => {
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        t(s, dir, "customer")
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    CatalogQuery(
      "q11_semi_in",
      "Semi join via IN-subquery: brands with returned parts",
      (s, dir) => {
        val returned = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        t(s, dir, "part")
          .join(returned, col("p_partkey") === col("l_partkey"), "left_semi")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_parts
             |FROM part
             |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin)),

    CatalogQuery(
      "q12_correlated_subquery",
      "Correlated scalar subquery (TPC-H-ish; TPC-DS q1 pattern) — Catalyst decorrelation",
      sqlQuery("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
                 |FROM orders o1
                 |WHERE o_totalprice > 2.0 * (SELECT avg(o_totalprice) FROM orders o2
                 |                            WHERE o2.o_custkey = o1.o_custkey)
                 |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
             |FROM orders o1
             |WHERE o_totalprice > 2.0 * (SELECT avg(o_totalprice) FROM orders o2
             |                            WHERE o2.o_custkey = o1.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    CatalogQuery(
      "q13_uncorrelated_subquery",
      "Uncorrelated scalar subquery (TPC-DS q9 pattern)",
      sqlQuery("""SELECT p_partkey, p_name, round(p_retailprice, 2) AS retailprice
                 |FROM part
                 |WHERE p_retailprice > 1.005 * (SELECT avg(p_retailprice) FROM part)
                 |ORDER BY p_partkey""".stripMargin),
      Some("""SELECT p_partkey, p_name, round(p_retailprice, 2) AS retailprice
             |FROM part
             |WHERE p_retailprice > 1.005 * (SELECT avg(p_retailprice) FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Window functions (SURVEY §2.5)
    // ------------------------------------------------------------------
    CatalogQuery(
      "q14_window_rank",
      "rank() over partition + rank-bounded top-k (TPC-DS q67/q44 pattern)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val su = broadcast(t(s, dir, "supplier"))
        val rev = li.join(su, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), col("s_suppkey"))
          .agg(Parity.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        val w = Window.partitionBy(col("s_nationkey")).orderBy(col("revenue").desc, col("s_suppkey"))
        rev.withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("s_nationkey").cast("long").as("nationkey"),
            col("s_suppkey").as("suppkey"), col("revenue"), col("rk"))
          .orderBy(col("nationkey"), col("rk"), col("suppkey"))
      },
      Some(s"""WITH rev AS (
             |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, s_suppkey AS suppkey,
             |    ${Parity.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2)
             |SELECT nationkey, suppkey, revenue, rk FROM (
             |  SELECT nationkey, suppkey, revenue,
             |    CAST(rank() OVER (PARTITION BY nationkey ORDER BY revenue DESC, suppkey) AS BIGINT) AS rk
             |  FROM rev)
             |WHERE rk <= 3
             |ORDER BY nationkey, rk, suppkey""".stripMargin)),

    CatalogQuery(
      "q15_window_running",
      "Cumulative frame: rows between unbounded preceding and current row (TPC-DS q51 pattern)",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 1000)
          .select(col("l_orderkey"),
            col("l_linenumber").cast("long").as("linenumber"),
            round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
          .orderBy(col("l_orderkey"), col("linenumber"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
             |  round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
             |FROM lineitem
             |WHERE l_orderkey <= 1000
             |ORDER BY l_orderkey, linenumber""".stripMargin)),

    CatalogQuery(
      "q16_window_ratio",
      "Ratio-to-report: window over aggregate output (TPC-DS q12/q20/q98 pattern)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = broadcast(t(s, dir, "part"))
        val agg = li.join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type"))
          .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e4).cast("long")).as("rev_s"))
        agg.select(col("p_type"),
          (col("rev_s").cast("double") / lit(1e4)).as("revenue"),
          (col("rev_s").cast("double") * 100.0 / sum(col("rev_s")).over(Window.partitionBy()).cast("double")).as("share_pct"))
          .orderBy(col("p_type"))
      },
      Some("""WITH agg AS (
             |  SELECT p_type, sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e4) AS BIGINT)) AS rev_s
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY p_type)
             |SELECT p_type, CAST(rev_s AS DOUBLE) / 1e4 AS revenue,
             |  CAST(rev_s AS DOUBLE) * 100.0 / CAST(sum(rev_s) OVER () AS DOUBLE) AS share_pct
             |FROM agg
             |ORDER BY p_type""".stripMargin)),

    CatalogQuery(
      "q17_window_lag",
      "lag/lead month-over-month delta (TPC-DS q47/q57 psum/msum semantics via lag)",
      (s, dir) => {
        val monthly = t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(Parity.dsum(col("o_totalprice"), 2).as("revenue"))
        val w = Window.orderBy(col("month"))
        monthly.select(col("month"), col("revenue"),
          (col("revenue") - lag(col("revenue"), 1).over(w)).as("delta_prev"),
          (lead(col("revenue"), 1).over(w) - col("revenue")).as("delta_next"))
          .orderBy(col("month"))
      },
      Some(s"""WITH monthly AS (
             |  SELECT date_trunc('month', o_orderdate) AS month,
             |    ${Parity.dsumSql("o_totalprice", 2)} AS revenue
             |  FROM orders GROUP BY 1)
             |SELECT month, revenue,
             |  revenue - lag(revenue, 1) OVER (ORDER BY month) AS delta_prev,
             |  lead(revenue, 1) OVER (ORDER BY month) - revenue AS delta_next
             |FROM monthly
             |ORDER BY month""".stripMargin)),

    // ------------------------------------------------------------------
    // Grouping sets / rollup / cube (SURVEY §2.4 rollup+grouping())
    // ------------------------------------------------------------------
    CatalogQuery(
      "q18_rollup",
      "GROUP BY ROLLUP with grouping() (TPC-DS q18/q22/q27/q36/q67/q70/q77/q80/q86 pattern)",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            Parity.dsum(col("o_totalprice"), 2).as("total"),
            (grouping(col("n_name")) + grouping(col("o_orderpriority"))).cast("long").as("lochierarchy"))
          .orderBy(col("lochierarchy").desc, col("n_name"), col("o_orderpriority"))
      },
      Some(s"""SELECT n_name, o_orderpriority, count(*) AS n,
             |  ${Parity.dsumSql("o_totalprice", 2)} AS total,
             |  CAST(grouping(n_name) + grouping(o_orderpriority) AS BIGINT) AS lochierarchy
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP (n_name, o_orderpriority)
             |ORDER BY lochierarchy DESC, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    CatalogQuery(
      "q19_cube",
      "GROUP BY CUBE over two dimensions",
      (s, dir) => {
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("l_quantity"), 0).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  ${Parity.dsumSql("l_quantity", 0)} AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    CatalogQuery(
      "q20_grouping_sets",
      "Explicit GROUPING SETS with grouping() disambiguation",
      sqlQuery("""SELECT c_mktsegment, o_orderstatus, count(*) AS n,
                 |  CAST(grouping(c_mktsegment) AS INT) AS g_seg,
                 |  CAST(grouping(o_orderstatus) AS INT) AS g_status
                 |FROM orders JOIN customer ON o_custkey = c_custkey
                 |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
                 |ORDER BY g_seg, g_status, c_mktsegment, o_orderstatus""".stripMargin),
      Some("""SELECT c_mktsegment, o_orderstatus, count(*) AS n,
             |  CAST(grouping(c_mktsegment) AS INT) AS g_seg,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_status
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
             |ORDER BY g_seg, g_status, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------------
    // Set operations (SURVEY §2.7)
    // ------------------------------------------------------------------
    CatalogQuery(
      "q21_union",
      "UNION ALL of two channels then re-aggregate (TPC-DS q2/q5/q71 cross-channel pattern)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = li.filter(col("l_returnflag") === "A")
          .select(col("l_linestatus"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("amount"))
        val n = li.filter(col("l_returnflag") === "N")
          .select(col("l_linestatus"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("amount"))
        a.union(n)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("amount"), 4).as("total"))
          .orderBy(col("l_linestatus"))
      },
      Some(s"""SELECT l_linestatus, count(*) AS n, ${Parity.dsumSql("amount", 4)} AS total
             |FROM (
             |  SELECT l_linestatus, l_extendedprice * (1.0 - l_discount) AS amount
             |  FROM lineitem WHERE l_returnflag = 'A'
             |  UNION ALL
             |  SELECT l_linestatus, l_extendedprice * (1.0 - l_discount) AS amount
             |  FROM lineitem WHERE l_returnflag = 'N')
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    CatalogQuery(
      "q22_intersect",
      "INTERSECT (distinct semantics) of two key sets (TPC-DS q8/q14/q38 pattern)",
      (s, dir) => {
        val cn = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_nationkey").cast("long").as("nationkey"))
        val sn = t(s, dir, "supplier").filter(col("s_acctbal") > 0)
          .select(col("s_nationkey").cast("long").as("nationkey"))
        cn.intersect(sn).orderBy(col("nationkey"))
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer WHERE c_acctbal > 5000
             |INTERSECT
             |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier WHERE s_acctbal > 0
             |ORDER BY nationkey""".stripMargin)),

    CatalogQuery(
      "q23_except",
      "EXCEPT (distinct semantics) between two key sets (TPC-DS q87 pattern)",
      (s, dir) => {
        val cn = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("nationkey"))
        val sn = t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey").cast("long").as("nationkey"))
        cn.except(sn).orderBy(col("nationkey"))
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             |EXCEPT
             |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier WHERE s_acctbal > 5000
             |ORDER BY nationkey""".stripMargin)),

    CatalogQuery(
      "q24_distinct",
      "DISTINCT projection over a join",
      (s, dir) => {
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderpriority"))
          .distinct()
          .orderBy(col("c_mktsegment"), col("o_orderpriority"))
      },
      Some("""SELECT DISTINCT c_mktsegment, o_orderpriority
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // Scalar functions / predicates / top-k (SURVEY §2.2, §2.6, §2.8)
    // ------------------------------------------------------------------
    CatalogQuery(
      "q25_string_funcs",
      "String function family: substring/upper/length/concat_ws/replace",
      (s, dir) => {
        t(s, dir, "customer")
          .select(col("c_custkey"),
            upper(substring(col("c_name"), 1, 8)).as("prefix"),
            length(col("c_name")).cast("long").as("name_len"),
            concat_ws("/", col("c_mktsegment"), col("c_name")).as("tagged"),
            regexp_replace(col("c_name"), "[aeiou]", "_").as("devoweled"))
          .filter(col("c_custkey") <= 200)
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  upper(substring(c_name, 1, 8)) AS prefix,
             |  CAST(length(c_name) AS BIGINT) AS name_len,
             |  concat_ws('/', c_mktsegment, c_name) AS tagged,
             |  regexp_replace(c_name, '[aeiou]', '_', 'g') AS devoweled
             |FROM customer
             |WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    CatalogQuery(
      "q26_date_funcs",
      "Date part extraction + grouped aggregation (year/quarter)",
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
            quarter(col("o_orderdate")).cast("long").as("qtr"))
          .agg(count(lit(1)).as("n_orders"), Parity.dsum(col("o_totalprice"), 2).as("total"))
          .orderBy(col("yr"), col("qtr"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             |  count(*) AS n_orders, ${Parity.dsumSql("o_totalprice", 2)} AS total
             |FROM orders
             |GROUP BY 1, 2
             |ORDER BY yr, qtr""".stripMargin)),

    CatalogQuery(
      "q27_topk",
      "Global ORDER BY + LIMIT (TakeOrderedAndProject; every TPC-DS query tail)",
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
            round(col("l_extendedprice"), 2).as("price"))
          .orderBy(col("price").desc, col("l_orderkey"), col("linenumber"))
          .limit(100)
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
             |  round(l_extendedprice, 2) AS price
             |FROM lineitem
             |ORDER BY price DESC, l_orderkey, linenumber
             |LIMIT 100""".stripMargin)),

    CatalogQuery(
      "q28_in_like",
      "IN-list + LIKE + BETWEEN predicate combination (TPC-DS MultiJoin filters)",
      (s, dir) => {
        t(s, dir, "part")
          .filter(col("p_type").isin("PROMO", "ECONOMY") &&
            col("p_name").like("%red%") &&
            col("p_size").between(1, 25))
          .select(col("p_partkey"), col("p_name"), col("p_brand"),
            col("p_size").cast("long").as("size"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, p_brand, CAST(p_size AS BIGINT) AS size
             |FROM part
             |WHERE p_type IN ('PROMO', 'ECONOMY')
             |  AND p_name LIKE '%red%'
             |  AND p_size BETWEEN 1 AND 25
             |ORDER BY p_partkey""".stripMargin)),

    CatalogQuery(
      "q29_explode",
      "Generator (explode/unnest): word frequencies from split strings (reference's only generator, `P/RunBenchmark.scala:153`)",
      (s, dir) => {
        t(s, dir, "part")
          .select(explode(split(trim(col("p_name")), "\\s+")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("word"))
      },
      Some("""SELECT word, count(*) AS n
             |FROM (SELECT unnest(regexp_split_to_array(trim(p_name), '\s+')) AS word FROM part)
             |GROUP BY word
             |ORDER BY word""".stripMargin)),

    CatalogQuery(
      "q30_row_checksum",
      "Row-level checksum (HashResults semantics, `P/Query.scala:130-136`) via md5 over canonicalized rows",
      (s, dir) => {
        t(s, dir, "nation")
          .select(md5(concat_ws("|",
            col("n_nationkey").cast("string"),
            col("n_name"),
            col("n_regionkey").cast("string"))).as("row_md5"))
          .agg(count(lit(1)).as("n"), countDistinct(col("row_md5")).as("n_distinct"),
            min(col("row_md5")).as("min_md5"), max(col("row_md5")).as("max_md5"))
      },
      Some("""SELECT count(*) AS n, count(DISTINCT row_md5) AS n_distinct,
             |  min(row_md5) AS min_md5, max(row_md5) AS max_md5
             |FROM (SELECT md5(concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name,
             |        CAST(n_regionkey AS VARCHAR))) AS row_md5 FROM nation)""".stripMargin)),
  )
}
