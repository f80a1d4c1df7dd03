package graft.workloads

import org.apache.spark.sql.SparkSession

import graft.core.{Benchmark, ExecutionMode, Query}
import graft.datagen.StarSchema

/** TPC-DS-shaped analytic suite over the generated retail star schema
  * — own-worded queries capturing the distinctive reference patterns
  * (date_sk partition filters, star map-join chains, rollup+grouping
  * hierarchies with windowed rank, cross-channel unions, period
  * intersects, wide scans, decimal money arithmetic).
  *
  * The SQL texts are engine-portable (Spark AND DuckDB): explicit
  * NULLS FIRST on nullable ASC sort keys, BIGINT casts on integer
  * aggregates, fixed-point money math. They are consumed twice:
  *   - RetailBenchmark runs them over freshly GENERATED tables at any
  *     factRows with checksum stability (HashResults) — the scale
  *     surface;
  *   - RetailCatalog runs them over the deterministic parquet snapshot
  *     with a value-level DuckDB oracle — the correctness surface.
  */
object RetailQueries {

  /** (name, description, portable SQL). */
  val defs: Seq[(String, String, String)] = Seq(

    ("rq1_category_rollup_rank",
      "revenue rollup over (category, brand) + grouping() hierarchy + windowed rank (q36/q70/q86 shape)",
      """SELECT * FROM (
        |  SELECT lochierarchy, i_category, i_brand, rev_c,
        |    rank() OVER (PARTITION BY lochierarchy ORDER BY rev_c DESC) AS rk
        |  FROM (
        |    SELECT CAST(grouping(i_category) + grouping(i_brand) AS INT) AS lochierarchy,
        |      i_category, i_brand,
        |      CAST(sum(ss_quantity * CAST(round(i_list_price * 100) AS BIGINT) * (100 - ss_discount_pct)) AS BIGINT) AS rev_c
        |    FROM store_sales JOIN item ON ss_item_sk = i_item_sk
        |    GROUP BY ROLLUP (i_category, i_brand)) hier) ranked
        |WHERE rk <= 5
        |ORDER BY lochierarchy DESC, rk,
        |  i_category ASC NULLS FIRST, i_brand ASC NULLS FIRST""".stripMargin),

    ("rq2_channel_union",
      "cross-channel UNION ALL then re-aggregation (q2/q5/q71 shape; channels = market segments)",
      """SELECT d_year, d_qoy, count(*) AS n, CAST(sum(qty) AS BIGINT) AS total_qty FROM (
        |  SELECT ss_sold_date_sk, ss_quantity AS qty
        |  FROM store_sales JOIN store ON ss_store_sk = s_store_sk WHERE s_market < 2
        |  UNION ALL
        |  SELECT ss_sold_date_sk, ss_quantity AS qty
        |  FROM store_sales JOIN store ON ss_store_sk = s_store_sk WHERE s_market >= 2) u
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |GROUP BY d_year, d_qoy
        |ORDER BY d_year, d_qoy""".stripMargin),

    ("rq3_year_over_year",
      "monthly revenue with lag window for month-over-month deltas (q47/q57 shape)",
      """WITH monthly AS (
        |  SELECT d_year, d_moy, CAST(sum(ss_quantity) AS BIGINT) AS qty
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  GROUP BY d_year, d_moy)
        |SELECT d_year, d_moy, qty,
        |  qty - lag(qty) OVER (ORDER BY d_year, d_moy) AS delta
        |FROM monthly
        |ORDER BY d_year, d_moy""".stripMargin),

    ("rq4_top_brands_per_state",
      "per-state brand ranking, rank-bounded top-k (q67 shape)",
      """SELECT * FROM (
        |  SELECT s_state, i_brand, CAST(sum(ss_quantity) AS BIGINT) AS qty,
        |    rank() OVER (PARTITION BY s_state ORDER BY sum(ss_quantity) DESC, i_brand) AS rk
        |  FROM store_sales
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  GROUP BY s_state, i_brand) ranked
        |WHERE rk <= 3
        |ORDER BY s_state, rk""".stripMargin),

    ("rq5_demographic_buckets",
      "conditional aggregation buckets over customer demographics (q27/q34/q88 shape)",
      """SELECT c_gender,
        |  count(CASE WHEN c_birth_year < 1960 THEN 1 END) AS boomer_sales,
        |  count(CASE WHEN c_birth_year BETWEEN 1960 AND 1980 THEN 1 END) AS genx_sales,
        |  count(CASE WHEN c_birth_year > 1980 THEN 1 END) AS younger_sales,
        |  CAST(sum(ss_quantity) AS BIGINT) AS total_qty
        |FROM store_sales JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |GROUP BY c_gender
        |ORDER BY c_gender""".stripMargin),

    ("rq6_date_range_scan",
      "date_sk partition-key range filter (the reference's '-- partition key filter' pattern)",
      """SELECT d_year, count(*) AS n, CAST(sum(ss_quantity) AS BIGINT) AS qty
        |FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |WHERE ss_sold_date_sk BETWEEN 365 AND 730
        |GROUP BY d_year ORDER BY d_year""".stripMargin),

    ("rq7_period_intersect",
      "items selling in both periods via INTERSECT (q14/q38 shape)",
      """SELECT count(*) AS n_common FROM (
        |  SELECT DISTINCT ss_item_sk FROM store_sales WHERE ss_sold_date_sk < 365
        |  INTERSECT
        |  SELECT DISTINCT ss_item_sk FROM store_sales WHERE ss_sold_date_sk >= 1096) both_periods""".stripMargin),

    ("rq8_wide_scan_max",
      "single-pass wide aggregate over the fact table (qSsMax shape)",
      """SELECT count(*) AS n, count(DISTINCT ss_item_sk) AS d_items,
        |  count(DISTINCT ss_store_sk) AS d_stores,
        |  count(DISTINCT ss_customer_sk) AS d_cust,
        |  max(ss_sold_date_sk) AS max_date, max(ss_quantity) AS max_qty,
        |  max(ss_discount_pct) AS max_disc
        |FROM store_sales""".stripMargin),

    ("rq9_cross_channel_customers",
      "customers active in all three channels via 3-way INTERSECT (q38/q87 shape on real channels)",
      """SELECT count(*) AS n FROM (
        |  SELECT DISTINCT ss_customer_sk AS c FROM store_sales
        |  INTERSECT
        |  SELECT DISTINCT cs_customer_sk AS c FROM catalog_sales
        |  INTERSECT
        |  SELECT DISTINCT ws_customer_sk AS c FROM web_sales) tri""".stripMargin),

    ("rq10_channel_rollup",
      "per-channel yearly volumes via UNION ALL + rollup (q5/q77/q80 cross-channel report shape)",
      """SELECT channel, d_year, count(*) AS n, CAST(sum(qty) AS BIGINT) AS total_qty,
        |  CAST(grouping(channel) + grouping(d_year) AS INT) AS g
        |FROM (
        |  SELECT 'store' AS channel, ss_sold_date_sk AS dsk, ss_quantity AS qty FROM store_sales
        |  UNION ALL
        |  SELECT 'catalog', cs_sold_date_sk, cs_quantity FROM catalog_sales
        |  UNION ALL
        |  SELECT 'web', ws_sold_date_sk, ws_quantity FROM web_sales) u
        |JOIN date_dim ON dsk = d_date_sk
        |GROUP BY ROLLUP (channel, d_year)
        |ORDER BY g, channel ASC NULLS FIRST, d_year ASC NULLS FIRST""".stripMargin),

    ("rq11_return_ratio",
      "fact-fact join on compound key: per-item return ratios (q17/q50 sales-returns shape)",
      """SELECT i_category,
        |  count(sr_sale_id) AS n_returns, count(*) AS n_sales,
        |  CAST(sum(coalesce(sr_return_quantity, 0)) AS BIGINT) AS returned_qty
        |FROM store_sales
        |LEFT JOIN store_returns
        |  ON ss_id = sr_sale_id AND ss_item_sk = sr_item_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |GROUP BY i_category
        |ORDER BY i_category""".stripMargin),

    ("rq12_promo_window",
      "sales inside a promotion's date window via range-predicate join (q61-ish promo effect)",
      """SELECT count(*) AS promo_sales, CAST(sum(ss_quantity) AS BIGINT) AS promo_qty
        |FROM store_sales JOIN promotion
        |  ON ss_item_sk = p_item_sk
        | AND ss_sold_date_sk BETWEEN p_start_date_sk AND p_end_date_sk""".stripMargin),

    ("rq13_activity_profile",
      "EXISTS + NOT EXISTS customer activity profile (q10/q16/q69 shape)",
      """SELECT c_gender, count(*) AS n
        |FROM customer_dim
        |WHERE EXISTS (SELECT 1 FROM store_sales WHERE ss_customer_sk = c_customer_sk)
        |  AND NOT EXISTS (SELECT 1 FROM web_sales WHERE ws_customer_sk = c_customer_sk)
        |GROUP BY c_gender
        |ORDER BY c_gender""".stripMargin),

    ("rq14_above_average_returns",
      "correlated scalar subquery: customers returning above 1.2x their store-date cohort average (q1 ctr shape)",
      """WITH ctr AS (
        |  SELECT sr_customer_sk, sr_returned_date_sk % 50 AS cohort,
        |    CAST(sum(sr_return_quantity) AS BIGINT) AS total_return
        |  FROM store_returns GROUP BY 1, 2)
        |SELECT count(*) AS n_heavy_returners
        |FROM ctr c1
        |WHERE total_return > 1.2 * (SELECT avg(total_return) FROM ctr c2
        |                            WHERE c1.cohort = c2.cohort)""".stripMargin),

    ("rq15_time_bucket_counts",
      "parallel CASE-bucket counts in one scan (q88 time-slot shape, buckets = quarters)",
      """SELECT
        |  count(CASE WHEN d_qoy = 1 THEN 1 END) AS q1_sales,
        |  count(CASE WHEN d_qoy = 2 THEN 1 END) AS q2_sales,
        |  count(CASE WHEN d_qoy = 3 THEN 1 END) AS q3_sales,
        |  count(CASE WHEN d_qoy = 4 THEN 1 END) AS q4_sales
        |FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk""".stripMargin),

    ("rq16_running_totals",
      "cumulative window frame per item over time (q51 shape)",
      """SELECT ss_item_sk, d_moy,
        |  CAST(sum(sum(ss_quantity)) OVER (PARTITION BY ss_item_sk ORDER BY d_moy
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
        |FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |WHERE ss_item_sk < 20 AND d_year = 2021
        |GROUP BY ss_item_sk, d_moy
        |ORDER BY ss_item_sk, d_moy""".stripMargin),

    ("rq17_category_share",
      "ratio-to-report: category revenue share within its market (q12/q20/q98 shape)",
      """SELECT i_category, s_market,
        |  CAST(sum(ss_quantity) AS BIGINT) AS qty,
        |  CAST(sum(ss_quantity) AS BIGINT) * 10000
        |    / sum(CAST(sum(ss_quantity) AS BIGINT)) OVER (PARTITION BY s_market) AS share_bps
        |FROM store_sales
        |JOIN item ON ss_item_sk = i_item_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |GROUP BY i_category, s_market
        |ORDER BY s_market, i_category""".stripMargin),

    ("rq18_channel_except",
      "EXCEPT chain: store-only customers (q87 shape)",
      """SELECT count(*) AS n_store_only FROM (
        |  SELECT DISTINCT ss_customer_sk AS c FROM store_sales
        |  EXCEPT SELECT DISTINCT cs_customer_sk AS c FROM catalog_sales
        |  EXCEPT SELECT DISTINCT ws_customer_sk AS c FROM web_sales) so""".stripMargin),

    ("rq19_cte_reuse",
      "multi-CTE with the same CTE consumed twice (q2/q23 shape)",
      """WITH weekly AS (
        |  SELECT d_year, d_dow, CAST(sum(ss_quantity) AS BIGINT) AS qty
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  GROUP BY d_year, d_dow)
        |SELECT a.d_dow, a.qty AS qty_2021, b.qty AS qty_2022,
        |  b.qty * 10000 / a.qty AS growth_bps
        |FROM weekly a JOIN weekly b ON a.d_dow = b.d_dow
        |WHERE a.d_year = 2021 AND b.d_year = 2022
        |ORDER BY a.d_dow""".stripMargin),

    ("rq20_monthly_vs_yearly",
      "window over aggregate: monthly deviation from the item's yearly average (q47/q57 full shape)",
      """SELECT * FROM (
        |  SELECT ss_item_sk, d_year, d_moy,
        |    CAST(sum(ss_quantity) AS BIGINT) AS qty,
        |    avg(CAST(sum(ss_quantity) AS BIGINT))
        |      OVER (PARTITION BY ss_item_sk, d_year) AS yr_avg
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE ss_item_sk < 10
        |  GROUP BY ss_item_sk, d_year, d_moy) m
        |WHERE qty > 1.5 * yr_avg
        |ORDER BY ss_item_sk, d_year, d_moy""".stripMargin),

    ("rq21_inventory_shift",
      "on-hand inventory before/after a pivot date per warehouse-state x category (q21 shape)",
      """SELECT w_state, i_category,
        |  CAST(sum(CASE WHEN inv_date_sk < 735 THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS before_qty,
        |  CAST(sum(CASE WHEN inv_date_sk >= 735 THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS after_qty
        |FROM inventory
        |JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
        |JOIN item ON inv_item_sk = i_item_sk
        |WHERE inv_date_sk BETWEEN 735 - 210 AND 735 + 210
        |GROUP BY w_state, i_category
        |HAVING sum(CASE WHEN inv_date_sk >= 735 THEN inv_quantity_on_hand ELSE 0 END) * 10
        |  BETWEEN sum(CASE WHEN inv_date_sk < 735 THEN inv_quantity_on_hand ELSE 0 END) * 5
        |      AND sum(CASE WHEN inv_date_sk < 735 THEN inv_quantity_on_hand ELSE 0 END) * 20
        |ORDER BY w_state, i_category""".stripMargin),

    ("rq22_inventory_rollup",
      "average weekly on-hand rollup over the item hierarchy (q22 shape)",
      """SELECT i_category, i_brand,
        |  CAST(grouping(i_category) + grouping(i_brand) AS INT) AS g,
        |  CAST(sum(inv_quantity_on_hand) AS BIGINT) AS total_on_hand,
        |  count(*) AS n_weeks
        |FROM inventory JOIN item ON inv_item_sk = i_item_sk
        |GROUP BY ROLLUP (i_category, i_brand)
        |ORDER BY g, i_category ASC NULLS FIRST, i_brand ASC NULLS FIRST""".stripMargin),

    ("rq23_ship_lag_buckets",
      "sold-to-ship lag bucketed 30/60/90+ days per ship mode x warehouse state (q62/q99 shape)",
      """SELECT sm_type, w_state,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk <= 30 THEN 1 END) AS d30,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk BETWEEN 31 AND 60 THEN 1 END) AS d60,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk BETWEEN 61 AND 90 THEN 1 END) AS d90,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 90 THEN 1 END) AS d90plus
        |FROM catalog_sales
        |JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
        |JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |GROUP BY sm_type, w_state
        |ORDER BY sm_type, w_state""".stripMargin),

    ("rq24_returns_by_reason",
      "top return reasons by returned quantity (q85 reporting shape)",
      """SELECT r_reason_desc, count(*) AS n_returns,
        |  CAST(sum(wr_return_quantity) AS BIGINT) AS returned_qty
        |FROM web_returns JOIN reason ON wr_reason_sk = r_reason_sk
        |GROUP BY r_reason_desc
        |ORDER BY returned_qty DESC, r_reason_desc
        |LIMIT 10""".stripMargin),

    ("rq25_shift_ratio",
      "morning vs evening sales counts via time_dim scalar subqueries (q90 shape)",
      """SELECT CAST(am.cnt AS BIGINT) AS am_cnt, CAST(pm.cnt AS BIGINT) AS pm_cnt,
        |  CASE WHEN pm.cnt > 0 THEN am.cnt * 10000 div pm.cnt END AS am_pm_bps
        |FROM
        |  (SELECT count(*) AS cnt FROM store_sales
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   WHERE t_hour BETWEEN 7 AND 11) am,
        |  (SELECT count(*) AS cnt FROM store_sales
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   WHERE t_hour BETWEEN 17 AND 21) pm""".stripMargin),

    ("rq26_basket_size",
      "per-(customer,day) basket-size histogram for high-dependent households (q34/q73 shape)",
      """WITH baskets AS (
        |  SELECT ss_customer_sk, ss_sold_date_sk, count(*) AS n_items
        |  FROM store_sales
        |  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |  WHERE hd_dep_count >= 5
        |  GROUP BY ss_customer_sk, ss_sold_date_sk)
        |SELECT n_items, count(*) AS n_baskets
        |FROM baskets
        |WHERE n_items BETWEEN 2 AND 15
        |GROUP BY n_items
        |ORDER BY n_items""".stripMargin),

    ("rq27_income_geo",
      "customer counts per state x income band through a 4-dim snowflake chain (q84 shape)",
      """SELECT ca_state, CAST(ib_lower_bound AS BIGINT) AS band_floor, count(*) AS n_customers
        |FROM customer_dim
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN household_demographics ON c_hdemo_sk = hd_demo_sk
        |JOIN income_band ON hd_income_band_sk = ib_income_band_sk
        |WHERE ib_lower_bound >= 30000 AND ib_upper_bound <= 70000
        |GROUP BY ca_state, ib_lower_bound
        |ORDER BY ca_state, band_floor""".stripMargin),

    ("rq28_cross_channel_returns",
      "returned quantity per channel via 3-way returns UNION ALL (q77 returns leg)",
      """SELECT channel, count(*) AS n_returns, CAST(sum(ret_qty) AS BIGINT) AS returned_qty
        |FROM (
        |  SELECT 'store' AS channel, sr_return_quantity AS ret_qty FROM store_returns
        |  UNION ALL
        |  SELECT 'catalog', cr_return_quantity FROM catalog_returns
        |  UNION ALL
        |  SELECT 'web', wr_return_quantity FROM web_returns) u
        |GROUP BY channel
        |ORDER BY channel""".stripMargin),

    ("rq29_local_sales",
      "same-state (store vs customer address) sales share, 4-way star join (q61-ish locality)",
      """SELECT s_state,
        |  count(CASE WHEN ca_state = s_state THEN 1 END) AS local_sales,
        |  count(*) AS all_sales
        |FROM store_sales
        |JOIN store ON ss_store_sk = s_store_sk
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |GROUP BY s_state
        |ORDER BY s_state""".stripMargin),

    ("rq30_first_purchase_cohort",
      "new-customer cohorts by first-purchase quarter (min-date cohorting, q'customer lifetime' shape)",
      """WITH first_buy AS (
        |  SELECT ss_customer_sk AS c, min(ss_sold_date_sk) AS first_dsk
        |  FROM store_sales GROUP BY ss_customer_sk)
        |SELECT d_year, d_qoy, count(*) AS n_new_customers
        |FROM first_buy JOIN date_dim ON first_dsk = d_date_sk
        |GROUP BY d_year, d_qoy
        |ORDER BY d_year, d_qoy""".stripMargin),

    ("rq31_decimal_revenue",
      "exact DECIMAL(15,2) revenue/profit per category — decimal sums surfaced as exact integer cents",
      """SELECT i_category,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS revenue_cents,
        |  CAST(sum(ss_net_profit) * 100 AS BIGINT) AS profit_cents,
        |  count(*) AS n
        |FROM store_sales JOIN item ON ss_item_sk = i_item_sk
        |GROUP BY i_category
        |ORDER BY i_category""".stripMargin),

    ("rq32_decimal_margin",
      "DECIMAL comparison predicates + min/max decimal arithmetic (low-margin detector)",
      """SELECT count(*) AS n_low_margin,
        |  CAST(min(ss_net_profit) * 100 AS BIGINT) AS min_profit_cents,
        |  CAST(max(ss_ext_discount_amt) * 100 AS BIGINT) AS max_discount_cents
        |FROM store_sales
        |WHERE ss_net_profit < ss_ext_wholesale_cost * 0.10""".stripMargin))

  /** Names whose SQL needs a DuckDB-dialect tweak for the oracle text. */
  def duckDialect(sql: String): String =
    sql.replace(" div ", " // ")
}

/** Scale surface: the same queries over freshly generated tables at any
  * factRows, checksum-stability gated (`ExecutionMode.HashResults`) —
  * generated data is deterministic, so each query's crc32 checksum must
  * be identical across runs, configs, and partitionings. */
class RetailBenchmark(spark: SparkSession, factRows: Long = 1000000L,
    resultsLocation: String = "/tmp/graft-results")
    extends Benchmark(spark, resultsLocation) {

  override def allTables = StarSchema.tables(spark, factRows)

  def queries: Seq[Query] = RetailQueries.defs.map { case (name, desc, sql) =>
    new Query(name, spark.sql(sql), desc, Some(sql), ExecutionMode.HashResults)
  }
}
