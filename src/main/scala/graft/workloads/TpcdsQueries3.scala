package graft.workloads

/** TPC-DS v1.4 query catalog, part 3: q67–q99 + qSsMax.
  * See TpcdsQueries1 for transcription/adaptation conventions. */
object TpcdsQueries3 {

  val defs: Seq[(String, String)] = Seq(

    ("q67",
      """SELECT * FROM (
        |  SELECT i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_id,
        |    sumsales,
        |    rank() OVER (PARTITION BY i_category
        |      ORDER BY sumsales DESC, i_class ASC NULLS FIRST, i_brand ASC NULLS FIRST,
        |        i_item_id ASC NULLS FIRST, d_year ASC NULLS FIRST, d_qoy ASC NULLS FIRST,
        |        d_moy ASC NULLS FIRST, s_store_id ASC NULLS FIRST) AS rk
        |  FROM (
        |    SELECT i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_id,
        |      CAST(sum(coalesce(ss_sales_price * ss_quantity, 0)) * 100 AS BIGINT) AS sumsales
        |    FROM store_sales
        |    JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    JOIN store ON ss_store_sk = s_store_sk
        |    JOIN item ON ss_item_sk = i_item_sk
        |    WHERE d_month_seq BETWEEN 1452 AND 1463
        |    GROUP BY ROLLUP (i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
        |WHERE rk <= 100
        |ORDER BY i_category ASC NULLS FIRST, rk
        |LIMIT 100""".stripMargin),

    ("q68",
      """SELECT c_last_name, c_first_name, current_addr.ca_city AS home_city, bought_city,
        |  ss_ticket_number, extended_price_cents, list_price_cents, coupon_cents
        |FROM (
        |  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
        |    CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS extended_price_cents,
        |    CAST(sum(ss_ext_list_price) * 100 AS BIGINT) AS list_price_cents,
        |    CAST(sum(ss_coupon_amt) * 100 AS BIGINT) AS coupon_cents
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |  JOIN customer_address ON ss_addr_sk = ca_address_sk
        |  WHERE d_dom BETWEEN 1 AND 2
        |    AND (hd_dep_count = 4 OR hd_vehicle_count = 3)
        |    AND d_year IN (2020, 2021, 2022)
        |    AND s_city IN ('city_1', 'city_2')
        |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |JOIN customer_address current_addr ON c_address_sk = current_addr.ca_address_sk
        |WHERE current_addr.ca_city <> bought_city
        |ORDER BY c_last_name, c_first_name, home_city, bought_city, ss_ticket_number
        |LIMIT 100""".stripMargin),

    ("q69",
      """SELECT cd_gender, cd_marital_status, cd_education_status, count(*) AS cnt1,
        |  cd_purchase_estimate, count(*) AS cnt2, cd_credit_rating, count(*) AS cnt3
        |FROM customer_dim c
        |JOIN customer_address ca ON c.c_address_sk = ca.ca_address_sk
        |JOIN customer_demographics ON cd_demo_sk = c.c_cdemo_sk
        |WHERE ca_state IN ('state_1', 'state_4', 'state_8')
        |  AND EXISTS (
        |    SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE c.c_customer_sk = ss_customer_sk AND d_year = 2021 AND d_moy BETWEEN 1 AND 3)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |    WHERE c.c_customer_sk = ws_customer_sk AND d_year = 2021 AND d_moy BETWEEN 1 AND 3)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |    WHERE c.c_customer_sk = cs_customer_sk AND d_year = 2021 AND d_moy BETWEEN 1 AND 3)
        |GROUP BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate, cd_credit_rating
        |ORDER BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate, cd_credit_rating
        |LIMIT 100""".stripMargin),

    ("q70",
      """SELECT CAST(sum(ss_net_profit) * 100 AS BIGINT) AS total_sum_cents, s_state, s_county,
        |  CAST(grouping(s_state) + grouping(s_county) AS INT) AS lochierarchy,
        |  rank() OVER (
        |    PARTITION BY grouping(s_state) + grouping(s_county),
        |      CASE WHEN grouping(s_county) = 1 THEN s_state END
        |    ORDER BY sum(ss_net_profit) DESC, s_state, s_county) AS rank_within_parent
        |FROM store_sales
        |JOIN date_dim d1 ON d1.d_date_sk = ss_sold_date_sk
        |JOIN store ON s_store_sk = ss_store_sk
        |WHERE d1.d_month_seq BETWEEN 1452 AND 1463
        |  AND s_state IN (
        |    SELECT s_state FROM (
        |      SELECT s_state, rank() OVER (PARTITION BY s_state
        |        ORDER BY sum(ss_net_profit) DESC, s_county) AS ranking
        |      FROM store_sales
        |      JOIN store ON s_store_sk = ss_store_sk
        |      JOIN date_dim ON d_date_sk = ss_sold_date_sk
        |      WHERE d_month_seq BETWEEN 1452 AND 1463
        |      GROUP BY s_state, s_county) tmp1
        |    WHERE ranking <= 5)
        |GROUP BY ROLLUP (s_state, s_county)
        |ORDER BY lochierarchy DESC,
        |  CASE WHEN lochierarchy = 0 THEN s_state END ASC NULLS FIRST,
        |  rank_within_parent
        |LIMIT 100""".stripMargin),

    ("q71",
      """SELECT i_brand, t_hour, t_minute,
        |  CAST(sum(ext_price) * 100 AS BIGINT) AS ext_price_cents
        |FROM (
        |  SELECT ws_ext_sales_price AS ext_price, ws_sold_date_sk AS sold_date_sk,
        |    ws_item_sk AS sold_item_sk, ws_sold_time_sk AS time_sk FROM web_sales
        |  UNION ALL
        |  SELECT cs_ext_sales_price, cs_sold_date_sk, cs_item_sk, cs_sold_time_sk FROM catalog_sales
        |  UNION ALL
        |  SELECT ss_ext_sales_price, ss_sold_date_sk, ss_item_sk, ss_sold_time_sk FROM store_sales) tmp
        |JOIN date_dim ON d_date_sk = sold_date_sk AND d_moy = 11 AND d_year = 2021
        |JOIN item ON sold_item_sk = i_item_sk AND i_manager_id = 1
        |JOIN time_dim ON t_time_sk = time_sk
        |  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
        |GROUP BY i_brand, t_hour, t_minute
        |ORDER BY ext_price_cents DESC, i_brand, t_hour, t_minute""".stripMargin),

    ("q72",
      """SELECT i_item_desc, w_warehouse_name, d1.d_week_seq,
        |  count(CASE WHEN p_promo_sk IS NULL THEN 1 END) AS no_promo,
        |  count(CASE WHEN p_promo_sk IS NOT NULL THEN 1 END) AS promo,
        |  count(*) AS total_cnt
        |FROM catalog_sales
        |JOIN inventory ON cs_item_sk = inv_item_sk
        |JOIN warehouse ON w_warehouse_sk = inv_warehouse_sk
        |JOIN item ON i_item_sk = cs_item_sk
        |JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
        |JOIN household_demographics ON cs_bill_hdemo_sk = hd_demo_sk
        |JOIN date_dim d1 ON cs_sold_date_sk = d1.d_date_sk
        |JOIN date_dim d2 ON inv_date_sk = d2.d_date_sk AND d1.d_week_seq = d2.d_week_seq
        |JOIN date_dim d3 ON cs_ship_date_sk = d3.d_date_sk AND d3.d_date_sk > d1.d_date_sk + 5
        |LEFT JOIN promotion ON cs_promo_sk = p_promo_sk AND p_channel_email = 'Y'
        |WHERE d1.d_year = 2021
        |  AND inv_quantity_on_hand < cs_quantity * 5
        |  AND hd_buy_potential = '>10000'
        |  AND cd_marital_status = 'D'
        |GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
        |ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq
        |LIMIT 100""".stripMargin),

    ("q73",
      """SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
        |  ss_ticket_number, cnt
        |FROM (
        |  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |  WHERE d_dom BETWEEN 1 AND 2
        |    AND (hd_buy_potential = '>10000' OR hd_buy_potential = 'Unknown')
        |    AND hd_vehicle_count > 0
        |    AND CASE WHEN hd_vehicle_count > 0 THEN hd_dep_count / hd_vehicle_count ELSE NULL END > 1
        |    AND d_year IN (2020, 2021, 2022)
        |    AND s_county IN ('county_5', 'county_6', 'county_7', 'county_8')
        |  GROUP BY ss_ticket_number, ss_customer_sk) dj
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |WHERE cnt BETWEEN 1 AND 5
        |ORDER BY cnt DESC, c_last_name ASC, c_first_name, c_salutation, ss_ticket_number
        |LIMIT 1000""".stripMargin),

    ("q74",
      """WITH year_total AS (
        |  SELECT c_customer_id AS customer_id, c_first_name, c_last_name, d_year AS year_,
        |    sum(ss_net_paid) AS year_total, 's' AS sale_type
        |  FROM customer_dim
        |  JOIN store_sales ON c_customer_sk = ss_customer_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year IN (2021, 2022)
        |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
        |  UNION ALL
        |  SELECT c_customer_id, c_first_name, c_last_name, d_year,
        |    sum(ws_net_paid), 'w'
        |  FROM customer_dim
        |  JOIN web_sales ON c_customer_sk = ws_customer_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year IN (2021, 2022)
        |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
        |SELECT t_s_secyear.customer_id, t_s_secyear.c_first_name, t_s_secyear.c_last_name
        |FROM year_total t_s_firstyear, year_total t_s_secyear,
        |     year_total t_w_firstyear, year_total t_w_secyear
        |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
        |  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
        |  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
        |  AND t_s_firstyear.year_ = 2021 AND t_s_secyear.year_ = 2022
        |  AND t_w_firstyear.year_ = 2021 AND t_w_secyear.year_ = 2022
        |  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
        |  AND t_w_secyear.year_total / t_w_firstyear.year_total
        |      > t_s_secyear.year_total / t_s_firstyear.year_total
        |ORDER BY t_s_secyear.customer_id, t_s_secyear.c_first_name, t_s_secyear.c_last_name
        |LIMIT 100""".stripMargin),

    ("q75",
      """WITH all_sales AS (
        |  SELECT d_year, i_brand, i_class, i_category, i_manufact_id,
        |    sum(sales_cnt) AS sales_cnt, sum(sales_amt) AS sales_amt
        |  FROM (
        |    SELECT d_year, i_brand, i_class, i_category, i_manufact_id,
        |      cs_quantity - coalesce(cr_return_quantity, 0) AS sales_cnt,
        |      cs_ext_sales_price - coalesce(cr_return_amt, 0) AS sales_amt
        |    FROM catalog_sales
        |    JOIN item ON i_item_sk = cs_item_sk
        |    JOIN date_dim ON d_date_sk = cs_sold_date_sk
        |    LEFT JOIN catalog_returns ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
        |    WHERE i_category = 'cat_4'
        |    UNION
        |    SELECT d_year, i_brand, i_class, i_category, i_manufact_id,
        |      ss_quantity - coalesce(sr_return_quantity, 0),
        |      ss_ext_sales_price - coalesce(sr_return_amt, 0)
        |    FROM store_sales
        |    JOIN item ON i_item_sk = ss_item_sk
        |    JOIN date_dim ON d_date_sk = ss_sold_date_sk
        |    LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
        |    WHERE i_category = 'cat_4'
        |    UNION
        |    SELECT d_year, i_brand, i_class, i_category, i_manufact_id,
        |      ws_quantity - coalesce(wr_return_quantity, 0),
        |      ws_ext_sales_price - coalesce(wr_return_amt, 0)
        |    FROM web_sales
        |    JOIN item ON i_item_sk = ws_item_sk
        |    JOIN date_dim ON d_date_sk = ws_sold_date_sk
        |    LEFT JOIN web_returns ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
        |    WHERE i_category = 'cat_4') sales_detail
        |  GROUP BY d_year, i_brand, i_class, i_category, i_manufact_id)
        |SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS curr_year,
        |  curr_yr.i_brand, curr_yr.i_class, curr_yr.i_category, curr_yr.i_manufact_id,
        |  CAST(prev_yr.sales_cnt AS BIGINT) AS prev_yr_cnt,
        |  CAST(curr_yr.sales_cnt AS BIGINT) AS curr_yr_cnt,
        |  CAST(curr_yr.sales_cnt - prev_yr.sales_cnt AS BIGINT) AS sales_cnt_diff,
        |  CAST((curr_yr.sales_amt - prev_yr.sales_amt) * 100 AS BIGINT) AS sales_amt_diff_cents
        |FROM all_sales curr_yr, all_sales prev_yr
        |WHERE curr_yr.i_brand = prev_yr.i_brand
        |  AND curr_yr.i_class = prev_yr.i_class
        |  AND curr_yr.i_category = prev_yr.i_category
        |  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
        |  AND curr_yr.d_year = 2022 AND prev_yr.d_year = 2021
        |  AND CAST(curr_yr.sales_cnt AS DOUBLE) / prev_yr.sales_cnt < 1.2
        |ORDER BY sales_cnt_diff, curr_yr.i_brand, curr_yr.i_class,
        |  curr_yr.i_category, curr_yr.i_manufact_id
        |LIMIT 100""".stripMargin),

    ("q76",
      """SELECT channel, col_name, d_year, d_qoy, i_category,
        |  count(*) AS sales_cnt, CAST(sum(ext_sales_price) * 100 AS BIGINT) AS sales_amt_cents
        |FROM (
        |  SELECT 'store' AS channel, 'ss_cdemo_sk' AS col_name, d_year, d_qoy, i_category,
        |    ss_ext_sales_price AS ext_sales_price
        |  FROM store_sales
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE ss_cdemo_sk % 97 = 0
        |  UNION ALL
        |  SELECT 'web', 'ws_ship_customer_sk', d_year, d_qoy, i_category, ws_ext_sales_price
        |  FROM web_sales
        |  JOIN item ON ws_item_sk = i_item_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE ws_ship_customer_sk % 97 = 0
        |  UNION ALL
        |  SELECT 'catalog', 'cs_bill_hdemo_sk', d_year, d_qoy, i_category, cs_ext_sales_price
        |  FROM catalog_sales
        |  JOIN item ON cs_item_sk = i_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE cs_bill_hdemo_sk % 97 = 0) foo
        |GROUP BY channel, col_name, d_year, d_qoy, i_category
        |ORDER BY channel, col_name, d_year, d_qoy, i_category
        |LIMIT 100""".stripMargin),

    ("q77",
      """WITH ss AS (
        |  SELECT s_store_sk, sum(ss_ext_sales_price) AS sales, sum(ss_net_profit) AS profit
        |  FROM store_sales
        |  JOIN date_dim ON d_date_sk = ss_sold_date_sk
        |  JOIN store ON s_store_sk = ss_store_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430
        |  GROUP BY s_store_sk),
        |sr AS (
        |  SELECT s_store_sk, sum(sr_return_amt) AS returns_amt, sum(sr_net_loss) AS profit_loss
        |  FROM store_returns
        |  JOIN date_dim ON d_date_sk = sr_returned_date_sk
        |  JOIN store ON s_store_sk = sr_store_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430
        |  GROUP BY s_store_sk),
        |cs AS (
        |  SELECT cs_call_center_sk, sum(cs_ext_sales_price) AS sales, sum(cs_net_profit) AS profit
        |  FROM catalog_sales
        |  JOIN date_dim ON d_date_sk = cs_sold_date_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430
        |  GROUP BY cs_call_center_sk),
        |cr AS (
        |  SELECT sum(cr_return_amt) AS returns_amt, sum(cr_net_loss) AS profit_loss
        |  FROM catalog_returns
        |  JOIN date_dim ON d_date_sk = cr_returned_date_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430),
        |ws AS (
        |  SELECT wp_web_page_sk, sum(ws_ext_sales_price) AS sales, sum(ws_net_profit) AS profit
        |  FROM web_sales
        |  JOIN date_dim ON d_date_sk = ws_sold_date_sk
        |  JOIN web_page ON wp_web_page_sk = ws_web_page_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430
        |  GROUP BY wp_web_page_sk),
        |wr AS (
        |  SELECT wp_web_page_sk, sum(wr_return_amt) AS returns_amt, sum(wr_net_loss) AS profit_loss
        |  FROM web_returns
        |  JOIN date_dim ON d_date_sk = wr_returned_date_sk
        |  JOIN web_sales ON wr_sale_id = ws_id
        |  JOIN web_page ON wp_web_page_sk = ws_web_page_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430
        |  GROUP BY wp_web_page_sk)
        |SELECT channel, id,
        |  CAST(sum(sales) * 100 AS BIGINT) AS sales_cents,
        |  CAST(sum(returns_amt) * 100 AS BIGINT) AS returns_cents,
        |  CAST(sum(profit) * 100 AS BIGINT) AS profit_cents
        |FROM (
        |  SELECT 'store channel' AS channel, ss.s_store_sk AS id, sales,
        |    coalesce(returns_amt, 0) AS returns_amt,
        |    profit - coalesce(profit_loss, 0) AS profit
        |  FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
        |  UNION ALL
        |  SELECT 'catalog channel', cs_call_center_sk, sales, returns_amt,
        |    profit - profit_loss
        |  FROM cs, cr
        |  UNION ALL
        |  SELECT 'web channel', ws.wp_web_page_sk, sales,
        |    coalesce(returns_amt, 0), profit - coalesce(profit_loss, 0)
        |  FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q78",
      """WITH ws AS (
        |  SELECT d_year AS ws_sold_year, ws_item_sk, ws_customer_sk,
        |    sum(ws_quantity) AS ws_qty, sum(ws_wholesale_cost) AS ws_wc,
        |    sum(ws_sales_price) AS ws_sp
        |  FROM web_sales
        |  LEFT JOIN web_returns ON wr_order_number = ws_order_number AND ws_item_sk = wr_item_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE wr_order_number IS NULL
        |  GROUP BY d_year, ws_item_sk, ws_customer_sk),
        |cs AS (
        |  SELECT d_year AS cs_sold_year, cs_item_sk, cs_customer_sk,
        |    sum(cs_quantity) AS cs_qty, sum(cs_wholesale_cost) AS cs_wc,
        |    sum(cs_sales_price) AS cs_sp
        |  FROM catalog_sales
        |  LEFT JOIN catalog_returns ON cr_order_number = cs_order_number AND cs_item_sk = cr_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE cr_order_number IS NULL
        |  GROUP BY d_year, cs_item_sk, cs_customer_sk),
        |ss AS (
        |  SELECT d_year AS ss_sold_year, ss_item_sk, ss_customer_sk,
        |    sum(ss_quantity) AS ss_qty, sum(ss_wholesale_cost) AS ss_wc,
        |    sum(ss_sales_price) AS ss_sp
        |  FROM store_sales
        |  LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number AND ss_item_sk = sr_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE sr_ticket_number IS NULL
        |  GROUP BY d_year, ss_item_sk, ss_customer_sk)
        |SELECT ss_item_sk, ss_customer_sk,
        |  round(CAST(ss_qty AS DOUBLE) / (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)), 2) AS ratio,
        |  CAST(ss_qty AS BIGINT) AS store_qty,
        |  CAST(ss_wc * 100 AS BIGINT) AS store_wholesale_cost_cents,
        |  CAST(ss_sp * 100 AS BIGINT) AS store_sales_price_cents,
        |  CAST(coalesce(ws_qty, 0) + coalesce(cs_qty, 0) AS BIGINT) AS other_chan_qty,
        |  CAST((coalesce(ws_wc, 0) + coalesce(cs_wc, 0)) * 100 AS BIGINT) AS other_chan_wholesale_cost_cents,
        |  CAST((coalesce(ws_sp, 0) + coalesce(cs_sp, 0)) * 100 AS BIGINT) AS other_chan_sales_price_cents
        |FROM ss
        |LEFT JOIN ws ON ws_sold_year = ss_sold_year
        |  AND ws_item_sk = ss_item_sk AND ws_customer_sk = ss_customer_sk
        |LEFT JOIN cs ON cs_sold_year = ss_sold_year
        |  AND cs_item_sk = ss_item_sk AND cs_customer_sk = ss_customer_sk
        |WHERE (coalesce(ws_qty, 0) > 0 OR coalesce(cs_qty, 0) > 0) AND ss_sold_year = 2021
        |ORDER BY ss_item_sk, ss_customer_sk, store_qty DESC,
        |  store_wholesale_cost_cents DESC, store_sales_price_cents DESC
        |LIMIT 100""".stripMargin),

    ("q79",
      """SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city30,
        |  ss_ticket_number, amt_cents, profit_cents
        |FROM (
        |  SELECT ss_ticket_number, ss_customer_sk, s_city,
        |    CAST(sum(ss_coupon_amt) * 100 AS BIGINT) AS amt_cents,
        |    CAST(sum(ss_net_profit) * 100 AS BIGINT) AS profit_cents
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |  WHERE (hd_dep_count = 6 OR hd_vehicle_count > 2)
        |    AND d_dow = 1 AND d_year = 2021
        |    AND s_number_employees BETWEEN 200 AND 295
        |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, s_city) ms
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |ORDER BY c_last_name, c_first_name, city30, profit_cents, ss_ticket_number
        |LIMIT 100""".stripMargin),

    ("q80",
      """WITH ssr AS (
        |  SELECT s_store_id,
        |    sum(ss_ext_sales_price) AS sales,
        |    sum(coalesce(sr_return_amt, 0)) AS returns_amt,
        |    sum(ss_net_profit - coalesce(sr_net_loss, 0)) AS profit
        |  FROM store_sales
        |  LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN promotion ON ss_promo_sk = p_promo_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430 AND i_current_price > 50 AND p_channel_tv = 'N'
        |  GROUP BY s_store_id),
        |csr AS (
        |  SELECT cp_catalog_page_id,
        |    sum(cs_ext_sales_price) AS sales,
        |    sum(coalesce(cr_return_amt, 0)) AS returns_amt,
        |    sum(cs_net_profit - coalesce(cr_net_loss, 0)) AS profit
        |  FROM catalog_sales
        |  LEFT JOIN catalog_returns ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN catalog_page ON cs_catalog_page_sk = cp_catalog_page_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  JOIN promotion ON cs_promo_sk = p_promo_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430 AND i_current_price > 50 AND p_channel_tv = 'N'
        |  GROUP BY cp_catalog_page_id),
        |wsr AS (
        |  SELECT web_site_id,
        |    sum(ws_ext_sales_price) AS sales,
        |    sum(coalesce(wr_return_amt, 0)) AS returns_amt,
        |    sum(ws_net_profit - coalesce(wr_net_loss, 0)) AS profit
        |  FROM web_sales
        |  LEFT JOIN web_returns ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN web_site ON ws_web_site_sk = web_site_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  JOIN promotion ON ws_promo_sk = p_promo_sk
        |  WHERE d_date_sk BETWEEN 400 AND 430 AND i_current_price > 50 AND p_channel_tv = 'N'
        |  GROUP BY web_site_id)
        |SELECT channel, id,
        |  CAST(sum(sales) * 100 AS BIGINT) AS sales_cents,
        |  CAST(sum(returns_amt) * 100 AS BIGINT) AS returns_cents,
        |  CAST(sum(profit) * 100 AS BIGINT) AS profit_cents
        |FROM (
        |  SELECT 'store channel' AS channel, concat('store', s_store_id) AS id,
        |    sales, returns_amt, profit FROM ssr
        |  UNION ALL
        |  SELECT 'catalog channel', concat('catalog_page', cp_catalog_page_id),
        |    sales, returns_amt, profit FROM csr
        |  UNION ALL
        |  SELECT 'web channel', concat('web_site', web_site_id),
        |    sales, returns_amt, profit FROM wsr) x
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q81",
      """WITH customer_total_return AS (
        |  SELECT cr_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
        |    CAST(sum(cr_return_amt * 100) AS BIGINT) AS ctr_total_return_c
        |  FROM catalog_returns
        |  JOIN date_dim ON cr_returned_date_sk = d_date_sk
        |  JOIN customer_address ON cr_returning_addr_sk = ca_address_sk
        |  WHERE d_year = 2021
        |  GROUP BY cr_customer_sk, ca_state)
        |SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
        |  ca_street_or_city, ca_state_out, ca_zip_out,
        |  ctr_total_return_c AS return_cents
        |FROM customer_total_return ctr1
        |JOIN customer_dim ON ctr1.ctr_customer_sk = c_customer_sk
        |JOIN (SELECT ca_address_sk, ca_city AS ca_street_or_city, ca_state AS ca_state_out,
        |        ca_zip AS ca_zip_out FROM customer_address) addr
        |  ON c_address_sk = addr.ca_address_sk
        |WHERE ctr1.ctr_total_return_c * 10 * (
        |    SELECT count(*) FROM customer_total_return ctr2
        |    WHERE ctr1.ctr_state = ctr2.ctr_state) > (
        |    SELECT CAST(sum(ctr_total_return_c) AS BIGINT) * 12 FROM customer_total_return ctr3
        |    WHERE ctr1.ctr_state = ctr3.ctr_state)
        |ORDER BY c_customer_id, return_cents
        |LIMIT 100""".stripMargin),

    ("q82",
      """SELECT i_item_id, i_item_desc,
        |  CAST(CAST(i_current_price * 100 AS BIGINT) AS DOUBLE) / 100 AS i_current_price
        |FROM item
        |JOIN inventory ON inv_item_sk = i_item_sk
        |JOIN date_dim ON d_date_sk = inv_date_sk
        |JOIN store_sales ON ss_item_sk = i_item_sk
        |WHERE i_current_price BETWEEN 30 AND 60
        |  AND d_date_sk BETWEEN 400 AND 460
        |  AND i_manufact_id IN (15, 25, 35, 45)
        |  AND inv_quantity_on_hand BETWEEN 100 AND 500
        |GROUP BY i_item_id, i_item_desc, i_current_price
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    ("q83",
      """WITH sr_items AS (
        |  SELECT i_item_id AS item_id, sum(sr_return_quantity) AS sr_item_qty
        |  FROM store_returns
        |  JOIN item ON sr_item_sk = i_item_sk
        |  JOIN date_dim ON sr_returned_date_sk = d_date_sk
        |  WHERE d_week_seq BETWEEN 195 AND 202
        |  GROUP BY i_item_id),
        |cr_items AS (
        |  SELECT i_item_id AS item_id, sum(cr_return_quantity) AS cr_item_qty
        |  FROM catalog_returns
        |  JOIN item ON cr_item_sk = i_item_sk
        |  JOIN date_dim ON cr_returned_date_sk = d_date_sk
        |  WHERE d_week_seq BETWEEN 195 AND 202
        |  GROUP BY i_item_id),
        |wr_items AS (
        |  SELECT i_item_id AS item_id, sum(wr_return_quantity) AS wr_item_qty
        |  FROM web_returns
        |  JOIN item ON wr_item_sk = i_item_sk
        |  JOIN date_dim ON wr_returned_date_sk = d_date_sk
        |  WHERE d_week_seq BETWEEN 195 AND 202
        |  GROUP BY i_item_id)
        |SELECT sr_items.item_id,
        |  CAST(sr_item_qty AS BIGINT) AS sr_item_qty,
        |  round(CAST(sr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3 * 100, 4) AS sr_dev,
        |  CAST(cr_item_qty AS BIGINT) AS cr_item_qty,
        |  round(CAST(cr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3 * 100, 4) AS cr_dev,
        |  CAST(wr_item_qty AS BIGINT) AS wr_item_qty,
        |  round(CAST(wr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3 * 100, 4) AS wr_dev,
        |  round(CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3, 4) AS average
        |FROM sr_items
        |JOIN cr_items ON sr_items.item_id = cr_items.item_id
        |JOIN wr_items ON sr_items.item_id = wr_items.item_id
        |ORDER BY sr_items.item_id, sr_item_qty
        |LIMIT 100""".stripMargin),

    ("q84",
      """SELECT c_customer_id AS customer_id,
        |  concat(coalesce(c_last_name, ''), ', ', coalesce(c_first_name, '')) AS customername
        |FROM customer_dim
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN customer_demographics ON c_cdemo_sk = cd_demo_sk
        |JOIN household_demographics ON c_hdemo_sk = hd_demo_sk
        |JOIN income_band ON hd_income_band_sk = ib_income_band_sk
        |JOIN store_returns ON sr_customer_sk = c_customer_sk
        |WHERE ca_city = 'city_5'
        |  AND ib_lower_bound >= 30000 AND ib_upper_bound <= 70000
        |ORDER BY customer_id
        |LIMIT 100""".stripMargin),

    ("q85",
      """SELECT substr(r_reason_desc, 1, 20) AS reason20,
        |  avg(ws_quantity) AS avg_qty,
        |  CAST(CAST(sum(wr_return_amt * 100) AS BIGINT) AS DOUBLE) / count(wr_return_amt) / 100 AS avg_return_amt,
        |  CAST(CAST(sum(wr_net_loss * 100) AS BIGINT) AS DOUBLE) / count(wr_net_loss) / 100 AS avg_net_loss
        |FROM web_sales
        |JOIN web_returns ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
        |JOIN web_page ON ws_web_page_sk = wp_web_page_sk
        |JOIN reason ON wr_reason_sk = r_reason_sk
        |JOIN customer_dim ON wr_customer_sk = c_customer_sk
        |JOIN customer_demographics ON c_cdemo_sk = cd_demo_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |WHERE d_year = 2021
        |  AND ((cd_marital_status = 'M' AND cd_education_status = '4 yr Degree'
        |        AND ws_sales_price BETWEEN 100 AND 150)
        |    OR (cd_marital_status = 'S' AND cd_education_status = 'College'
        |        AND ws_sales_price BETWEEN 50 AND 100)
        |    OR (cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
        |        AND ws_sales_price BETWEEN 150 AND 200))
        |  AND ((ca_country = 'United States'
        |        AND ca_state IN ('state_0', 'state_1', 'state_2')
        |        AND ws_net_profit BETWEEN 0 AND 2000)
        |    OR (ca_country = 'United States'
        |        AND ca_state IN ('state_3', 'state_4', 'state_5')
        |        AND ws_net_profit BETWEEN 50 AND 3000)
        |    OR (ca_country = 'United States'
        |        AND ca_state IN ('state_6', 'state_7', 'state_8')
        |        AND ws_net_profit BETWEEN 50 AND 25000))
        |GROUP BY r_reason_desc
        |ORDER BY reason20, avg_qty, avg_return_amt, avg_net_loss
        |LIMIT 100""".stripMargin),

    ("q86",
      """SELECT CAST(sum(ws_net_paid) * 100 AS BIGINT) AS total_sum_cents, i_category, i_class,
        |  CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
        |  rank() OVER (
        |    PARTITION BY grouping(i_category) + grouping(i_class),
        |      CASE WHEN grouping(i_class) = 1 THEN i_category END
        |    ORDER BY sum(ws_net_paid) DESC, i_category, i_class) AS rank_within_parent
        |FROM web_sales
        |JOIN date_dim d1 ON d1.d_date_sk = ws_sold_date_sk
        |JOIN item ON i_item_sk = ws_item_sk
        |WHERE d1.d_month_seq BETWEEN 1452 AND 1463
        |GROUP BY ROLLUP (i_category, i_class)
        |ORDER BY lochierarchy DESC,
        |  CASE WHEN lochierarchy = 0 THEN i_category END ASC NULLS FIRST,
        |  rank_within_parent
        |LIMIT 100""".stripMargin),

    ("q87",
      """SELECT count(*) AS cnt FROM (
        |  (SELECT DISTINCT c_last_name, c_first_name, d_date
        |   FROM store_sales
        |   JOIN date_dim ON store_sales.ss_sold_date_sk = d_date_sk
        |   JOIN customer_dim ON store_sales.ss_customer_sk = c_customer_sk
        |   WHERE d_month_seq BETWEEN 1452 AND 1463)
        |  EXCEPT
        |  (SELECT DISTINCT c_last_name, c_first_name, d_date
        |   FROM catalog_sales
        |   JOIN date_dim ON catalog_sales.cs_sold_date_sk = d_date_sk
        |   JOIN customer_dim ON catalog_sales.cs_customer_sk = c_customer_sk
        |   WHERE d_month_seq BETWEEN 1452 AND 1463)
        |  EXCEPT
        |  (SELECT DISTINCT c_last_name, c_first_name, d_date
        |   FROM web_sales
        |   JOIN date_dim ON web_sales.ws_sold_date_sk = d_date_sk
        |   JOIN customer_dim ON web_sales.ws_customer_sk = c_customer_sk
        |   WHERE d_month_seq BETWEEN 1452 AND 1463)) cool_cust""".stripMargin),

    ("q88",
      """SELECT * FROM
        |  (SELECT count(*) AS h8_30_to_9 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 8 AND t_minute >= 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s1,
        |  (SELECT count(*) AS h9_to_9_30 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 9 AND t_minute < 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s2,
        |  (SELECT count(*) AS h9_30_to_10 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 9 AND t_minute >= 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s3,
        |  (SELECT count(*) AS h10_to_10_30 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 10 AND t_minute < 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s4,
        |  (SELECT count(*) AS h10_30_to_11 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 10 AND t_minute >= 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s5,
        |  (SELECT count(*) AS h11_to_11_30 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 11 AND t_minute < 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s6,
        |  (SELECT count(*) AS h11_30_to_12 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 11 AND t_minute >= 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s7,
        |  (SELECT count(*) AS h12_to_12_30 FROM store_sales
        |   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |   JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |   JOIN store ON ss_store_sk = s_store_sk
        |   WHERE t_hour = 12 AND t_minute < 30
        |     AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
        |       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
        |       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
        |     AND s_store_name = 'Store 7') s8""".stripMargin),

    ("q89",
      """SELECT * FROM (
        |  SELECT i_category, i_class, i_brand, s_store_name, s_store_id, d_moy,
        |    CAST(sum(ss_sales_price) * 100 AS BIGINT) AS sum_sales_cents,
        |    CAST(CAST(sum(sum(ss_sales_price) * 100) OVER (
        |        PARTITION BY i_category, i_brand, s_store_name, s_store_id) AS BIGINT) AS DOUBLE)
        |      / count(*) OVER (
        |        PARTITION BY i_category, i_brand, s_store_name, s_store_id) AS avg_monthly_cents
        |  FROM item
        |  JOIN store_sales ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  WHERE d_year = 2021
        |    AND ((i_category IN ('cat_1', 'cat_2', 'cat_3') AND i_class IN ('class_1', 'class_2'))
        |      OR (i_category IN ('cat_4', 'cat_5') AND i_class IN ('class_3', 'class_4')))
        |  GROUP BY i_category, i_class, i_brand, s_store_name, s_store_id, d_moy) tmp1
        |WHERE avg_monthly_cents <> 0
        |  AND abs(sum_sales_cents - avg_monthly_cents) * 10 > avg_monthly_cents
        |ORDER BY sum_sales_cents - avg_monthly_cents, s_store_name, i_category,
        |  i_class, i_brand, d_moy
        |LIMIT 100""".stripMargin),

    ("q90",
      """SELECT CASE WHEN pmc > 0
        |    THEN CAST(amc AS DOUBLE) / pmc END AS am_pm_ratio
        |FROM (
        |  SELECT count(*) AS amc FROM web_sales
        |  JOIN household_demographics ON ws_bill_hdemo_sk = hd_demo_sk
        |  JOIN time_dim ON ws_sold_time_sk = t_time_sk
        |  JOIN web_page ON ws_web_page_sk = wp_web_page_sk
        |  WHERE t_hour BETWEEN 8 AND 9 AND hd_dep_count = 6
        |    AND wp_char_count BETWEEN 5000 AND 5200) at_c,
        |  (
        |  SELECT count(*) AS pmc FROM web_sales
        |  JOIN household_demographics ON ws_bill_hdemo_sk = hd_demo_sk
        |  JOIN time_dim ON ws_sold_time_sk = t_time_sk
        |  JOIN web_page ON ws_web_page_sk = wp_web_page_sk
        |  WHERE t_hour BETWEEN 19 AND 20 AND hd_dep_count = 6
        |    AND wp_char_count BETWEEN 5000 AND 5200) pt_c
        |ORDER BY am_pm_ratio
        |LIMIT 100""".stripMargin),

    ("q91",
      """SELECT cc_call_center_id, cc_name, cc_manager, cd_marital_status, cd_education_status,
        |  CAST(sum(cr_net_loss) * 100 AS BIGINT) AS returns_loss_cents
        |FROM catalog_returns
        |JOIN catalog_sales ON cr_sale_id = cs_id
        |JOIN call_center ON cs_call_center_sk = cc_call_center_sk
        |JOIN date_dim ON cr_returned_date_sk = d_date_sk
        |JOIN customer_dim ON cr_customer_sk = c_customer_sk
        |JOIN customer_demographics ON c_cdemo_sk = cd_demo_sk
        |JOIN household_demographics ON c_hdemo_sk = hd_demo_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |WHERE d_year = 2021
        |  AND ((cd_marital_status = 'M' AND cd_education_status = 'Unknown')
        |    OR (cd_marital_status = 'W' AND cd_education_status = 'Advanced Degree'))
        |  AND hd_buy_potential LIKE '>10000%'
        |  AND ca_gmt_offset = -7
        |GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status, cd_education_status
        |ORDER BY returns_loss_cents DESC, cc_call_center_id, cd_marital_status, cd_education_status
        |LIMIT 100""".stripMargin),

    ("q92",
      """SELECT CAST(sum(ws_ext_discount_amt) * 100 AS BIGINT) AS excess_discount_cents
        |FROM web_sales
        |JOIN item ON i_item_sk = ws_item_sk
        |JOIN date_dim ON d_date_sk = ws_sold_date_sk
        |WHERE i_manufact_id = 35
        |  AND d_date_sk BETWEEN 400 AND 490
        |  AND ws_ext_discount_amt > (
        |    SELECT 1.3 * CAST(CAST(sum(ws_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(ws_ext_discount_amt) / 100
        |    FROM web_sales ws2
        |    JOIN date_dim d2 ON d2.d_date_sk = ws2.ws_sold_date_sk
        |    WHERE ws2.ws_item_sk = i_item_sk AND d2.d_date_sk BETWEEN 400 AND 490)
        |ORDER BY excess_discount_cents
        |LIMIT 100""".stripMargin),

    ("q93",
      """SELECT ss_customer_sk, CAST(sum(act_sales) * 100 AS BIGINT) AS sumsales_cents
        |FROM (
        |  SELECT ss_customer_sk,
        |    CASE WHEN sr_return_quantity IS NOT NULL
        |      THEN (ss_quantity - sr_return_quantity) * ss_sales_price
        |      ELSE ss_quantity * ss_sales_price END AS act_sales
        |  FROM store_sales
        |  LEFT JOIN store_returns ON sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number
        |  JOIN reason ON sr_reason_sk = r_reason_sk
        |  WHERE r_reason_desc = 'reason_7') t
        |GROUP BY ss_customer_sk
        |ORDER BY sumsales_cents, ss_customer_sk
        |LIMIT 100""".stripMargin),

    ("q94",
      """SELECT count(DISTINCT ws1.ws_order_number) AS order_count,
        |  CAST(sum(ws1.ws_ext_sales_price) * 100 AS BIGINT) AS total_sales_cents,
        |  CAST(sum(ws1.ws_net_profit) * 100 AS BIGINT) AS total_net_profit_cents
        |FROM web_sales ws1
        |JOIN date_dim ON ws1.ws_ship_date_sk = d_date_sk
        |JOIN customer_address ON ws1.ws_ship_addr_sk = ca_address_sk
        |JOIN web_site ON ws1.ws_web_site_sk = web_site_sk
        |WHERE d_date_sk BETWEEN 400 AND 460
        |  AND ca_state = 'state_2'
        |  AND web_company_name = 'pri'
        |  AND EXISTS (SELECT 1 FROM web_sales ws2
        |              WHERE ws1.ws_order_number = ws2.ws_order_number
        |                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
        |  AND NOT EXISTS (SELECT 1 FROM web_returns wr1
        |                  WHERE ws1.ws_order_number = wr1.wr_order_number)""".stripMargin),

    ("q95",
      """WITH ws_wh AS (
        |  SELECT ws1.ws_order_number AS wh_order_number
        |  FROM web_sales ws1, web_sales ws2
        |  WHERE ws1.ws_order_number = ws2.ws_order_number
        |    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
        |SELECT count(DISTINCT ws1.ws_order_number) AS order_count,
        |  CAST(sum(ws1.ws_ext_sales_price) * 100 AS BIGINT) AS total_sales_cents,
        |  CAST(sum(ws1.ws_net_profit) * 100 AS BIGINT) AS total_net_profit_cents
        |FROM web_sales ws1
        |JOIN date_dim ON ws1.ws_ship_date_sk = d_date_sk
        |JOIN customer_address ON ws1.ws_ship_addr_sk = ca_address_sk
        |JOIN web_site ON ws1.ws_web_site_sk = web_site_sk
        |WHERE d_date_sk BETWEEN 400 AND 460
        |  AND ca_state = 'state_2'
        |  AND web_company_name = 'pri'
        |  AND ws1.ws_order_number IN (SELECT wh_order_number FROM ws_wh)
        |  AND ws1.ws_order_number IN (
        |    SELECT wr_order_number FROM web_returns
        |    JOIN ws_wh ON wr_order_number = wh_order_number)""".stripMargin),

    ("q96",
      """SELECT count(*) AS cnt
        |FROM store_sales
        |JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |WHERE t_hour = 20 AND t_minute >= 30
        |  AND hd_dep_count = 7
        |  AND s_store_name = 'Store 11'
        |ORDER BY cnt
        |LIMIT 100""".stripMargin),

    ("q97",
      """WITH ssci AS (
        |  SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463
        |  GROUP BY ss_customer_sk, ss_item_sk),
        |csci AS (
        |  SELECT cs_customer_sk AS customer_sk, cs_item_sk AS item_sk
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463
        |  GROUP BY cs_customer_sk, cs_item_sk)
        |SELECT
        |  count(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL THEN 1 END) AS store_only,
        |  count(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL THEN 1 END) AS catalog_only,
        |  count(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL THEN 1 END) AS store_and_catalog
        |FROM ssci
        |FULL OUTER JOIN csci ON ssci.customer_sk = csci.customer_sk
        |  AND ssci.item_sk = csci.item_sk
        |LIMIT 100""".stripMargin),

    ("q98",
      """SELECT i_item_id, i_item_desc, i_category, i_class,
        |  CAST(i_current_price AS DOUBLE) AS i_current_price,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS itemrevenue_cents,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) * 10000
        |    / CAST(sum(sum(ss_ext_sales_price)) OVER (PARTITION BY i_class) * 100 AS BIGINT) AS revenueratio
        |FROM store_sales
        |JOIN item ON ss_item_sk = i_item_sk
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |WHERE i_category IN ('cat_1', 'cat_2', 'cat_3')
        |  AND d_date_sk BETWEEN 400 AND 429
        |GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
        |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio""".stripMargin),

    ("q99",
      """SELECT substr(w_warehouse_name, 1, 20) AS wh20, sm_type, cc_name,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk <= 30 THEN 1 END) AS d30,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk BETWEEN 31 AND 60 THEN 1 END) AS d60,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk BETWEEN 61 AND 90 THEN 1 END) AS d90,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk BETWEEN 91 AND 120 THEN 1 END) AS d120,
        |  count(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 120 THEN 1 END) AS d120plus
        |FROM catalog_sales
        |JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
        |JOIN call_center ON cs_call_center_sk = cc_call_center_sk
        |JOIN date_dim ON cs_ship_date_sk = d_date_sk
        |WHERE d_month_seq BETWEEN 1452 AND 1463
        |GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
        |ORDER BY wh20, sm_type, cc_name
        |LIMIT 100""".stripMargin),

    ("qSsMax",
      """SELECT count(*) AS total,
        |  count(ss_sold_date_sk) AS not_null_total,
        |  count(DISTINCT ss_sold_date_sk) AS unique_days,
        |  max(ss_sold_date_sk) AS max_ss_sold_date_sk,
        |  max(ss_sold_time_sk) AS max_ss_sold_time_sk,
        |  max(ss_item_sk) AS max_ss_item_sk,
        |  max(ss_customer_sk) AS max_ss_customer_sk,
        |  max(ss_cdemo_sk) AS max_ss_cdemo_sk,
        |  max(ss_hdemo_sk) AS max_ss_hdemo_sk,
        |  max(ss_addr_sk) AS max_ss_addr_sk,
        |  max(ss_store_sk) AS max_ss_store_sk,
        |  max(ss_promo_sk) AS max_ss_promo_sk
        |FROM store_sales""".stripMargin))
}
