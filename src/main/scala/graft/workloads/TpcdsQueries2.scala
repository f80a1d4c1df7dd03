package graft.workloads

/** TPC-DS v1.4 query catalog, part 2: q34–q66 (incl. q39a/b).
  * See TpcdsQueries1 for transcription/adaptation conventions. */
object TpcdsQueries2 {

  val defs: Seq[(String, String)] = Seq(

    ("q34",
      """SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
        |  ss_ticket_number, cnt
        |FROM (
        |  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |  WHERE (d_dom BETWEEN 1 AND 3 OR d_dom BETWEEN 25 AND 28)
        |    AND (hd_buy_potential = '>10000' OR hd_buy_potential = 'Unknown')
        |    AND hd_vehicle_count > 0
        |    AND CASE WHEN hd_vehicle_count > 0 THEN hd_dep_count / hd_vehicle_count ELSE NULL END > 1.2
        |    AND d_year IN (2020, 2021, 2022)
        |    AND s_county IN ('county_1', 'county_2', 'county_3', 'county_4')
        |  GROUP BY ss_ticket_number, ss_customer_sk) dn
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |WHERE cnt BETWEEN 2 AND 20
        |ORDER BY c_last_name, c_first_name, c_salutation, c_preferred_cust_flag DESC, ss_ticket_number
        |LIMIT 1000""".stripMargin),

    ("q35",
      """SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count, count(*) AS cnt1,
        |  min(cd_dep_count) AS min_dep, max(cd_dep_count) AS max_dep, avg(cd_dep_count) AS avg_dep,
        |  cd_dep_employed_count, count(*) AS cnt2,
        |  cd_dep_college_count, count(*) AS cnt3
        |FROM customer_dim c
        |JOIN customer_address ca ON c.c_address_sk = ca.ca_address_sk
        |JOIN customer_demographics ON cd_demo_sk = c.c_cdemo_sk
        |WHERE EXISTS (
        |    SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE c.c_customer_sk = ss_customer_sk AND d_year = 2021 AND d_qoy < 4)
        |  AND (EXISTS (
        |      SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |      WHERE c.c_customer_sk = ws_customer_sk AND d_year = 2021 AND d_qoy < 4)
        |    OR EXISTS (
        |      SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |      WHERE c.c_customer_sk = cs_customer_sk AND d_year = 2021 AND d_qoy < 4))
        |GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
        |  cd_dep_employed_count, cd_dep_college_count
        |ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
        |  cd_dep_employed_count, cd_dep_college_count
        |LIMIT 100""".stripMargin),

    ("q36",
      """SELECT CAST(CAST(sum(ss_net_profit * 100) AS BIGINT) * 10000 AS DOUBLE) / CAST(sum(ss_ext_sales_price * 100) AS BIGINT) AS gross_margin_bps,
        |  i_category, i_class,
        |  CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
        |  rank() OVER (
        |    PARTITION BY grouping(i_category) + grouping(i_class),
        |      CASE WHEN grouping(i_class) = 1 THEN i_category END
        |    ORDER BY CAST(CAST(sum(ss_net_profit * 100) AS BIGINT) * 10000 AS DOUBLE) / CAST(sum(ss_ext_sales_price * 100) AS BIGINT), i_category, i_class) AS rank_within_parent
        |FROM store_sales
        |JOIN date_dim d1 ON d1.d_date_sk = ss_sold_date_sk
        |JOIN item ON i_item_sk = ss_item_sk
        |JOIN store ON s_store_sk = ss_store_sk
        |WHERE d1.d_year = 2021
        |  AND s_state IN ('state_0', 'state_1', 'state_2', 'state_3',
        |    'state_4', 'state_5', 'state_6', 'state_7')
        |GROUP BY ROLLUP (i_category, i_class)
        |ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN i_category END ASC NULLS FIRST,
        |  rank_within_parent
        |LIMIT 100""".stripMargin),

    ("q37",
      """SELECT i_item_id, i_item_desc,
        |  CAST(CAST(i_current_price * 100 AS BIGINT) AS DOUBLE) / 100 AS i_current_price
        |FROM item
        |JOIN inventory ON inv_item_sk = i_item_sk
        |JOIN date_dim ON d_date_sk = inv_date_sk
        |JOIN catalog_sales ON cs_item_sk = i_item_sk
        |WHERE i_current_price BETWEEN 30 AND 60
        |  AND d_date_sk BETWEEN 400 AND 460
        |  AND i_manufact_id IN (10, 20, 30, 40)
        |  AND inv_quantity_on_hand BETWEEN 100 AND 500
        |GROUP BY i_item_id, i_item_desc, i_current_price
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    ("q38",
      """SELECT count(*) AS cnt FROM (
        |  SELECT DISTINCT c_last_name, c_first_name, d_date
        |  FROM store_sales
        |  JOIN date_dim ON store_sales.ss_sold_date_sk = d_date_sk
        |  JOIN customer_dim ON store_sales.ss_customer_sk = c_customer_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463
        |  INTERSECT
        |  SELECT DISTINCT c_last_name, c_first_name, d_date
        |  FROM catalog_sales
        |  JOIN date_dim ON catalog_sales.cs_sold_date_sk = d_date_sk
        |  JOIN customer_dim ON catalog_sales.cs_customer_sk = c_customer_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463
        |  INTERSECT
        |  SELECT DISTINCT c_last_name, c_first_name, d_date
        |  FROM web_sales
        |  JOIN date_dim ON web_sales.ws_sold_date_sk = d_date_sk
        |  JOIN customer_dim ON web_sales.ws_customer_sk = c_customer_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463) hot_cust
        |LIMIT 100""".stripMargin),

    ("q39a",
      """WITH inv AS (
        |  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy, stdev, mean,
        |    CASE mean WHEN 0 THEN NULL ELSE stdev / mean END AS cov
        |  FROM (
        |    SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
        |      round(stddev_samp(inv_quantity_on_hand), 6) AS stdev,
        |      avg(inv_quantity_on_hand) AS mean
        |    FROM inventory
        |    JOIN item ON inv_item_sk = i_item_sk
        |    JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
        |    JOIN date_dim ON inv_date_sk = d_date_sk
        |    WHERE d_year = 2021
        |    GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
        |  WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 1)
        |SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1, inv1.d_moy AS moy1,
        |  round(inv1.mean, 4) AS mean1, round(inv1.cov, 4) AS cov1,
        |  inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2, inv2.d_moy AS moy2,
        |  round(inv2.mean, 4) AS mean2, round(inv2.cov, 4) AS cov2
        |FROM inv inv1 JOIN inv inv2
        |  ON inv1.i_item_sk = inv2.i_item_sk AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
        |WHERE inv1.d_moy = 1 AND inv2.d_moy = 2
        |ORDER BY wsk1, isk1, moy1, mean1, cov1""".stripMargin),

    ("q39b",
      """WITH inv AS (
        |  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy, stdev, mean,
        |    CASE mean WHEN 0 THEN NULL ELSE stdev / mean END AS cov
        |  FROM (
        |    SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
        |      round(stddev_samp(inv_quantity_on_hand), 6) AS stdev,
        |      avg(inv_quantity_on_hand) AS mean
        |    FROM inventory
        |    JOIN item ON inv_item_sk = i_item_sk
        |    JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
        |    JOIN date_dim ON inv_date_sk = d_date_sk
        |    WHERE d_year = 2021
        |    GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
        |  WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 1)
        |SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1, inv1.d_moy AS moy1,
        |  round(inv1.mean, 4) AS mean1, round(inv1.cov, 4) AS cov1,
        |  inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2, inv2.d_moy AS moy2,
        |  round(inv2.mean, 4) AS mean2, round(inv2.cov, 4) AS cov2
        |FROM inv inv1 JOIN inv inv2
        |  ON inv1.i_item_sk = inv2.i_item_sk AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
        |WHERE inv1.d_moy = 1 AND inv2.d_moy = 2 AND inv1.cov > 1.5
        |ORDER BY wsk1, isk1, moy1, mean1, cov1""".stripMargin),

    ("q40",
      """SELECT w_state, i_item_id,
        |  CAST(sum(CASE WHEN d_date_sk < 430 THEN cs_sales_price - coalesce(cr_return_amt, 0) ELSE 0 END) * 100 AS BIGINT) AS sales_before_cents,
        |  CAST(sum(CASE WHEN d_date_sk >= 430 THEN cs_sales_price - coalesce(cr_return_amt, 0) ELSE 0 END) * 100 AS BIGINT) AS sales_after_cents
        |FROM catalog_sales
        |LEFT JOIN catalog_returns ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
        |JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |JOIN item ON cs_item_sk = i_item_sk
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |WHERE i_current_price BETWEEN 20 AND 70
        |  AND d_date_sk BETWEEN 400 AND 460
        |GROUP BY w_state, i_item_id
        |ORDER BY w_state, i_item_id
        |LIMIT 100""".stripMargin),

    ("q41",
      """SELECT DISTINCT i_item_desc
        |FROM item i1
        |WHERE i_manufact_id BETWEEN 70 AND 80
        |  AND (SELECT count(*) FROM item
        |       WHERE i_manufact_id = i1.i_manufact_id
        |         AND ((i_category = 'cat_1' AND i_color IN ('red', 'navy')
        |               AND i_units IN ('Each', 'Dozen'))
        |           OR (i_category = 'cat_2' AND i_color IN ('ivory', 'black')
        |               AND i_units IN ('Case', 'Oz'))
        |           OR (i_category = 'cat_3' AND i_color IN ('blue', 'white')
        |               AND i_units IN ('Lb', 'Pallet')))) > 0
        |ORDER BY i_item_desc
        |LIMIT 100""".stripMargin),

    ("q42",
      """SELECT d_year, i_category,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS sum_cents
        |FROM date_dim
        |JOIN store_sales ON d_date_sk = ss_sold_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |WHERE i_manager_id = 1 AND d_moy = 11 AND d_year = 2021
        |GROUP BY d_year, i_category
        |ORDER BY sum_cents DESC, d_year, i_category
        |LIMIT 100""".stripMargin),

    ("q43",
      """SELECT s_store_name, s_store_id,
        |  CAST(sum(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS sun_sales_cents,
        |  CAST(sum(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS mon_sales_cents,
        |  CAST(sum(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS tue_sales_cents,
        |  CAST(sum(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS wed_sales_cents,
        |  CAST(sum(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS thu_sales_cents,
        |  CAST(sum(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS fri_sales_cents,
        |  CAST(sum(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price ELSE NULL END) * 100 AS BIGINT) AS sat_sales_cents
        |FROM date_dim
        |JOIN store_sales ON d_date_sk = ss_sold_date_sk
        |JOIN store ON s_store_sk = ss_store_sk
        |WHERE s_gmt_offset = -5 AND d_year = 2021
        |GROUP BY s_store_name, s_store_id
        |ORDER BY s_store_name, s_store_id
        |LIMIT 100""".stripMargin),

    ("q44",
      """WITH v1 AS (
        |  SELECT ss_item_sk AS item_sk, CAST(CAST(sum(ss_net_profit * 100) AS BIGINT) AS DOUBLE) / count(ss_net_profit) / 100 AS rank_col
        |  FROM store_sales
        |  WHERE ss_store_sk = 4
        |  GROUP BY ss_item_sk),
        |v2 AS (
        |  SELECT item_sk,
        |    rank() OVER (ORDER BY rank_col ASC, item_sk) AS rnk_asc,
        |    rank() OVER (ORDER BY rank_col DESC, item_sk) AS rnk_desc
        |  FROM v1)
        |SELECT asceding.rnk_asc AS rnk, i1.i_item_desc AS best_performing,
        |  i2.i_item_desc AS worst_performing
        |FROM v2 asceding
        |JOIN v2 descending ON asceding.rnk_asc = descending.rnk_desc
        |JOIN item i1 ON i1.i_item_sk = descending.item_sk
        |JOIN item i2 ON i2.i_item_sk = asceding.item_sk
        |WHERE asceding.rnk_asc <= 10
        |ORDER BY rnk
        |LIMIT 10""".stripMargin),

    ("q45",
      """SELECT ca_zip, ca_city, CAST(sum(ws_ext_sales_price) * 100 AS BIGINT) AS sales_cents
        |FROM web_sales
        |JOIN customer_dim ON ws_customer_sk = c_customer_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |JOIN item ON ws_item_sk = i_item_sk
        |WHERE (substr(ca_zip, 1, 5) IN ('10025', '20345', '35672', '48933', '61420')
        |    OR i_item_id IN (SELECT i_item_id FROM item WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
        |  AND d_qoy = 2 AND d_year = 2021
        |GROUP BY ca_zip, ca_city
        |ORDER BY ca_zip, ca_city
        |LIMIT 100""".stripMargin),

    ("q46",
      """SELECT c_last_name, c_first_name, current_addr.ca_city AS home_city, bought_city,
        |  ss_ticket_number, amt_cents, profit_cents
        |FROM (
        |  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
        |    CAST(sum(ss_coupon_amt) * 100 AS BIGINT) AS amt_cents,
        |    CAST(sum(ss_net_profit) * 100 AS BIGINT) AS profit_cents
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |  JOIN customer_address ON ss_addr_sk = ca_address_sk
        |  WHERE (hd_dep_count = 4 OR hd_vehicle_count = 3)
        |    AND d_dow IN (1, 7) AND d_year = 2021
        |    AND s_city IN ('city_1', 'city_2', 'city_3', 'city_4', 'city_5')
        |  GROUP BY ss_ticket_number, ss_customer_sk, ca_city) dn
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |JOIN customer_address current_addr ON c_address_sk = current_addr.ca_address_sk
        |WHERE current_addr.ca_city <> bought_city
        |ORDER BY c_last_name, c_first_name, home_city, bought_city, ss_ticket_number
        |LIMIT 100""".stripMargin),

    ("q47",
      """WITH v1 AS (
        |  SELECT i_category, i_brand, s_store_name, d_year, d_moy,
        |    CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS sum_sales_cents,
        |    CAST(sum(sum(ss_ext_sales_price) * 100) OVER (
        |      PARTITION BY i_category, i_brand, s_store_name, d_year) AS BIGINT) AS wsum_cents,
        |    count(*) OVER (
        |      PARTITION BY i_category, i_brand, s_store_name, d_year) AS nmonths,
        |    rank() OVER (
        |      PARTITION BY i_category, i_brand, s_store_name
        |      ORDER BY d_year, d_moy) AS rn
        |  FROM item
        |  JOIN store_sales ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  WHERE d_year = 2021 OR (d_year = 2020 AND d_moy = 12) OR (d_year = 2022 AND d_moy = 1)
        |  GROUP BY i_category, i_brand, s_store_name, d_year, d_moy),
        |v2 AS (
        |  SELECT v1.i_category, v1.i_brand, v1.s_store_name, v1.d_year, v1.d_moy,
        |    v1.wsum_cents, v1.nmonths, v1.sum_sales_cents,
        |    v1_lag.sum_sales_cents AS psum_cents, v1_lead.sum_sales_cents AS nsum_cents
        |  FROM v1, v1 v1_lag, v1 v1_lead
        |  WHERE v1.i_category = v1_lag.i_category AND v1.i_category = v1_lead.i_category
        |    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
        |    AND v1.s_store_name = v1_lag.s_store_name AND v1.s_store_name = v1_lead.s_store_name
        |    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
        |SELECT i_category, i_brand, s_store_name, d_year, d_moy,
        |  sum_sales_cents, wsum_cents div nmonths AS avg_monthly_cents,
        |  psum_cents, nsum_cents
        |FROM v2
        |WHERE d_year = 2021 AND wsum_cents > 0
        |  AND abs(sum_sales_cents * nmonths - wsum_cents) * 10 > wsum_cents
        |ORDER BY CAST(sum_sales_cents AS DOUBLE) - CAST(wsum_cents AS DOUBLE) / nmonths,
        |  i_category, i_brand, s_store_name, d_moy
        |LIMIT 100""".stripMargin),

    ("q48",
      """SELECT CAST(sum(ss_quantity) AS BIGINT) AS total_quantity
        |FROM store_sales
        |JOIN store ON s_store_sk = ss_store_sk
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk AND d_year = 2021
        |JOIN customer_demographics ON cd_demo_sk = ss_cdemo_sk
        |JOIN customer_address ON ss_addr_sk = ca_address_sk
        |WHERE ca_country = 'United States'
        |  AND ((cd_marital_status = 'M' AND cd_education_status = '4 yr Degree'
        |        AND ss_sales_price BETWEEN 100 AND 150)
        |    OR (cd_marital_status = 'D' AND cd_education_status = '2 yr Degree'
        |        AND ss_sales_price BETWEEN 50 AND 100)
        |    OR (cd_marital_status = 'S' AND cd_education_status = 'College'
        |        AND ss_sales_price BETWEEN 150 AND 200))
        |  AND ((ca_state IN ('state_0', 'state_1', 'state_2') AND ss_net_profit BETWEEN 0 AND 2000)
        |    OR (ca_state IN ('state_3', 'state_4', 'state_5') AND ss_net_profit BETWEEN 150 AND 3000)
        |    OR (ca_state IN ('state_6', 'state_7', 'state_8') AND ss_net_profit BETWEEN 50 AND 25000))""".stripMargin),

    ("q49",
      """SELECT channel, item, return_ratio, return_rank, currency_rank FROM (
        |  SELECT 'web' AS channel, item, return_ratio, currency_ratio,
        |    rank() OVER (ORDER BY return_ratio, item) AS return_rank,
        |    rank() OVER (ORDER BY currency_ratio, item) AS currency_rank
        |  FROM (
        |    SELECT ws_item_sk AS item,
        |      CAST(sum(coalesce(wr_return_quantity, 0)) AS DOUBLE)
        |        / sum(coalesce(ws_quantity, 0)) AS return_ratio,
        |      CAST(CAST(sum(coalesce(wr_return_amt, 0) * 100) AS BIGINT) AS DOUBLE)
        |        / CAST(sum(coalesce(ws_ext_sales_price, 0) * 100) AS BIGINT) AS currency_ratio
        |    FROM web_sales
        |    LEFT JOIN web_returns ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
        |    JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |    WHERE coalesce(wr_return_amt, 0) > 1 AND ws_net_profit > 1
        |      AND d_year = 2021 AND d_moy = 12
        |    GROUP BY ws_item_sk) in_web) w
        |WHERE return_rank <= 10 OR currency_rank <= 10
        |UNION ALL
        |SELECT channel, item, return_ratio, return_rank, currency_rank FROM (
        |  SELECT 'catalog' AS channel, item, return_ratio, currency_ratio,
        |    rank() OVER (ORDER BY return_ratio, item) AS return_rank,
        |    rank() OVER (ORDER BY currency_ratio, item) AS currency_rank
        |  FROM (
        |    SELECT cs_item_sk AS item,
        |      CAST(sum(coalesce(cr_return_quantity, 0)) AS DOUBLE)
        |        / sum(coalesce(cs_quantity, 0)) AS return_ratio,
        |      CAST(CAST(sum(coalesce(cr_return_amt, 0) * 100) AS BIGINT) AS DOUBLE)
        |        / CAST(sum(coalesce(cs_ext_sales_price, 0) * 100) AS BIGINT) AS currency_ratio
        |    FROM catalog_sales
        |    LEFT JOIN catalog_returns ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
        |    JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |    WHERE coalesce(cr_return_amt, 0) > 1 AND cs_net_profit > 1
        |      AND d_year = 2021 AND d_moy = 12
        |    GROUP BY cs_item_sk) in_cat) c
        |WHERE return_rank <= 10 OR currency_rank <= 10
        |UNION ALL
        |SELECT channel, item, return_ratio, return_rank, currency_rank FROM (
        |  SELECT 'store' AS channel, item, return_ratio, currency_ratio,
        |    rank() OVER (ORDER BY return_ratio, item) AS return_rank,
        |    rank() OVER (ORDER BY currency_ratio, item) AS currency_rank
        |  FROM (
        |    SELECT ss_item_sk AS item,
        |      CAST(sum(coalesce(sr_return_quantity, 0)) AS DOUBLE)
        |        / sum(coalesce(ss_quantity, 0)) AS return_ratio,
        |      CAST(CAST(sum(coalesce(sr_return_amt, 0) * 100) AS BIGINT) AS DOUBLE)
        |        / CAST(sum(coalesce(ss_ext_sales_price, 0) * 100) AS BIGINT) AS currency_ratio
        |    FROM store_sales
        |    LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
        |    JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE coalesce(sr_return_amt, 0) > 1 AND ss_net_profit > 1
        |      AND d_year = 2021 AND d_moy = 12
        |    GROUP BY ss_item_sk) in_store) s
        |WHERE return_rank <= 10 OR currency_rank <= 10
        |ORDER BY 1, 4, 5, 2
        |LIMIT 100""".stripMargin),

    ("q50",
      """SELECT s_store_name, s_store_id, s_state, s_zip,
        |  count(CASE WHEN sr_returned_date_sk - ss_sold_date_sk <= 30 THEN 1 END) AS d30,
        |  count(CASE WHEN sr_returned_date_sk - ss_sold_date_sk BETWEEN 31 AND 60 THEN 1 END) AS d60,
        |  count(CASE WHEN sr_returned_date_sk - ss_sold_date_sk BETWEEN 61 AND 90 THEN 1 END) AS d90,
        |  count(CASE WHEN sr_returned_date_sk - ss_sold_date_sk BETWEEN 91 AND 120 THEN 1 END) AS d120,
        |  count(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 120 THEN 1 END) AS d120plus
        |FROM store_sales
        |JOIN store_returns ON ss_ticket_number = sr_ticket_number
        |  AND ss_item_sk = sr_item_sk AND ss_customer_sk = sr_customer_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |JOIN date_dim d1 ON ss_sold_date_sk = d1.d_date_sk
        |JOIN date_dim d2 ON sr_returned_date_sk = d2.d_date_sk
        |WHERE d2.d_year = 2021 AND d2.d_moy = 8
        |GROUP BY s_store_name, s_store_id, s_state, s_zip
        |ORDER BY s_store_name, s_store_id, s_state, s_zip
        |LIMIT 100""".stripMargin),

    ("q51",
      """WITH web_v1 AS (
        |  SELECT ws_item_sk AS item_sk, d_date,
        |    CAST(sum(sum(ws_ext_sales_price) * 100) OVER (
        |      PARTITION BY ws_item_sk ORDER BY d_date
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cume_sales
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463 AND ws_item_sk < 100
        |  GROUP BY ws_item_sk, d_date),
        |store_v1 AS (
        |  SELECT ss_item_sk AS item_sk, d_date,
        |    CAST(sum(sum(ss_ext_sales_price) * 100) OVER (
        |      PARTITION BY ss_item_sk ORDER BY d_date
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cume_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463 AND ss_item_sk < 100
        |  GROUP BY ss_item_sk, d_date)
        |SELECT * FROM (
        |  SELECT coalesce(web.item_sk, store.item_sk) AS item_sk,
        |    CAST(coalesce(web.d_date, store.d_date) AS STRING) AS d_date,
        |    web.cume_sales AS web_sales, store.cume_sales AS store_sales,
        |    max(web.cume_sales) OVER (
        |      PARTITION BY coalesce(web.item_sk, store.item_sk)
        |      ORDER BY coalesce(web.d_date, store.d_date)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cumulative,
        |    max(store.cume_sales) OVER (
        |      PARTITION BY coalesce(web.item_sk, store.item_sk)
        |      ORDER BY coalesce(web.d_date, store.d_date)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
        |  FROM web_v1 web
        |  FULL OUTER JOIN store_v1 store
        |    ON web.item_sk = store.item_sk AND web.d_date = store.d_date) y
        |WHERE web_cumulative > store_cumulative
        |ORDER BY item_sk, d_date
        |LIMIT 100""".stripMargin),

    ("q52",
      """SELECT d_year, i_brand AS brand,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS ext_price_cents
        |FROM date_dim
        |JOIN store_sales ON d_date_sk = ss_sold_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |WHERE i_manager_id = 1 AND d_moy = 11 AND d_year = 2021
        |GROUP BY d_year, i_brand
        |ORDER BY d_year, ext_price_cents DESC, brand
        |LIMIT 100""".stripMargin),

    ("q53",
      """SELECT * FROM (
        |  SELECT i_manufact_id, CAST(sum(ss_sales_price) * 100 AS BIGINT) AS sum_sales_cents,
        |    CAST(CAST(sum(sum(ss_sales_price) * 100) OVER (PARTITION BY i_manufact_id) AS BIGINT) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY i_manufact_id) AS avg_quarterly_cents
        |  FROM item
        |  JOIN store_sales ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463
        |    AND ((i_category IN ('cat_1', 'cat_2', 'cat_3') AND i_class IN ('class_1', 'class_2'))
        |      OR (i_category IN ('cat_4', 'cat_5') AND i_class IN ('class_3', 'class_4')))
        |  GROUP BY i_manufact_id, d_qoy) tmp1
        |WHERE avg_quarterly_cents > 0
        |  AND abs(sum_sales_cents - avg_quarterly_cents) > avg_quarterly_cents / 10
        |ORDER BY avg_quarterly_cents, sum_sales_cents, i_manufact_id
        |LIMIT 100""".stripMargin),

    ("q54",
      """WITH my_customers AS (
        |  SELECT DISTINCT c_customer_sk, c_address_sk
        |  FROM (
        |    SELECT cs_sold_date_sk AS sold_date_sk, cs_customer_sk AS customer_sk,
        |      cs_item_sk AS item_sk FROM catalog_sales
        |    UNION ALL
        |    SELECT ws_sold_date_sk, ws_customer_sk, ws_item_sk FROM web_sales) cs_or_ws_sales
        |  JOIN item ON item_sk = i_item_sk
        |  JOIN date_dim ON sold_date_sk = d_date_sk
        |  JOIN customer_dim ON c_customer_sk = customer_sk
        |  WHERE i_category = 'cat_3'
        |    AND d_moy = 4 AND d_year = 2021),
        |my_revenue AS (
        |  SELECT c_customer_sk, sum(ss_ext_sales_price) AS revenue
        |  FROM my_customers
        |  JOIN store_sales ON c_customer_sk = ss_customer_sk
        |  JOIN customer_address ON c_address_sk = ca_address_sk
        |  JOIN store ON ca_county = s_county AND ca_state = s_state
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_month_seq BETWEEN
        |      (SELECT DISTINCT d_month_seq + 1 FROM date_dim WHERE d_year = 2021 AND d_moy = 4)
        |    AND (SELECT DISTINCT d_month_seq + 3 FROM date_dim WHERE d_year = 2021 AND d_moy = 4)
        |  GROUP BY c_customer_sk),
        |segments AS (
        |  SELECT CAST(round(revenue / 50) AS INT) AS segment FROM my_revenue)
        |SELECT segment, count(*) AS num_customers, segment * 50 AS segment_base
        |FROM segments
        |GROUP BY segment
        |ORDER BY segment, num_customers
        |LIMIT 100""".stripMargin),

    ("q55",
      """SELECT i_brand AS brand,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS ext_price_cents
        |FROM date_dim
        |JOIN store_sales ON d_date_sk = ss_sold_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |WHERE i_manager_id = 28 AND d_moy = 11 AND d_year = 2021
        |GROUP BY i_brand
        |ORDER BY ext_price_cents DESC, brand
        |LIMIT 100""".stripMargin),

    ("q56",
      """WITH ss AS (
        |  SELECT i_item_id, sum(ss_ext_sales_price) AS total_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ss_addr_sk = ca_address_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_color IN ('red', 'navy', 'mint'))
        |    AND d_year = 2021 AND d_moy = 2 AND ca_gmt_offset = -5
        |  GROUP BY i_item_id),
        |cs AS (
        |  SELECT i_item_id, sum(cs_ext_sales_price) AS total_sales
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN customer_address ON cs_bill_addr_sk = ca_address_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_color IN ('red', 'navy', 'mint'))
        |    AND d_year = 2021 AND d_moy = 2 AND ca_gmt_offset = -5
        |  GROUP BY i_item_id),
        |ws AS (
        |  SELECT i_item_id, sum(ws_ext_sales_price) AS total_sales
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ws_bill_addr_sk = ca_address_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_color IN ('red', 'navy', 'mint'))
        |    AND d_year = 2021 AND d_moy = 2 AND ca_gmt_offset = -5
        |  GROUP BY i_item_id)
        |SELECT i_item_id, CAST(sum(total_sales) * 100 AS BIGINT) AS total_sales_cents
        |FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
        |GROUP BY i_item_id
        |ORDER BY total_sales_cents, i_item_id
        |LIMIT 100""".stripMargin),

    ("q57",
      """WITH v1 AS (
        |  SELECT i_category, i_brand, cc_name, d_year, d_moy,
        |    CAST(sum(cs_sales_price) * 100 AS BIGINT) AS sum_sales_cents,
        |    CAST(sum(sum(cs_sales_price) * 100) OVER (
        |      PARTITION BY i_category, i_brand, cc_name, d_year) AS BIGINT) AS wsum_cents,
        |    count(*) OVER (
        |      PARTITION BY i_category, i_brand, cc_name, d_year) AS nmonths,
        |    rank() OVER (
        |      PARTITION BY i_category, i_brand, cc_name
        |      ORDER BY d_year, d_moy) AS rn
        |  FROM item
        |  JOIN catalog_sales ON cs_item_sk = i_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN call_center ON cc_call_center_sk = cs_call_center_sk
        |  WHERE d_year = 2021 OR (d_year = 2020 AND d_moy = 12) OR (d_year = 2022 AND d_moy = 1)
        |  GROUP BY i_category, i_brand, cc_name, d_year, d_moy),
        |v2 AS (
        |  SELECT v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
        |    v1.wsum_cents, v1.nmonths, v1.sum_sales_cents,
        |    v1_lag.sum_sales_cents AS psum_cents, v1_lead.sum_sales_cents AS nsum_cents
        |  FROM v1, v1 v1_lag, v1 v1_lead
        |  WHERE v1.i_category = v1_lag.i_category AND v1.i_category = v1_lead.i_category
        |    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
        |    AND v1.cc_name = v1_lag.cc_name AND v1.cc_name = v1_lead.cc_name
        |    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
        |SELECT i_category, i_brand, cc_name, d_year, d_moy,
        |  sum_sales_cents, wsum_cents div nmonths AS avg_monthly_cents,
        |  psum_cents, nsum_cents
        |FROM v2
        |WHERE d_year = 2021 AND wsum_cents > 0
        |  AND abs(sum_sales_cents * nmonths - wsum_cents) * 10 > wsum_cents
        |ORDER BY CAST(sum_sales_cents AS DOUBLE) - CAST(wsum_cents AS DOUBLE) / nmonths,
        |  i_category, i_brand, cc_name, d_moy
        |LIMIT 100""".stripMargin),

    ("q58",
      """WITH ss_items AS (
        |  SELECT i_item_id AS item_id, sum(ss_ext_sales_price) AS ss_item_rev
        |  FROM store_sales
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_week_seq = (SELECT DISTINCT d_week_seq FROM date_dim WHERE d_date_sk = 1407)
        |  GROUP BY i_item_id),
        |cs_items AS (
        |  SELECT i_item_id AS item_id, sum(cs_ext_sales_price) AS cs_item_rev
        |  FROM catalog_sales
        |  JOIN item ON cs_item_sk = i_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_week_seq = (SELECT DISTINCT d_week_seq FROM date_dim WHERE d_date_sk = 1407)
        |  GROUP BY i_item_id),
        |ws_items AS (
        |  SELECT i_item_id AS item_id, sum(ws_ext_sales_price) AS ws_item_rev
        |  FROM web_sales
        |  JOIN item ON ws_item_sk = i_item_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_week_seq = (SELECT DISTINCT d_week_seq FROM date_dim WHERE d_date_sk = 1407)
        |  GROUP BY i_item_id)
        |SELECT ss_items.item_id,
        |  CAST(ss_item_rev * 100 AS BIGINT) AS ss_item_rev_cents,
        |  CAST(cs_item_rev * 100 AS BIGINT) AS cs_item_rev_cents,
        |  CAST(ws_item_rev * 100 AS BIGINT) AS ws_item_rev_cents,
        |  round(CAST(CAST((ss_item_rev + cs_item_rev + ws_item_rev) * 100 AS BIGINT) AS DOUBLE) / 300, 2) AS average
        |FROM ss_items
        |JOIN cs_items ON ss_items.item_id = cs_items.item_id
        |JOIN ws_items ON ss_items.item_id = ws_items.item_id
        |WHERE ss_item_rev BETWEEN 0.5 * cs_item_rev AND 2 * cs_item_rev
        |  AND ss_item_rev BETWEEN 0.5 * ws_item_rev AND 2 * ws_item_rev
        |  AND cs_item_rev BETWEEN 0.5 * ss_item_rev AND 2 * ss_item_rev
        |  AND cs_item_rev BETWEEN 0.5 * ws_item_rev AND 2 * ws_item_rev
        |  AND ws_item_rev BETWEEN 0.5 * ss_item_rev AND 2 * ss_item_rev
        |  AND ws_item_rev BETWEEN 0.5 * cs_item_rev AND 2 * cs_item_rev
        |ORDER BY ss_items.item_id, ss_item_rev_cents
        |LIMIT 100""".stripMargin),

    ("q59",
      """WITH wss AS (
        |  SELECT d_week_seq, ss_store_sk,
        |    sum(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price END) AS sun_sales,
        |    sum(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price END) AS mon_sales,
        |    sum(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price END) AS tue_sales,
        |    sum(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price END) AS wed_sales,
        |    sum(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price END) AS thu_sales,
        |    sum(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price END) AS fri_sales,
        |    sum(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price END) AS sat_sales
        |  FROM store_sales
        |  JOIN date_dim ON d_date_sk = ss_sold_date_sk
        |  GROUP BY d_week_seq, ss_store_sk),
        |weeks AS (SELECT DISTINCT d_week_seq, d_month_seq FROM date_dim)
        |SELECT y.s_store_name1, y.s_store_id1, y.d_week_seq1,
        |  CAST(CAST(y.sun_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.sun_sales2 * 100 AS BIGINT) AS r_sun, CAST(CAST(y.mon_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.mon_sales2 * 100 AS BIGINT) AS r_mon,
        |  CAST(CAST(y.tue_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.tue_sales2 * 100 AS BIGINT) AS r_tue, CAST(CAST(y.wed_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.wed_sales2 * 100 AS BIGINT) AS r_wed,
        |  CAST(CAST(y.thu_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.thu_sales2 * 100 AS BIGINT) AS r_thu, CAST(CAST(y.fri_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.fri_sales2 * 100 AS BIGINT) AS r_fri,
        |  CAST(CAST(y.sat_sales1 * 100 AS BIGINT) AS DOUBLE) / CAST(x.sat_sales2 * 100 AS BIGINT) AS r_sat
        |FROM (
        |  SELECT s_store_name AS s_store_name1, wss.d_week_seq AS d_week_seq1,
        |    s_store_id AS s_store_id1, sun_sales AS sun_sales1, mon_sales AS mon_sales1,
        |    tue_sales AS tue_sales1, wed_sales AS wed_sales1, thu_sales AS thu_sales1,
        |    fri_sales AS fri_sales1, sat_sales AS sat_sales1
        |  FROM wss
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN weeks ON weeks.d_week_seq = wss.d_week_seq
        |  WHERE d_month_seq BETWEEN 1452 AND 1463) y
        |JOIN (
        |  SELECT s_store_name AS s_store_name2, wss.d_week_seq AS d_week_seq2,
        |    s_store_id AS s_store_id2, sun_sales AS sun_sales2, mon_sales AS mon_sales2,
        |    tue_sales AS tue_sales2, wed_sales AS wed_sales2, thu_sales AS thu_sales2,
        |    fri_sales AS fri_sales2, sat_sales AS sat_sales2
        |  FROM wss
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN weeks ON weeks.d_week_seq = wss.d_week_seq
        |  WHERE d_month_seq BETWEEN 1464 AND 1475) x
        |ON y.s_store_id1 = x.s_store_id2 AND y.d_week_seq1 = x.d_week_seq2 - 52
        |ORDER BY y.s_store_name1, y.s_store_id1, y.d_week_seq1
        |LIMIT 100""".stripMargin),

    ("q60",
      """WITH ss AS (
        |  SELECT i_item_id, sum(ss_ext_sales_price) AS total_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ss_addr_sk = ca_address_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category = 'cat_5')
        |    AND d_year = 2021 AND d_moy = 9 AND ca_gmt_offset = -6
        |  GROUP BY i_item_id),
        |cs AS (
        |  SELECT i_item_id, sum(cs_ext_sales_price) AS total_sales
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN customer_address ON cs_bill_addr_sk = ca_address_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category = 'cat_5')
        |    AND d_year = 2021 AND d_moy = 9 AND ca_gmt_offset = -6
        |  GROUP BY i_item_id),
        |ws AS (
        |  SELECT i_item_id, sum(ws_ext_sales_price) AS total_sales
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ws_bill_addr_sk = ca_address_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category = 'cat_5')
        |    AND d_year = 2021 AND d_moy = 9 AND ca_gmt_offset = -6
        |  GROUP BY i_item_id)
        |SELECT i_item_id, CAST(sum(total_sales) * 100 AS BIGINT) AS total_sales_cents
        |FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
        |GROUP BY i_item_id
        |ORDER BY i_item_id, total_sales_cents
        |LIMIT 100""".stripMargin),

    ("q61",
      """SELECT CAST(promotions * 100 AS BIGINT) AS promotions_cents,
        |  CAST(total * 100 AS BIGINT) AS total_cents,
        |  CAST(CAST(promotions * 100 AS BIGINT) AS DOUBLE) / CAST(total * 100 AS BIGINT) * 100 AS promo_pct
        |FROM (
        |  SELECT sum(ss_ext_sales_price) AS promotions
        |  FROM store_sales
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN promotion ON ss_promo_sk = p_promo_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |  JOIN customer_address ON c_address_sk = ca_address_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE ca_gmt_offset = -5 AND i_category = 'cat_2'
        |    AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y' OR p_channel_tv = 'Y')
        |    AND s_gmt_offset = -5 AND d_year = 2021 AND d_moy = 11) promotional_sales,
        |  (
        |  SELECT sum(ss_ext_sales_price) AS total
        |  FROM store_sales
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |  JOIN customer_address ON c_address_sk = ca_address_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE ca_gmt_offset = -5 AND i_category = 'cat_2'
        |    AND s_gmt_offset = -5 AND d_year = 2021 AND d_moy = 11) all_sales""".stripMargin),

    ("q62",
      """SELECT w_state, sm_type, web_name,
        |  count(CASE WHEN ws_ship_date_sk - ws_sold_date_sk <= 30 THEN 1 END) AS d30,
        |  count(CASE WHEN ws_ship_date_sk - ws_sold_date_sk BETWEEN 31 AND 60 THEN 1 END) AS d60,
        |  count(CASE WHEN ws_ship_date_sk - ws_sold_date_sk BETWEEN 61 AND 90 THEN 1 END) AS d90,
        |  count(CASE WHEN ws_ship_date_sk - ws_sold_date_sk BETWEEN 91 AND 120 THEN 1 END) AS d120,
        |  count(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 120 THEN 1 END) AS d120plus
        |FROM web_sales
        |JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
        |JOIN ship_mode ON ws_ship_mode_sk = sm_ship_mode_sk
        |JOIN web_site ON ws_web_site_sk = web_site_sk
        |JOIN date_dim ON ws_ship_date_sk = d_date_sk
        |WHERE d_month_seq BETWEEN 1452 AND 1463
        |GROUP BY w_state, sm_type, web_name
        |ORDER BY w_state, sm_type, web_name
        |LIMIT 100""".stripMargin),

    ("q63",
      """SELECT * FROM (
        |  SELECT i_manager_id, CAST(sum(ss_sales_price) * 100 AS BIGINT) AS sum_sales_cents,
        |    CAST(CAST(sum(sum(ss_sales_price) * 100) OVER (PARTITION BY i_manager_id) AS BIGINT) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY i_manager_id) AS avg_monthly_cents
        |  FROM item
        |  JOIN store_sales ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  WHERE d_month_seq BETWEEN 1452 AND 1463
        |    AND ((i_category IN ('cat_1', 'cat_2', 'cat_3') AND i_class IN ('class_1', 'class_2'))
        |      OR (i_category IN ('cat_4', 'cat_5') AND i_class IN ('class_3', 'class_4')))
        |  GROUP BY i_manager_id, d_moy) tmp1
        |WHERE avg_monthly_cents > 0
        |  AND abs(sum_sales_cents - avg_monthly_cents) > avg_monthly_cents / 10
        |ORDER BY i_manager_id, avg_monthly_cents, sum_sales_cents
        |LIMIT 100""".stripMargin),

    ("q64",
      """WITH cs_ui AS (
        |  SELECT cs_item_sk, sum(cs_ext_list_price) AS sale, sum(cr_return_amt) AS refund
        |  FROM catalog_sales
        |  JOIN catalog_returns ON cs_id = cr_sale_id AND cs_item_sk = cr_item_sk
        |  GROUP BY cs_item_sk
        |  HAVING sum(cs_ext_list_price) > 2 * sum(cr_return_amt)),
        |cross_sales AS (
        |  SELECT i_item_id AS item_id, ss_item_sk AS item_sk, s_store_name AS store_name,
        |    s_zip AS store_zip, ad2.ca_city AS c_city, ad2.ca_zip AS c_zip,
        |    d1.d_year AS syear, count(*) AS cnt,
        |    sum(ss_wholesale_cost) AS s1, sum(ss_list_price) AS s2, sum(ss_coupon_amt) AS s3
        |  FROM store_sales
        |  JOIN store_returns ON ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number
        |  JOIN cs_ui ON ss_item_sk = cs_ui.cs_item_sk
        |  JOIN date_dim d1 ON ss_sold_date_sk = d1.d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |  JOIN date_dim d2 ON c_first_sales_date_sk = d2.d_date_sk
        |  JOIN date_dim d3 ON c_first_shipto_date_sk = d3.d_date_sk
        |  JOIN customer_address ad1 ON ss_addr_sk = ad1.ca_address_sk
        |  JOIN customer_address ad2 ON c_address_sk = ad2.ca_address_sk
        |  JOIN household_demographics hd1 ON ss_hdemo_sk = hd1.hd_demo_sk
        |  JOIN household_demographics hd2 ON c_hdemo_sk = hd2.hd_demo_sk
        |  JOIN income_band ib1 ON hd1.hd_income_band_sk = ib1.ib_income_band_sk
        |  JOIN income_band ib2 ON hd2.hd_income_band_sk = ib2.ib_income_band_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE i_color IN ('red', 'navy', 'blue', 'ivory', 'black', 'white')
        |    AND i_current_price BETWEEN 20 AND 60
        |  GROUP BY i_item_id, ss_item_sk, s_store_name, s_zip, ad2.ca_city, ad2.ca_zip, d1.d_year)
        |SELECT cs1.item_id, cs1.store_name, cs1.store_zip, cs1.c_city, cs1.c_zip,
        |  cs1.syear AS syear1, cs1.cnt AS cnt1,
        |  CAST(cs1.s1 * 100 AS BIGINT) AS s1_cents, CAST(cs1.s2 * 100 AS BIGINT) AS s2_cents,
        |  CAST(cs1.s3 * 100 AS BIGINT) AS s3_cents,
        |  cs2.syear AS syear2, cs2.cnt AS cnt2,
        |  CAST(cs2.s1 * 100 AS BIGINT) AS s1_cents2, CAST(cs2.s2 * 100 AS BIGINT) AS s2_cents2,
        |  CAST(cs2.s3 * 100 AS BIGINT) AS s3_cents2
        |FROM cross_sales cs1
        |JOIN cross_sales cs2 ON cs1.item_sk = cs2.item_sk
        |  AND cs1.store_name = cs2.store_name AND cs1.store_zip = cs2.store_zip
        |WHERE cs1.syear = 2022 AND cs2.syear = 2023 AND cs2.cnt <= cs1.cnt
        |ORDER BY cs1.item_id, cs1.store_name, cnt2, cs1.c_city, cs1.c_zip
        |LIMIT 100""".stripMargin),

    ("q65",
      """SELECT s_store_name, i_item_desc, CAST(sc.revenue * 100 AS BIGINT) AS revenue_cents,
        |  CAST(CAST(i_current_price * 100 AS BIGINT) AS DOUBLE) / 100 AS i_current_price,
        |  CAST(CAST(i_wholesale_cost * 100 AS BIGINT) AS DOUBLE) / 100 AS i_wholesale_cost,
        |  i_brand
        |FROM store, item,
        |  (SELECT ss_store_sk,
        |     CAST(CAST(sum(revenue * 100) AS BIGINT) AS DOUBLE) / count(*) AS ave_c FROM (
        |     SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue
        |     FROM store_sales
        |     JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |     WHERE d_month_seq BETWEEN 1452 AND 1463
        |     GROUP BY ss_store_sk, ss_item_sk) sa
        |   GROUP BY ss_store_sk) sb,
        |  (SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue
        |   FROM store_sales
        |   JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |   WHERE d_month_seq BETWEEN 1452 AND 1463
        |   GROUP BY ss_store_sk, ss_item_sk) sc
        |WHERE sb.ss_store_sk = sc.ss_store_sk
        |  AND CAST(sc.revenue * 100 AS BIGINT) * 10 <= sb.ave_c
        |  AND s_store_sk = sc.ss_store_sk
        |  AND i_item_sk = sc.ss_item_sk
        |ORDER BY s_store_name, i_item_desc, revenue_cents
        |LIMIT 100""".stripMargin),

    ("q66",
      """SELECT w_warehouse_name, w_sqft, w_city, w_county, w_state, ship_carriers, the_year,
        |  CAST(sum(jan_sales) * 100 AS BIGINT) AS jan_sales_cents,
        |  CAST(sum(feb_sales) * 100 AS BIGINT) AS feb_sales_cents,
        |  CAST(sum(mar_sales) * 100 AS BIGINT) AS mar_sales_cents,
        |  CAST(sum(apr_sales) * 100 AS BIGINT) AS apr_sales_cents,
        |  CAST(sum(may_sales) * 100 AS BIGINT) AS may_sales_cents,
        |  CAST(sum(jun_sales) * 100 AS BIGINT) AS jun_sales_cents,
        |  CAST(sum(jul_sales) * 100 AS BIGINT) AS jul_sales_cents,
        |  CAST(sum(aug_sales) * 100 AS BIGINT) AS aug_sales_cents,
        |  CAST(sum(sep_sales) * 100 AS BIGINT) AS sep_sales_cents,
        |  CAST(sum(oct_sales) * 100 AS BIGINT) AS oct_sales_cents,
        |  CAST(sum(nov_sales) * 100 AS BIGINT) AS nov_sales_cents,
        |  CAST(sum(dec_sales) * 100 AS BIGINT) AS dec_sales_cents,
        |  CAST(sum(total_net) * 100 AS BIGINT) AS total_net_cents
        |FROM (
        |  SELECT w_warehouse_name, w_sqft, w_city, w_county, w_state,
        |    concat('carrier_1', ',', 'carrier_2') AS ship_carriers, d_year AS the_year,
        |    sum(CASE WHEN d_moy = 1 THEN ws_sales_price * ws_quantity ELSE 0 END) AS jan_sales,
        |    sum(CASE WHEN d_moy = 2 THEN ws_sales_price * ws_quantity ELSE 0 END) AS feb_sales,
        |    sum(CASE WHEN d_moy = 3 THEN ws_sales_price * ws_quantity ELSE 0 END) AS mar_sales,
        |    sum(CASE WHEN d_moy = 4 THEN ws_sales_price * ws_quantity ELSE 0 END) AS apr_sales,
        |    sum(CASE WHEN d_moy = 5 THEN ws_sales_price * ws_quantity ELSE 0 END) AS may_sales,
        |    sum(CASE WHEN d_moy = 6 THEN ws_sales_price * ws_quantity ELSE 0 END) AS jun_sales,
        |    sum(CASE WHEN d_moy = 7 THEN ws_sales_price * ws_quantity ELSE 0 END) AS jul_sales,
        |    sum(CASE WHEN d_moy = 8 THEN ws_sales_price * ws_quantity ELSE 0 END) AS aug_sales,
        |    sum(CASE WHEN d_moy = 9 THEN ws_sales_price * ws_quantity ELSE 0 END) AS sep_sales,
        |    sum(CASE WHEN d_moy = 10 THEN ws_sales_price * ws_quantity ELSE 0 END) AS oct_sales,
        |    sum(CASE WHEN d_moy = 11 THEN ws_sales_price * ws_quantity ELSE 0 END) AS nov_sales,
        |    sum(CASE WHEN d_moy = 12 THEN ws_sales_price * ws_quantity ELSE 0 END) AS dec_sales,
        |    sum(ws_net_paid * ws_quantity) AS total_net
        |  FROM web_sales
        |  JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN time_dim ON ws_sold_time_sk = t_time_sk
        |  JOIN ship_mode ON ws_ship_mode_sk = sm_ship_mode_sk
        |  WHERE d_year = 2021 AND t_hour BETWEEN 8 AND 17
        |    AND sm_carrier IN ('carrier_1', 'carrier_2')
        |  GROUP BY w_warehouse_name, w_sqft, w_city, w_county, w_state, d_year
        |  UNION ALL
        |  SELECT w_warehouse_name, w_sqft, w_city, w_county, w_state,
        |    concat('carrier_1', ',', 'carrier_2') AS ship_carriers, d_year AS the_year,
        |    sum(CASE WHEN d_moy = 1 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jan_sales,
        |    sum(CASE WHEN d_moy = 2 THEN cs_sales_price * cs_quantity ELSE 0 END) AS feb_sales,
        |    sum(CASE WHEN d_moy = 3 THEN cs_sales_price * cs_quantity ELSE 0 END) AS mar_sales,
        |    sum(CASE WHEN d_moy = 4 THEN cs_sales_price * cs_quantity ELSE 0 END) AS apr_sales,
        |    sum(CASE WHEN d_moy = 5 THEN cs_sales_price * cs_quantity ELSE 0 END) AS may_sales,
        |    sum(CASE WHEN d_moy = 6 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jun_sales,
        |    sum(CASE WHEN d_moy = 7 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jul_sales,
        |    sum(CASE WHEN d_moy = 8 THEN cs_sales_price * cs_quantity ELSE 0 END) AS aug_sales,
        |    sum(CASE WHEN d_moy = 9 THEN cs_sales_price * cs_quantity ELSE 0 END) AS sep_sales,
        |    sum(CASE WHEN d_moy = 10 THEN cs_sales_price * cs_quantity ELSE 0 END) AS oct_sales,
        |    sum(CASE WHEN d_moy = 11 THEN cs_sales_price * cs_quantity ELSE 0 END) AS nov_sales,
        |    sum(CASE WHEN d_moy = 12 THEN cs_sales_price * cs_quantity ELSE 0 END) AS dec_sales,
        |    sum(cs_net_paid * cs_quantity) AS total_net
        |  FROM catalog_sales
        |  JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN time_dim ON cs_sold_time_sk = t_time_sk
        |  JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
        |  WHERE d_year = 2021 AND t_hour BETWEEN 8 AND 17
        |    AND sm_carrier IN ('carrier_1', 'carrier_2')
        |  GROUP BY w_warehouse_name, w_sqft, w_city, w_county, w_state, d_year) x
        |GROUP BY w_warehouse_name, w_sqft, w_city, w_county, w_state, ship_carriers, the_year
        |ORDER BY w_warehouse_name
        |LIMIT 100""".stripMargin))
}
