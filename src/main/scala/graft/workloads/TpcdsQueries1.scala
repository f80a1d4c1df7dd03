package graft.workloads

/** TPC-DS v1.4 query catalog, part 1: q1–q33 (incl. the q14/q23/q24
  * a/b variants).
  *
  * Own transcription of the public TPC-DS benchmark query set (the
  * query shapes are specified in the public TPC-DS v1.4 specification;
  * the reference ships them verbatim in
  * `P/tpcds/TPCDS_1_4_Queries.scala:36-3861`), adapted to the generated
  * star schema's column surface (datagen/StarSchema.scala): identical
  * join/aggregate/window/set-operation structure per query, with filter
  * parameters tuned to the generated value distributions (d_year
  * 2020–2023, categories cat_0..9, states state_0..9, …) and money
  * outputs surfaced as exact integer cents (decimal arithmetic stays
  * exact, so HashResults checksums are partition-stable).
  *
  * Every ORDER BY carries a full tiebreaker so LIMIT cuts are
  * deterministic under any partitioning.
  */
object TpcdsQueries1 {

  val defs: Seq[(String, String)] = Seq(

    ("q1",
      // The spec's `> avg(ctr_total_return) * 1.2` threshold is stated in
      // integer-exact cross-multiplied form (total*10*cnt > sum*12) so the
      // DuckDB oracle can't diverge on DECIMAL-vs-DOUBLE avg rounding at
      // boundary-equal rows; two correlated scalar subqueries preserve the
      // correlated-subquery plan shape of the original.
      """WITH customer_total_return AS (
        |  SELECT sr_customer_sk AS ctr_customer_sk, sr_store_sk AS ctr_store_sk,
        |    CAST(sum(sr_return_amt * 100) AS BIGINT) AS ctr_total_return_c
        |  FROM store_returns JOIN date_dim ON sr_returned_date_sk = d_date_sk
        |  WHERE d_year = 2021
        |  GROUP BY sr_customer_sk, sr_store_sk)
        |SELECT c_customer_id
        |FROM customer_total_return ctr1
        |JOIN store ON ctr1.ctr_store_sk = s_store_sk
        |JOIN customer_dim ON ctr1.ctr_customer_sk = c_customer_sk
        |WHERE ctr1.ctr_total_return_c * 10 * (
        |    SELECT count(*) FROM customer_total_return ctr2
        |    WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk) > (
        |    SELECT CAST(sum(ctr_total_return_c) AS BIGINT) * 12 FROM customer_total_return ctr3
        |    WHERE ctr1.ctr_store_sk = ctr3.ctr_store_sk)
        |  AND s_state = 'state_3'
        |ORDER BY c_customer_id
        |LIMIT 100""".stripMargin),

    ("q2",
      """WITH wscs AS (
        |  SELECT sold_date_sk, sales_price FROM (
        |    SELECT ws_sold_date_sk AS sold_date_sk, ws_ext_sales_price AS sales_price FROM web_sales
        |    UNION ALL
        |    SELECT cs_sold_date_sk, cs_ext_sales_price FROM catalog_sales) u),
        |wswscs AS (
        |  SELECT d_week_seq,
        |    sum(CASE WHEN d_day_name = 'Sunday' THEN sales_price END) AS sun_sales,
        |    sum(CASE WHEN d_day_name = 'Monday' THEN sales_price END) AS mon_sales,
        |    sum(CASE WHEN d_day_name = 'Tuesday' THEN sales_price END) AS tue_sales,
        |    sum(CASE WHEN d_day_name = 'Wednesday' THEN sales_price END) AS wed_sales,
        |    sum(CASE WHEN d_day_name = 'Thursday' THEN sales_price END) AS thu_sales,
        |    sum(CASE WHEN d_day_name = 'Friday' THEN sales_price END) AS fri_sales,
        |    sum(CASE WHEN d_day_name = 'Saturday' THEN sales_price END) AS sat_sales
        |  FROM wscs JOIN date_dim ON sold_date_sk = d_date_sk
        |  GROUP BY d_week_seq)
        |SELECT y.d_week_seq AS d_week_seq1,
        |  round(CAST(CAST(z.sun_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.sun_sales * 100 AS BIGINT), 2) AS sun_r,
        |  round(CAST(CAST(z.mon_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.mon_sales * 100 AS BIGINT), 2) AS mon_r,
        |  round(CAST(CAST(z.tue_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.tue_sales * 100 AS BIGINT), 2) AS tue_r,
        |  round(CAST(CAST(z.wed_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.wed_sales * 100 AS BIGINT), 2) AS wed_r,
        |  round(CAST(CAST(z.thu_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.thu_sales * 100 AS BIGINT), 2) AS thu_r,
        |  round(CAST(CAST(z.fri_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.fri_sales * 100 AS BIGINT), 2) AS fri_r,
        |  round(CAST(CAST(z.sat_sales * 100 AS BIGINT) AS DOUBLE) / CAST(y.sat_sales * 100 AS BIGINT), 2) AS sat_r
        |FROM wswscs y JOIN wswscs z ON z.d_week_seq = y.d_week_seq + 52
        |WHERE y.d_week_seq BETWEEN 52 AND 103
        |ORDER BY d_week_seq1""".stripMargin),

    ("q3",
      """SELECT d_year, i_brand AS brand,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS sum_agg_cents
        |FROM store_sales
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |WHERE i_manufact_id = 28 AND d_moy = 11
        |GROUP BY d_year, i_brand
        |ORDER BY d_year, sum_agg_cents DESC, brand
        |LIMIT 100""".stripMargin),

    ("q4",
      """WITH year_total AS (
        |  SELECT c_customer_id AS customer_id, c_first_name, c_last_name, d_year AS dyear,
        |    sum(ss_ext_list_price - ss_ext_discount_amt) AS year_total, 's' AS sale_type
        |  FROM customer_dim
        |  JOIN store_sales ON c_customer_sk = ss_customer_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
        |  UNION ALL
        |  SELECT c_customer_id, c_first_name, c_last_name, d_year,
        |    sum(cs_ext_list_price - cs_ext_discount_amt), 'c'
        |  FROM customer_dim
        |  JOIN catalog_sales ON c_customer_sk = cs_customer_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
        |  UNION ALL
        |  SELECT c_customer_id, c_first_name, c_last_name, d_year,
        |    sum(ws_ext_list_price - ws_ext_discount_amt), 'w'
        |  FROM customer_dim
        |  JOIN web_sales ON c_customer_sk = ws_customer_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
        |SELECT t_s_secyear.customer_id, t_s_secyear.c_first_name, t_s_secyear.c_last_name
        |FROM year_total t_s_firstyear, year_total t_s_secyear,
        |     year_total t_c_firstyear, year_total t_c_secyear,
        |     year_total t_w_firstyear, year_total t_w_secyear
        |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
        |  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
        |  AND t_s_firstyear.sale_type = 's' AND t_c_firstyear.sale_type = 'c' AND t_w_firstyear.sale_type = 'w'
        |  AND t_s_secyear.sale_type = 's' AND t_c_secyear.sale_type = 'c' AND t_w_secyear.sale_type = 'w'
        |  AND t_s_firstyear.dyear = 2021 AND t_s_secyear.dyear = 2022
        |  AND t_c_firstyear.dyear = 2021 AND t_c_secyear.dyear = 2022
        |  AND t_w_firstyear.dyear = 2021 AND t_w_secyear.dyear = 2022
        |  AND t_s_firstyear.year_total > 0 AND t_c_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
        |  AND t_c_secyear.year_total / t_c_firstyear.year_total
        |      > t_s_secyear.year_total / t_s_firstyear.year_total
        |  AND t_c_secyear.year_total / t_c_firstyear.year_total
        |      > t_w_secyear.year_total / t_w_firstyear.year_total
        |ORDER BY t_s_secyear.customer_id, t_s_secyear.c_first_name, t_s_secyear.c_last_name
        |LIMIT 100""".stripMargin),

    ("q5",
      """WITH ssr AS (
        |  SELECT s_store_id, sum(sales_price) AS sales, sum(profit) AS profit,
        |    sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
        |  FROM (
        |    SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
        |      ss_ext_sales_price AS sales_price, ss_net_profit AS profit,
        |      CAST(0 AS DECIMAL(15,2)) AS return_amt, CAST(0 AS DECIMAL(15,2)) AS net_loss
        |    FROM store_sales
        |    UNION ALL
        |    SELECT sr_store_sk, sr_returned_date_sk,
        |      CAST(0 AS DECIMAL(15,2)), CAST(0 AS DECIMAL(15,2)), sr_return_amt, sr_net_loss
        |    FROM store_returns) salesreturns
        |  JOIN date_dim ON date_sk = d_date_sk
        |  JOIN store ON store_sk = s_store_sk
        |  WHERE d_date_sk BETWEEN 400 AND 413
        |  GROUP BY s_store_id),
        |csr AS (
        |  SELECT cp_catalog_page_id, sum(sales_price) AS sales, sum(profit) AS profit,
        |    sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
        |  FROM (
        |    SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
        |      cs_ext_sales_price AS sales_price, cs_net_profit AS profit,
        |      CAST(0 AS DECIMAL(15,2)) AS return_amt, CAST(0 AS DECIMAL(15,2)) AS net_loss
        |    FROM catalog_sales
        |    UNION ALL
        |    SELECT cs_catalog_page_sk, cr_returned_date_sk,
        |      CAST(0 AS DECIMAL(15,2)), CAST(0 AS DECIMAL(15,2)), cr_return_amt, cr_net_loss
        |    FROM catalog_returns JOIN catalog_sales ON cr_sale_id = cs_id) salesreturns
        |  JOIN date_dim ON date_sk = d_date_sk
        |  JOIN catalog_page ON page_sk = cp_catalog_page_sk
        |  WHERE d_date_sk BETWEEN 400 AND 413
        |  GROUP BY cp_catalog_page_id),
        |wsr AS (
        |  SELECT web_site_id, sum(sales_price) AS sales, sum(profit) AS profit,
        |    sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
        |  FROM (
        |    SELECT ws_web_site_sk AS wsite_sk, ws_sold_date_sk AS date_sk,
        |      ws_ext_sales_price AS sales_price, ws_net_profit AS profit,
        |      CAST(0 AS DECIMAL(15,2)) AS return_amt, CAST(0 AS DECIMAL(15,2)) AS net_loss
        |    FROM web_sales
        |    UNION ALL
        |    SELECT ws_web_site_sk, wr_returned_date_sk,
        |      CAST(0 AS DECIMAL(15,2)), CAST(0 AS DECIMAL(15,2)), wr_return_amt, wr_net_loss
        |    FROM web_returns JOIN web_sales ON wr_sale_id = ws_id) salesreturns
        |  JOIN date_dim ON date_sk = d_date_sk
        |  JOIN web_site ON wsite_sk = web_site_sk
        |  WHERE d_date_sk BETWEEN 400 AND 413
        |  GROUP BY web_site_id)
        |SELECT channel, id,
        |  CAST(sum(sales) * 100 AS BIGINT) AS sales_cents,
        |  CAST(sum(returns_amt) * 100 AS BIGINT) AS returns_cents,
        |  CAST(sum(profit - profit_loss) * 100 AS BIGINT) AS profit_cents
        |FROM (
        |  SELECT 'store channel' AS channel, concat('store', s_store_id) AS id,
        |    sales, returns_amt, profit, profit_loss FROM ssr
        |  UNION ALL
        |  SELECT 'catalog channel', concat('catalog_page', cp_catalog_page_id),
        |    sales, returns_amt, profit, profit_loss FROM csr
        |  UNION ALL
        |  SELECT 'web channel', concat('web_site', web_site_id),
        |    sales, returns_amt, profit, profit_loss FROM wsr) x
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q6",
      """SELECT a.ca_state AS state, count(*) AS cnt
        |FROM customer_address a
        |JOIN customer_dim c ON a.ca_address_sk = c.c_address_sk
        |JOIN store_sales s ON c.c_customer_sk = s.ss_customer_sk
        |JOIN date_dim d ON s.ss_sold_date_sk = d.d_date_sk
        |JOIN item i ON s.ss_item_sk = i.i_item_sk
        |WHERE d.d_month_seq = (SELECT DISTINCT d_month_seq FROM date_dim
        |                       WHERE d_year = 2021 AND d_moy = 1)
        |  AND CAST(i.i_current_price * 100 AS BIGINT) * 10
        |    * (SELECT count(j.i_current_price) FROM item j WHERE j.i_category = i.i_category)
        |    > 12 * (SELECT CAST(sum(j2.i_current_price * 100) AS BIGINT) FROM item j2
        |            WHERE j2.i_category = i.i_category)
        |GROUP BY a.ca_state
        |HAVING count(*) >= 10
        |ORDER BY cnt, state
        |LIMIT 100""".stripMargin),

    ("q7",
      """SELECT i_item_id, avg(ss_quantity) AS agg1, CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS agg2,
        |  CAST(CAST(sum(ss_coupon_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_coupon_amt) / 100 AS agg3, CAST(CAST(sum(ss_sales_price * 100) AS BIGINT) AS DOUBLE) / count(ss_sales_price) / 100 AS agg4
        |FROM store_sales
        |JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |JOIN promotion ON ss_promo_sk = p_promo_sk
        |WHERE cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
        |  AND (p_channel_email = 'N' OR p_channel_tv = 'N') AND d_year = 2021
        |GROUP BY i_item_id
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    ("q8",
      """SELECT s_store_name, CAST(sum(ss_net_paid) * 100 AS BIGINT) AS paid_cents
        |FROM store_sales
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |WHERE d_qoy = 2 AND d_year = 2021
        |  AND substr(s_zip, 1, 2) IN (
        |    SELECT zip2 FROM (
        |      SELECT substr(ca_zip, 1, 2) AS zip2, count(*) AS cnt
        |      FROM customer_address
        |      JOIN customer_dim ON ca_address_sk = c_address_sk
        |      WHERE c_preferred_cust_flag = 'Y'
        |      GROUP BY substr(ca_zip, 1, 2)
        |      HAVING count(*) > 10) preferred_zips)
        |GROUP BY s_store_name
        |ORDER BY s_store_name
        |LIMIT 100""".stripMargin),

    ("q9",
      """SELECT
        |  CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 2) > 15000
        |    THEN (SELECT round(CAST(CAST(sum(ss_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_discount_amt) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 2)
        |    ELSE (SELECT round(CAST(CAST(sum(ss_net_paid * 100) AS BIGINT) AS DOUBLE) / count(ss_net_paid) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 2) END AS bucket1,
        |  CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 3 AND 4) > 15000
        |    THEN (SELECT round(CAST(CAST(sum(ss_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_discount_amt) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 3 AND 4)
        |    ELSE (SELECT round(CAST(CAST(sum(ss_net_paid * 100) AS BIGINT) AS DOUBLE) / count(ss_net_paid) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 3 AND 4) END AS bucket2,
        |  CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 5 AND 6) > 15000
        |    THEN (SELECT round(CAST(CAST(sum(ss_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_discount_amt) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 5 AND 6)
        |    ELSE (SELECT round(CAST(CAST(sum(ss_net_paid * 100) AS BIGINT) AS DOUBLE) / count(ss_net_paid) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 5 AND 6) END AS bucket3,
        |  CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 7 AND 8) > 15000
        |    THEN (SELECT round(CAST(CAST(sum(ss_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_discount_amt) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 7 AND 8)
        |    ELSE (SELECT round(CAST(CAST(sum(ss_net_paid * 100) AS BIGINT) AS DOUBLE) / count(ss_net_paid) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 7 AND 8) END AS bucket4,
        |  CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 9 AND 10) > 15000
        |    THEN (SELECT round(CAST(CAST(sum(ss_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_discount_amt) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 9 AND 10)
        |    ELSE (SELECT round(CAST(CAST(sum(ss_net_paid * 100) AS BIGINT) AS DOUBLE) / count(ss_net_paid) / 100, 2) FROM store_sales WHERE ss_quantity BETWEEN 9 AND 10) END AS bucket5
        |FROM reason WHERE r_reason_sk = 1""".stripMargin),

    ("q10",
      """SELECT cd_gender, cd_marital_status, cd_education_status, count(*) AS cnt1,
        |  cd_purchase_estimate, count(*) AS cnt2, cd_credit_rating, count(*) AS cnt3
        |FROM customer_dim c
        |JOIN customer_address ca ON c.c_address_sk = ca.ca_address_sk
        |JOIN customer_demographics ON cd_demo_sk = c.c_cdemo_sk
        |WHERE ca_county IN ('county_1', 'county_2', 'county_3', 'county_4', 'county_5')
        |  AND EXISTS (
        |    SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE c.c_customer_sk = ss_customer_sk AND d_year = 2021 AND d_moy BETWEEN 1 AND 4)
        |  AND (EXISTS (
        |      SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |      WHERE c.c_customer_sk = ws_customer_sk AND d_year = 2021 AND d_moy BETWEEN 1 AND 4)
        |    OR EXISTS (
        |      SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |      WHERE c.c_customer_sk = cs_customer_sk AND d_year = 2021 AND d_moy BETWEEN 1 AND 4))
        |GROUP BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate, cd_credit_rating
        |ORDER BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate, cd_credit_rating
        |LIMIT 100""".stripMargin),

    ("q11",
      """WITH year_total AS (
        |  SELECT c_customer_id AS customer_id, c_preferred_cust_flag, d_year AS dyear,
        |    sum(ss_ext_list_price - ss_ext_discount_amt) AS year_total, 's' AS sale_type
        |  FROM customer_dim
        |  JOIN store_sales ON c_customer_sk = ss_customer_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  GROUP BY c_customer_id, c_preferred_cust_flag, d_year
        |  UNION ALL
        |  SELECT c_customer_id, c_preferred_cust_flag, d_year,
        |    sum(ws_ext_list_price - ws_ext_discount_amt), 'w'
        |  FROM customer_dim
        |  JOIN web_sales ON c_customer_sk = ws_customer_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  GROUP BY c_customer_id, c_preferred_cust_flag, d_year)
        |SELECT t_s_secyear.customer_id, t_s_secyear.c_preferred_cust_flag
        |FROM year_total t_s_firstyear, year_total t_s_secyear,
        |     year_total t_w_firstyear, year_total t_w_secyear
        |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
        |  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
        |  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
        |  AND t_s_firstyear.dyear = 2021 AND t_s_secyear.dyear = 2022
        |  AND t_w_firstyear.dyear = 2021 AND t_w_secyear.dyear = 2022
        |  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
        |  AND t_w_secyear.year_total / t_w_firstyear.year_total
        |      > t_s_secyear.year_total / t_s_firstyear.year_total
        |ORDER BY t_s_secyear.customer_id, t_s_secyear.c_preferred_cust_flag
        |LIMIT 100""".stripMargin),

    ("q12",
      """SELECT i_item_id, i_item_desc, i_category, i_class,
        |  CAST(i_current_price AS DOUBLE) AS i_current_price,
        |  CAST(sum(ws_ext_sales_price) * 100 AS BIGINT) AS itemrevenue_cents,
        |  CAST(sum(ws_ext_sales_price) * 100 AS BIGINT) * 10000
        |    / CAST(sum(sum(ws_ext_sales_price)) OVER (PARTITION BY i_class) * 100 AS BIGINT) AS revenueratio
        |FROM web_sales
        |JOIN item ON ws_item_sk = i_item_sk
        |JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |WHERE i_category IN ('cat_1', 'cat_2', 'cat_3')
        |  AND d_date_sk BETWEEN 400 AND 429
        |GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
        |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
        |LIMIT 100""".stripMargin),

    ("q13",
      """SELECT avg(ss_quantity) AS avg_qty, CAST(CAST(sum(ss_ext_sales_price * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_sales_price) / 100 AS avg_esp,
        |  CAST(CAST(sum(ss_ext_wholesale_cost * 100) AS BIGINT) AS DOUBLE) / count(ss_ext_wholesale_cost) / 100 AS avg_ewc,
        |  CAST(sum(ss_ext_wholesale_cost) * 100 AS BIGINT) AS sum_ewc_cents
        |FROM store_sales
        |JOIN store ON s_store_sk = ss_store_sk
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk AND d_year = 2021
        |JOIN customer_demographics ON cd_demo_sk = ss_cdemo_sk
        |JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |JOIN customer_address ON ss_addr_sk = ca_address_sk
        |WHERE ca_country = 'United States'
        |  AND ((cd_marital_status = 'M' AND cd_education_status = '4 yr Degree'
        |        AND ss_sales_price BETWEEN 100 AND 150 AND hd_dep_count = 3)
        |    OR (cd_marital_status = 'S' AND cd_education_status = 'College'
        |        AND ss_sales_price BETWEEN 50 AND 100 AND hd_dep_count = 1)
        |    OR (cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
        |        AND ss_sales_price BETWEEN 150 AND 200 AND hd_dep_count = 1))""".stripMargin),

    ("q14a",
      """WITH cross_items AS (
        |  SELECT i_item_sk AS ss_item_sk
        |  FROM item JOIN (
        |    SELECT iss.i_brand_id, iss.i_class_id, iss.i_category_id
        |    FROM store_sales
        |    JOIN (SELECT i_item_sk, i_brand AS i_brand_id, i_class AS i_class_id,
        |            i_category AS i_category_id FROM item) iss ON ss_item_sk = iss.i_item_sk
        |    JOIN date_dim d1 ON ss_sold_date_sk = d1.d_date_sk AND d1.d_year BETWEEN 2020 AND 2022
        |    INTERSECT
        |    SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        |    FROM catalog_sales
        |    JOIN (SELECT i_item_sk, i_brand AS i_brand_id, i_class AS i_class_id,
        |            i_category AS i_category_id FROM item) ics ON cs_item_sk = ics.i_item_sk
        |    JOIN date_dim d2 ON cs_sold_date_sk = d2.d_date_sk AND d2.d_year BETWEEN 2020 AND 2022
        |    INTERSECT
        |    SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        |    FROM web_sales
        |    JOIN (SELECT i_item_sk, i_brand AS i_brand_id, i_class AS i_class_id,
        |            i_category AS i_category_id FROM item) iws ON ws_item_sk = iws.i_item_sk
        |    JOIN date_dim d3 ON ws_sold_date_sk = d3.d_date_sk AND d3.d_year BETWEEN 2020 AND 2022) x
        |  ON i_brand = i_brand_id AND i_class = i_class_id AND i_category = i_category_id),
        |avg_sales AS (
        |  SELECT CAST(sum(quantity * list_price * 100) AS BIGINT) AS total_sales_c,
        |    count(quantity * list_price) AS total_cnt FROM (
        |    SELECT ss_quantity AS quantity, ss_list_price AS list_price
        |    FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE d_year BETWEEN 2020 AND 2022
        |    UNION ALL
        |    SELECT cs_quantity, cs_list_price
        |    FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |    WHERE d_year BETWEEN 2020 AND 2022
        |    UNION ALL
        |    SELECT ws_quantity, ws_list_price
        |    FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |    WHERE d_year BETWEEN 2020 AND 2022) u)
        |SELECT channel, i_brand, i_class, i_category,
        |  CAST(sum(sales) * 100 AS BIGINT) AS sales_cents,
        |  CAST(sum(number_sales) AS BIGINT) AS number_sales
        |FROM (
        |  SELECT 'store' AS channel, i_brand, i_class, i_category,
        |    sum(ss_quantity * ss_list_price) AS sales, count(*) AS number_sales
        |  FROM store_sales
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        |    AND d_year = 2022 AND d_moy = 11
        |  GROUP BY i_brand, i_class, i_category
        |  HAVING CAST(sum(ss_quantity * ss_list_price) * 100 AS BIGINT)
        |    * (SELECT total_cnt FROM avg_sales) > (SELECT total_sales_c FROM avg_sales)
        |  UNION ALL
        |  SELECT 'catalog', i_brand, i_class, i_category,
        |    sum(cs_quantity * cs_list_price), count(*)
        |  FROM catalog_sales
        |  JOIN item ON cs_item_sk = i_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE cs_item_sk IN (SELECT ss_item_sk FROM cross_items)
        |    AND d_year = 2022 AND d_moy = 11
        |  GROUP BY i_brand, i_class, i_category
        |  HAVING CAST(sum(cs_quantity * cs_list_price) * 100 AS BIGINT)
        |    * (SELECT total_cnt FROM avg_sales) > (SELECT total_sales_c FROM avg_sales)
        |  UNION ALL
        |  SELECT 'web', i_brand, i_class, i_category,
        |    sum(ws_quantity * ws_list_price), count(*)
        |  FROM web_sales
        |  JOIN item ON ws_item_sk = i_item_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE ws_item_sk IN (SELECT ss_item_sk FROM cross_items)
        |    AND d_year = 2022 AND d_moy = 11
        |  GROUP BY i_brand, i_class, i_category
        |  HAVING CAST(sum(ws_quantity * ws_list_price) * 100 AS BIGINT)
        |    * (SELECT total_cnt FROM avg_sales) > (SELECT total_sales_c FROM avg_sales)) y
        |GROUP BY ROLLUP (channel, i_brand, i_class, i_category)
        |ORDER BY channel ASC NULLS FIRST, i_brand ASC NULLS FIRST,
        |  i_class ASC NULLS FIRST, i_category ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q14b",
      """WITH cross_items AS (
        |  SELECT i_item_sk AS ss_item_sk
        |  FROM item JOIN (
        |    SELECT iss.i_brand_id, iss.i_class_id, iss.i_category_id
        |    FROM store_sales
        |    JOIN (SELECT i_item_sk, i_brand AS i_brand_id, i_class AS i_class_id,
        |            i_category AS i_category_id FROM item) iss ON ss_item_sk = iss.i_item_sk
        |    JOIN date_dim d1 ON ss_sold_date_sk = d1.d_date_sk AND d1.d_year BETWEEN 2020 AND 2022
        |    INTERSECT
        |    SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        |    FROM catalog_sales
        |    JOIN (SELECT i_item_sk, i_brand AS i_brand_id, i_class AS i_class_id,
        |            i_category AS i_category_id FROM item) ics ON cs_item_sk = ics.i_item_sk
        |    JOIN date_dim d2 ON cs_sold_date_sk = d2.d_date_sk AND d2.d_year BETWEEN 2020 AND 2022
        |    INTERSECT
        |    SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        |    FROM web_sales
        |    JOIN (SELECT i_item_sk, i_brand AS i_brand_id, i_class AS i_class_id,
        |            i_category AS i_category_id FROM item) iws ON ws_item_sk = iws.i_item_sk
        |    JOIN date_dim d3 ON ws_sold_date_sk = d3.d_date_sk AND d3.d_year BETWEEN 2020 AND 2022) x
        |  ON i_brand = i_brand_id AND i_class = i_class_id AND i_category = i_category_id),
        |avg_sales AS (
        |  SELECT CAST(sum(quantity * list_price * 100) AS BIGINT) AS total_sales_c,
        |    count(quantity * list_price) AS total_cnt FROM (
        |    SELECT ss_quantity AS quantity, ss_list_price AS list_price
        |    FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE d_year BETWEEN 2020 AND 2022
        |    UNION ALL
        |    SELECT cs_quantity, cs_list_price
        |    FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |    WHERE d_year BETWEEN 2020 AND 2022
        |    UNION ALL
        |    SELECT ws_quantity, ws_list_price
        |    FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |    WHERE d_year BETWEEN 2020 AND 2022) u)
        |SELECT this_year.channel AS ty_channel, this_year.i_brand AS ty_brand,
        |  this_year.i_class AS ty_class, this_year.i_category AS ty_category,
        |  CAST(this_year.sales * 100 AS BIGINT) AS ty_sales_cents,
        |  this_year.number_sales AS ty_number_sales,
        |  CAST(last_year.sales * 100 AS BIGINT) AS ly_sales_cents,
        |  last_year.number_sales AS ly_number_sales
        |FROM (
        |  SELECT 'store' AS channel, i_brand, i_class, i_category,
        |    sum(ss_quantity * ss_list_price) AS sales, count(*) AS number_sales
        |  FROM store_sales
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        |    AND d_week_seq = 154
        |  GROUP BY i_brand, i_class, i_category
        |  HAVING CAST(sum(ss_quantity * ss_list_price) * 100 AS BIGINT)
        |    * (SELECT total_cnt FROM avg_sales) > (SELECT total_sales_c FROM avg_sales)) this_year
        |JOIN (
        |  SELECT 'store' AS channel, i_brand, i_class, i_category,
        |    sum(ss_quantity * ss_list_price) AS sales, count(*) AS number_sales
        |  FROM store_sales
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        |    AND d_week_seq = 102
        |  GROUP BY i_brand, i_class, i_category
        |  HAVING CAST(sum(ss_quantity * ss_list_price) * 100 AS BIGINT)
        |    * (SELECT total_cnt FROM avg_sales) > (SELECT total_sales_c FROM avg_sales)) last_year
        |ON this_year.i_brand = last_year.i_brand
        |  AND this_year.i_class = last_year.i_class
        |  AND this_year.i_category = last_year.i_category
        |ORDER BY ty_channel, ty_brand, ty_class, ty_category
        |LIMIT 100""".stripMargin),

    ("q15",
      """SELECT ca_zip, CAST(sum(cs_ext_sales_price) * 100 AS BIGINT) AS sales_cents
        |FROM catalog_sales
        |JOIN customer_dim ON cs_customer_sk = c_customer_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |WHERE (substr(ca_zip, 1, 2) IN ('10', '22', '35', '48', '61')
        |    OR ca_state IN ('state_8', 'state_9')
        |    OR cs_ext_sales_price > 500)
        |  AND d_qoy = 1 AND d_year = 2021
        |GROUP BY ca_zip
        |ORDER BY ca_zip
        |LIMIT 100""".stripMargin),

    ("q16",
      """SELECT count(DISTINCT cs1.cs_order_number) AS order_count,
        |  CAST(sum(cs1.cs_ext_sales_price) * 100 AS BIGINT) AS total_sales_cents,
        |  CAST(sum(cs1.cs_net_profit) * 100 AS BIGINT) AS total_net_profit_cents
        |FROM catalog_sales cs1
        |JOIN date_dim ON cs1.cs_ship_date_sk = d_date_sk
        |JOIN customer_address ON cs1.cs_ship_addr_sk = ca_address_sk
        |JOIN call_center ON cs1.cs_call_center_sk = cc_call_center_sk
        |WHERE d_date_sk BETWEEN 400 AND 460
        |  AND ca_state = 'state_2'
        |  AND cc_county IN ('county_1', 'county_2', 'county_3')
        |  AND EXISTS (SELECT 1 FROM catalog_sales cs2
        |              WHERE cs1.cs_order_number = cs2.cs_order_number
        |                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
        |  AND NOT EXISTS (SELECT 1 FROM catalog_returns cr1
        |                  WHERE cs1.cs_order_number = cr1.cr_order_number)""".stripMargin),

    ("q17",
      """SELECT i_item_id, i_item_desc, s_state,
        |  count(ss_quantity) AS store_sales_quantitycount,
        |  avg(ss_quantity) AS store_sales_quantityave,
        |  round(stddev_samp(ss_quantity), 4) AS store_sales_quantitystdev,
        |  count(sr_return_quantity) AS store_returns_quantitycount,
        |  avg(sr_return_quantity) AS store_returns_quantityave,
        |  round(stddev_samp(sr_return_quantity), 4) AS store_returns_quantitystdev,
        |  count(cs_quantity) AS catalog_sales_quantitycount,
        |  avg(cs_quantity) AS catalog_sales_quantityave,
        |  round(stddev_samp(cs_quantity), 4) AS catalog_sales_quantitystdev
        |FROM store_sales
        |JOIN store_returns ON ss_customer_sk = sr_customer_sk
        |  AND ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number
        |JOIN catalog_sales ON sr_customer_sk = cs_customer_sk AND sr_item_sk = cs_item_sk
        |JOIN date_dim d1 ON d1.d_date_sk = ss_sold_date_sk AND d1.d_qoy = 1 AND d1.d_year = 2021
        |JOIN date_dim d2 ON sr_returned_date_sk = d2.d_date_sk AND d2.d_qoy IN (1, 2, 3) AND d2.d_year = 2021
        |JOIN date_dim d3 ON cs_sold_date_sk = d3.d_date_sk AND d3.d_qoy IN (1, 2, 3) AND d3.d_year = 2021
        |JOIN store ON s_store_sk = ss_store_sk
        |JOIN item ON i_item_sk = ss_item_sk
        |GROUP BY i_item_id, i_item_desc, s_state
        |ORDER BY i_item_id, i_item_desc, s_state
        |LIMIT 100""".stripMargin),

    ("q18",
      """SELECT i_item_id, ca_country, ca_state, ca_county,
        |  avg(cs_quantity) AS agg1, CAST(CAST(sum(cs_list_price * 100) AS BIGINT) AS DOUBLE) / count(cs_list_price) / 100 AS agg2,
        |  CAST(CAST(sum(cs_coupon_amt * 100) AS BIGINT) AS DOUBLE) / count(cs_coupon_amt) / 100 AS agg3, CAST(CAST(sum(cs_sales_price * 100) AS BIGINT) AS DOUBLE) / count(cs_sales_price) / 100 AS agg4,
        |  CAST(CAST(sum(cs_net_profit * 100) AS BIGINT) AS DOUBLE) / count(cs_net_profit) / 100 AS agg5, avg(c_birth_year) AS agg6,
        |  avg(cd1.cd_dep_count) AS agg7
        |FROM catalog_sales
        |JOIN customer_demographics cd1 ON cs_bill_cdemo_sk = cd1.cd_demo_sk
        |JOIN customer_dim ON cs_customer_sk = c_customer_sk
        |JOIN customer_demographics cd2 ON c_cdemo_sk = cd2.cd_demo_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |JOIN item ON cs_item_sk = i_item_sk
        |WHERE cd1.cd_gender = 'F' AND cd1.cd_education_status = 'Unknown'
        |  AND c_birth_month IN (1, 2, 6, 8, 9, 12) AND d_year = 2021
        |  AND ca_state IN ('state_1', 'state_5', 'state_9')
        |GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
        |ORDER BY ca_country ASC NULLS FIRST, ca_state ASC NULLS FIRST,
        |  ca_county ASC NULLS FIRST, i_item_id ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q19",
      """SELECT i_brand AS brand, i_manufact_id,
        |  CAST(sum(ss_ext_sales_price) * 100 AS BIGINT) AS ext_price_cents
        |FROM date_dim
        |JOIN store_sales ON d_date_sk = ss_sold_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |JOIN customer_address ON c_address_sk = ca_address_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |WHERE i_manager_id = 8 AND d_moy = 11 AND d_year = 2021
        |  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
        |GROUP BY i_brand, i_manufact_id
        |ORDER BY ext_price_cents DESC, brand, i_manufact_id
        |LIMIT 100""".stripMargin),

    ("q20",
      """SELECT i_item_id, i_item_desc, i_category, i_class,
        |  CAST(i_current_price AS DOUBLE) AS i_current_price,
        |  CAST(sum(cs_ext_sales_price) * 100 AS BIGINT) AS itemrevenue_cents,
        |  CAST(sum(cs_ext_sales_price) * 100 AS BIGINT) * 10000
        |    / CAST(sum(sum(cs_ext_sales_price)) OVER (PARTITION BY i_class) * 100 AS BIGINT) AS revenueratio
        |FROM catalog_sales
        |JOIN item ON cs_item_sk = i_item_sk
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |WHERE i_category IN ('cat_1', 'cat_2', 'cat_3')
        |  AND d_date_sk BETWEEN 400 AND 429
        |GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
        |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
        |LIMIT 100""".stripMargin),

    ("q21",
      """SELECT w_warehouse_name, i_item_id,
        |  CAST(sum(CASE WHEN d_date_sk < 735 THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_before,
        |  CAST(sum(CASE WHEN d_date_sk >= 735 THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_after
        |FROM inventory
        |JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
        |JOIN item ON inv_item_sk = i_item_sk
        |JOIN date_dim ON inv_date_sk = d_date_sk
        |WHERE i_current_price BETWEEN 20 AND 50
        |  AND d_date_sk BETWEEN 705 AND 765
        |GROUP BY w_warehouse_name, i_item_id
        |HAVING sum(CASE WHEN d_date_sk >= 735 THEN inv_quantity_on_hand ELSE 0 END) * 3
        |    BETWEEN sum(CASE WHEN d_date_sk < 735 THEN inv_quantity_on_hand ELSE 0 END) * 2
        |        AND sum(CASE WHEN d_date_sk < 735 THEN inv_quantity_on_hand ELSE 0 END) * 5
        |ORDER BY w_warehouse_name, i_item_id
        |LIMIT 100""".stripMargin),

    ("q22",
      """SELECT i_category, i_class, i_brand,
        |  avg(inv_quantity_on_hand) AS qoh
        |FROM inventory
        |JOIN date_dim ON inv_date_sk = d_date_sk
        |JOIN item ON inv_item_sk = i_item_sk
        |WHERE d_month_seq BETWEEN 1452 AND 1463
        |GROUP BY ROLLUP (i_category, i_class, i_brand)
        |ORDER BY qoh, i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
        |  i_brand ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q23a",
      """WITH frequent_ss_items AS (
        |  SELECT ss_item_sk AS item_sk, d_date, count(*) AS cnt
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year IN (2020, 2021, 2022)
        |  GROUP BY ss_item_sk, d_date
        |  HAVING count(*) > 2),
        |max_store_sales AS (
        |  SELECT max(csales) AS tpcds_cmax FROM (
        |    SELECT ss_customer_sk, sum(ss_quantity * ss_sales_price) AS csales
        |    FROM store_sales
        |    JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE d_year IN (2020, 2021, 2022)
        |    GROUP BY ss_customer_sk) best),
        |best_ss_customer AS (
        |  SELECT ss_customer_sk, sum(ss_quantity * ss_sales_price) AS ssales
        |  FROM store_sales
        |  GROUP BY ss_customer_sk
        |  HAVING sum(ss_quantity * ss_sales_price)
        |    > 0.5 * (SELECT tpcds_cmax FROM max_store_sales))
        |SELECT CAST(sum(sales) * 100 AS BIGINT) AS sales_cents FROM (
        |  SELECT cs_quantity * cs_list_price AS sales
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_year = 2022 AND d_moy = 2
        |    AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        |    AND cs_customer_sk IN (SELECT ss_customer_sk FROM best_ss_customer)
        |  UNION ALL
        |  SELECT ws_quantity * ws_list_price
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year = 2022 AND d_moy = 2
        |    AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        |    AND ws_customer_sk IN (SELECT ss_customer_sk FROM best_ss_customer)) y""".stripMargin),

    ("q23b",
      """WITH frequent_ss_items AS (
        |  SELECT ss_item_sk AS item_sk, d_date, count(*) AS cnt
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year IN (2020, 2021, 2022)
        |  GROUP BY ss_item_sk, d_date
        |  HAVING count(*) > 2),
        |max_store_sales AS (
        |  SELECT max(csales) AS tpcds_cmax FROM (
        |    SELECT ss_customer_sk, sum(ss_quantity * ss_sales_price) AS csales
        |    FROM store_sales
        |    JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |    WHERE d_year IN (2020, 2021, 2022)
        |    GROUP BY ss_customer_sk) best),
        |best_ss_customer AS (
        |  SELECT ss_customer_sk, sum(ss_quantity * ss_sales_price) AS ssales
        |  FROM store_sales
        |  GROUP BY ss_customer_sk
        |  HAVING sum(ss_quantity * ss_sales_price)
        |    > 0.5 * (SELECT tpcds_cmax FROM max_store_sales))
        |SELECT c_last_name, c_first_name, CAST(sum(sales) * 100 AS BIGINT) AS sales_cents FROM (
        |  SELECT cs_customer_sk AS customer_sk, cs_quantity * cs_list_price AS sales
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_year = 2022 AND d_moy = 2
        |    AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        |    AND cs_customer_sk IN (SELECT ss_customer_sk FROM best_ss_customer)
        |  UNION ALL
        |  SELECT ws_customer_sk, ws_quantity * ws_list_price
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year = 2022 AND d_moy = 2
        |    AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        |    AND ws_customer_sk IN (SELECT ss_customer_sk FROM best_ss_customer)) y
        |JOIN customer_dim ON customer_sk = c_customer_sk
        |GROUP BY c_last_name, c_first_name
        |ORDER BY c_last_name, c_first_name, sales_cents
        |LIMIT 100""".stripMargin),

    ("q24a",
      """WITH ssales AS (
        |  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
        |    i_color, i_current_price, i_manufact_id, i_size,
        |    sum(ss_net_paid) AS netpaid
        |  FROM store_sales
        |  JOIN store_returns ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |  JOIN customer_address ON c_address_sk = ca_address_sk
        |  WHERE c_birth_country <> upper(ca_country)
        |    AND substr(s_zip, 1, 1) = substr(ca_zip, 1, 1)
        |    AND s_market = 2
        |  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
        |    i_color, i_current_price, i_manufact_id, i_size)
        |SELECT c_last_name, c_first_name, s_store_name,
        |  CAST(sum(netpaid) * 100 AS BIGINT) AS paid_cents
        |FROM ssales
        |WHERE i_color = 'red'
        |GROUP BY c_last_name, c_first_name, s_store_name
        |HAVING CAST(sum(netpaid) * 100 AS BIGINT) * 20 * (SELECT count(netpaid) FROM ssales)
        |  > (SELECT CAST(sum(netpaid * 100) AS BIGINT) FROM ssales)
        |ORDER BY c_last_name, c_first_name, s_store_name
        |LIMIT 100""".stripMargin),

    ("q24b",
      """WITH ssales AS (
        |  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
        |    i_color, i_current_price, i_manufact_id, i_size,
        |    sum(ss_net_paid) AS netpaid
        |  FROM store_sales
        |  JOIN store_returns ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN customer_dim ON ss_customer_sk = c_customer_sk
        |  JOIN customer_address ON c_address_sk = ca_address_sk
        |  WHERE c_birth_country <> upper(ca_country)
        |    AND substr(s_zip, 1, 1) = substr(ca_zip, 1, 1)
        |    AND s_market = 2
        |  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
        |    i_color, i_current_price, i_manufact_id, i_size)
        |SELECT c_last_name, c_first_name, s_store_name,
        |  CAST(sum(netpaid) * 100 AS BIGINT) AS paid_cents
        |FROM ssales
        |WHERE i_color = 'navy'
        |GROUP BY c_last_name, c_first_name, s_store_name
        |HAVING CAST(sum(netpaid) * 100 AS BIGINT) * 20 * (SELECT count(netpaid) FROM ssales)
        |  > (SELECT CAST(sum(netpaid * 100) AS BIGINT) FROM ssales)
        |ORDER BY c_last_name, c_first_name, s_store_name
        |LIMIT 100""".stripMargin),

    ("q25",
      """SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
        |  CAST(sum(ss_net_profit) * 100 AS BIGINT) AS store_sales_profit_cents,
        |  CAST(sum(sr_net_loss) * 100 AS BIGINT) AS store_returns_loss_cents,
        |  CAST(sum(cs_net_profit) * 100 AS BIGINT) AS catalog_sales_profit_cents
        |FROM store_sales
        |JOIN store_returns ON ss_customer_sk = sr_customer_sk
        |  AND ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number
        |JOIN catalog_sales ON sr_customer_sk = cs_customer_sk AND sr_item_sk = cs_item_sk
        |JOIN date_dim d1 ON d1.d_date_sk = ss_sold_date_sk AND d1.d_year = 2021
        |JOIN date_dim d2 ON sr_returned_date_sk = d2.d_date_sk AND d2.d_year = 2021
        |JOIN date_dim d3 ON cs_sold_date_sk = d3.d_date_sk AND d3.d_year IN (2021, 2022, 2023)
        |JOIN store ON s_store_sk = ss_store_sk
        |JOIN item ON i_item_sk = ss_item_sk
        |GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
        |ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
        |LIMIT 100""".stripMargin),

    ("q26",
      """SELECT i_item_id, avg(cs_quantity) AS agg1, CAST(CAST(sum(cs_list_price * 100) AS BIGINT) AS DOUBLE) / count(cs_list_price) / 100 AS agg2,
        |  CAST(CAST(sum(cs_coupon_amt * 100) AS BIGINT) AS DOUBLE) / count(cs_coupon_amt) / 100 AS agg3, CAST(CAST(sum(cs_sales_price * 100) AS BIGINT) AS DOUBLE) / count(cs_sales_price) / 100 AS agg4
        |FROM catalog_sales
        |JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |JOIN item ON cs_item_sk = i_item_sk
        |JOIN promotion ON cs_promo_sk = p_promo_sk
        |WHERE cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
        |  AND (p_channel_email = 'N' OR p_channel_tv = 'N') AND d_year = 2021
        |GROUP BY i_item_id
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    ("q27",
      """SELECT i_item_id, s_state, CAST(grouping(s_state) AS INT) AS g_state,
        |  avg(ss_quantity) AS agg1, CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS agg2,
        |  CAST(CAST(sum(ss_coupon_amt * 100) AS BIGINT) AS DOUBLE) / count(ss_coupon_amt) / 100 AS agg3, CAST(CAST(sum(ss_sales_price * 100) AS BIGINT) AS DOUBLE) / count(ss_sales_price) / 100 AS agg4
        |FROM store_sales
        |JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |WHERE cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
        |  AND d_year = 2021
        |  AND s_state IN ('state_0', 'state_1', 'state_2', 'state_3', 'state_4', 'state_5')
        |GROUP BY ROLLUP (i_item_id, s_state)
        |ORDER BY i_item_id ASC NULLS FIRST, s_state ASC NULLS FIRST
        |LIMIT 100""".stripMargin),

    ("q28",
      """SELECT b1.lp AS b1_lp, b1.cnt AS b1_cnt, b1.cntd AS b1_cntd,
        |  b2.lp AS b2_lp, b2.cnt AS b2_cnt, b2.cntd AS b2_cntd,
        |  b3.lp AS b3_lp, b3.cnt AS b3_cnt, b3.cntd AS b3_cntd,
        |  b4.lp AS b4_lp, b4.cnt AS b4_cnt, b4.cntd AS b4_cntd,
        |  b5.lp AS b5_lp, b5.cnt AS b5_cnt, b5.cntd AS b5_cntd,
        |  b6.lp AS b6_lp, b6.cnt AS b6_cnt, b6.cntd AS b6_cntd
        |FROM
        |  (SELECT CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS lp, count(ss_list_price) AS cnt,
        |     count(DISTINCT ss_list_price) AS cntd FROM store_sales
        |   WHERE ss_quantity BETWEEN 1 AND 2
        |     AND (ss_list_price BETWEEN 10 AND 20 OR ss_coupon_amt BETWEEN 1 AND 10
        |       OR ss_wholesale_cost BETWEEN 10 AND 30)) b1,
        |  (SELECT CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS lp, count(ss_list_price) AS cnt,
        |     count(DISTINCT ss_list_price) AS cntd FROM store_sales
        |   WHERE ss_quantity BETWEEN 3 AND 4
        |     AND (ss_list_price BETWEEN 20 AND 30 OR ss_coupon_amt BETWEEN 1 AND 10
        |       OR ss_wholesale_cost BETWEEN 20 AND 40)) b2,
        |  (SELECT CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS lp, count(ss_list_price) AS cnt,
        |     count(DISTINCT ss_list_price) AS cntd FROM store_sales
        |   WHERE ss_quantity BETWEEN 5 AND 6
        |     AND (ss_list_price BETWEEN 30 AND 40 OR ss_coupon_amt BETWEEN 1 AND 10
        |       OR ss_wholesale_cost BETWEEN 30 AND 50)) b3,
        |  (SELECT CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS lp, count(ss_list_price) AS cnt,
        |     count(DISTINCT ss_list_price) AS cntd FROM store_sales
        |   WHERE ss_quantity BETWEEN 7 AND 8
        |     AND (ss_list_price BETWEEN 40 AND 50 OR ss_coupon_amt BETWEEN 1 AND 10
        |       OR ss_wholesale_cost BETWEEN 40 AND 60)) b4,
        |  (SELECT CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS lp, count(ss_list_price) AS cnt,
        |     count(DISTINCT ss_list_price) AS cntd FROM store_sales
        |   WHERE ss_quantity BETWEEN 9 AND 10
        |     AND (ss_list_price BETWEEN 50 AND 60 OR ss_coupon_amt BETWEEN 1 AND 10
        |       OR ss_wholesale_cost BETWEEN 50 AND 70)) b5,
        |  (SELECT CAST(CAST(sum(ss_list_price * 100) AS BIGINT) AS DOUBLE) / count(ss_list_price) / 100 AS lp, count(ss_list_price) AS cnt,
        |     count(DISTINCT ss_list_price) AS cntd FROM store_sales
        |   WHERE ss_quantity BETWEEN 1 AND 10
        |     AND (ss_list_price BETWEEN 60 AND 70 OR ss_coupon_amt BETWEEN 1 AND 10
        |       OR ss_wholesale_cost BETWEEN 60 AND 80)) b6
        |LIMIT 100""".stripMargin),

    ("q29",
      """SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
        |  CAST(sum(ss_quantity) AS BIGINT) AS store_sales_quantity,
        |  CAST(sum(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
        |  CAST(sum(cs_quantity) AS BIGINT) AS catalog_sales_quantity
        |FROM store_sales
        |JOIN store_returns ON ss_customer_sk = sr_customer_sk
        |  AND ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number
        |JOIN catalog_sales ON sr_customer_sk = cs_customer_sk AND sr_item_sk = cs_item_sk
        |JOIN date_dim d1 ON d1.d_date_sk = ss_sold_date_sk AND d1.d_moy = 4 AND d1.d_year = 2021
        |JOIN date_dim d2 ON sr_returned_date_sk = d2.d_date_sk
        |  AND d2.d_moy BETWEEN 4 AND 7 AND d2.d_year = 2021
        |JOIN date_dim d3 ON cs_sold_date_sk = d3.d_date_sk AND d3.d_year IN (2021, 2022, 2023)
        |JOIN store ON s_store_sk = ss_store_sk
        |JOIN item ON i_item_sk = ss_item_sk
        |GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
        |ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
        |LIMIT 100""".stripMargin),

    ("q30",
      // Same integer-exact threshold treatment as q1 (see note there).
      """WITH customer_total_return AS (
        |  SELECT wr_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
        |    CAST(sum(wr_return_amt * 100) AS BIGINT) AS ctr_total_return_c
        |  FROM web_returns
        |  JOIN date_dim ON wr_returned_date_sk = d_date_sk
        |  JOIN customer_address ON wr_returning_addr_sk = ca_address_sk
        |  WHERE d_year = 2021
        |  GROUP BY wr_customer_sk, ca_state)
        |SELECT c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
        |  c_birth_year, c_birth_country,
        |  ctr_total_return_c AS return_cents
        |FROM customer_total_return ctr1
        |JOIN customer_dim ON ctr1.ctr_customer_sk = c_customer_sk
        |WHERE ctr1.ctr_total_return_c * 10 * (
        |    SELECT count(*) FROM customer_total_return ctr2
        |    WHERE ctr1.ctr_state = ctr2.ctr_state) > (
        |    SELECT CAST(sum(ctr_total_return_c) AS BIGINT) * 12 FROM customer_total_return ctr3
        |    WHERE ctr1.ctr_state = ctr3.ctr_state)
        |ORDER BY c_customer_id, return_cents
        |LIMIT 100""".stripMargin),

    ("q31",
      """WITH ss AS (
        |  SELECT ca_county, d_qoy, d_year, sum(ss_ext_sales_price) AS store_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ss_addr_sk = ca_address_sk
        |  GROUP BY ca_county, d_qoy, d_year),
        |ws AS (
        |  SELECT ca_county, d_qoy, d_year, sum(ws_ext_sales_price) AS web_sales
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ws_bill_addr_sk = ca_address_sk
        |  GROUP BY ca_county, d_qoy, d_year)
        |SELECT ss1.ca_county, ss1.d_year,
        |  ws2.web_sales / ws1.web_sales AS web_q1_q2_increase,
        |  ss2.store_sales / ss1.store_sales AS store_q1_q2_increase,
        |  ws3.web_sales / ws2.web_sales AS web_q2_q3_increase,
        |  ss3.store_sales / ss2.store_sales AS store_q2_q3_increase
        |FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
        |WHERE ss1.d_qoy = 1 AND ss1.d_year = 2021
        |  AND ss1.ca_county = ss2.ca_county AND ss2.d_qoy = 2 AND ss2.d_year = 2021
        |  AND ss2.ca_county = ss3.ca_county AND ss3.d_qoy = 3 AND ss3.d_year = 2021
        |  AND ss1.ca_county = ws1.ca_county AND ws1.d_qoy = 1 AND ws1.d_year = 2021
        |  AND ws1.ca_county = ws2.ca_county AND ws2.d_qoy = 2 AND ws2.d_year = 2021
        |  AND ws1.ca_county = ws3.ca_county AND ws3.d_qoy = 3 AND ws3.d_year = 2021
        |  AND CASE WHEN ws1.web_sales > 0 THEN ws2.web_sales / ws1.web_sales ELSE NULL END
        |    > CASE WHEN ss1.store_sales > 0 THEN ss2.store_sales / ss1.store_sales ELSE NULL END
        |  AND CASE WHEN ws2.web_sales > 0 THEN ws3.web_sales / ws2.web_sales ELSE NULL END
        |    > CASE WHEN ss2.store_sales > 0 THEN ss3.store_sales / ss2.store_sales ELSE NULL END
        |ORDER BY ss1.ca_county""".stripMargin),

    ("q32",
      """SELECT CAST(sum(cs_ext_discount_amt) * 100 AS BIGINT) AS excess_discount_cents
        |FROM catalog_sales
        |JOIN item ON i_item_sk = cs_item_sk
        |JOIN date_dim ON d_date_sk = cs_sold_date_sk
        |WHERE i_manufact_id = 29
        |  AND d_date_sk BETWEEN 400 AND 490
        |  AND cs_ext_discount_amt > (
        |    SELECT 1.3 * CAST(CAST(sum(cs_ext_discount_amt * 100) AS BIGINT) AS DOUBLE) / count(cs_ext_discount_amt) / 100
        |    FROM catalog_sales cs2
        |    JOIN date_dim d2 ON d2.d_date_sk = cs2.cs_sold_date_sk
        |    WHERE cs2.cs_item_sk = i_item_sk AND d2.d_date_sk BETWEEN 400 AND 490)""".stripMargin),

    ("q33",
      """WITH ss AS (
        |  SELECT i_manufact_id, sum(ss_ext_sales_price) AS total_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ss_addr_sk = ca_address_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category = 'cat_3')
        |    AND d_year = 2021 AND d_moy = 5 AND ca_gmt_offset = -6
        |  GROUP BY i_manufact_id),
        |cs AS (
        |  SELECT i_manufact_id, sum(cs_ext_sales_price) AS total_sales
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN customer_address ON cs_bill_addr_sk = ca_address_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category = 'cat_3')
        |    AND d_year = 2021 AND d_moy = 5 AND ca_gmt_offset = -6
        |  GROUP BY i_manufact_id),
        |ws AS (
        |  SELECT i_manufact_id, sum(ws_ext_sales_price) AS total_sales
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN customer_address ON ws_bill_addr_sk = ca_address_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category = 'cat_3')
        |    AND d_year = 2021 AND d_moy = 5 AND ca_gmt_offset = -6
        |  GROUP BY i_manufact_id)
        |SELECT i_manufact_id, CAST(sum(total_sales) * 100 AS BIGINT) AS total_sales_cents
        |FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
        |GROUP BY i_manufact_id
        |ORDER BY total_sales_cents, i_manufact_id
        |LIMIT 100""".stripMargin))
}
