package graft.workloads

import graft.CatalogQuery
import graft.datagen.RetailData

/** The ImpalaKit catalog: the reference ships the 21 "modified"
  * Impala-dialect TPC-DS rewrites plus `ss_max`, and 15 "original"
  * pre-rewrite forms, as catalog entries distinct from the main TPC-DS
  * set (`P/tpcds/ImpalaKitQueries.scala:28-1463`; groupings at
  * `:1465-1469`). Re-expressed here over the generated star schema with
  * parameters tuned to its distributions.
  *
  * Dialect character preserved from the kit's rewrites:
  *   - modified set: lowercase `join ... on (qualified = qualified)`
  *     syntax, surrogate-key range predicates standing in for date
  *     filters (`-- partition key filter`, redundant with the dim
  *     predicate so the optimizer can prune the fact scan without the
  *     join), and the features the kit dropped for Impala 1.x — q27
  *     without ROLLUP, q53/q63/q89/q98 without the window average,
  *     q73/q82 without the date_dim join, q46's explicit date-sk
  *     IN-list, q68/q79 narrowed to a one-quarter window.
  *   - original set: unparenthesized `JOIN ... ON` with full table
  *     qualification, no surrogate-key pruning (full-fact scans), and
  *     q59's `MAPJOIN` hints (parsed by Spark as broadcast hints, a
  *     block comment to DuckDB).
  *
  * Outputs follow this repo's oracle-parity house rules: DECIMAL sums
  * as exact integer cents, averages as exact-cents DOUBLE divisions,
  * deterministic total ORDER BY under every LIMIT. All 37 entries are
  * DuckDB value-oracled.
  */
object ImpalaQueries {

  /** Impala-modified dialect (reference ImpalaKitQueries.scala:28-1016). */
  val modified: Seq[(String, String)] = Seq(

    ("q19",
      """select
        |  i_brand,
        |  i_manufact_id,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) ext_price_cents
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join customer_dim on (store_sales.ss_customer_sk = customer_dim.c_customer_sk)
        |  join customer_address on (customer_dim.c_address_sk = customer_address.ca_address_sk)
        |  join store on (store_sales.ss_store_sk = store.s_store_sk)
        |  join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |where
        |  ss_sold_date_sk between 670 and 699 -- partition key filter
        |  and d_moy = 11
        |  and d_year = 2021
        |  and i_manager_id = 8
        |  and substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
        |group by
        |  i_brand,
        |  i_manufact_id
        |order by
        |  ext_price_cents desc,
        |  i_brand,
        |  i_manufact_id
        |limit 100""".stripMargin),

    ("q27",
      """select
        |  i_item_id,
        |  s_state,
        |  -- grouping(s_state) g_state,
        |  avg(ss_quantity) agg1,
        |  cast(cast(sum(ss_list_price * 100) as bigint) as double) / count(ss_list_price) / 100 agg2,
        |  cast(cast(sum(ss_coupon_amt * 100) as bigint) as double) / count(ss_coupon_amt) / 100 agg3,
        |  cast(cast(sum(ss_sales_price * 100) as bigint) as double) / count(ss_sales_price) / 100 agg4
        |from
        |  store_sales
        |  join store on (store_sales.ss_store_sk = store.s_store_sk)
        |  join customer_demographics on (store_sales.ss_cdemo_sk = customer_demographics.cd_demo_sk)
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |where
        |  ss_sold_date_sk between 366 and 730 -- partition key filter
        |  and d_year = 2021
        |  and s_state in ('state_0', 'state_1', 'state_2', 'state_3', 'state_4', 'state_5')
        |  and cd_gender = 'M'
        |  and cd_marital_status = 'S'
        |  and cd_education_status = 'College'
        |group by
        |  -- rollup(i_item_id, s_state)
        |  i_item_id,
        |  s_state
        |order by
        |  i_item_id,
        |  s_state
        |limit 100""".stripMargin),

    ("q3",
      """select
        |  dt.d_year,
        |  item.i_brand brand,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) sum_agg_cents
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join date_dim dt on (dt.d_date_sk = store_sales.ss_sold_date_sk)
        |where
        |  item.i_manufact_id = 28
        |  and dt.d_moy = 11
        |  and (ss_sold_date_sk between 305 and 334
        |    or ss_sold_date_sk between 670 and 699
        |    or ss_sold_date_sk between 1035 and 1064
        |    or ss_sold_date_sk between 1400 and 1429)
        |group by
        |  d_year,
        |  item.i_brand
        |order by
        |  d_year,
        |  sum_agg_cents desc,
        |  brand
        |limit 100""".stripMargin),

    ("q34",
      """select
        |  c_last_name,
        |  c_first_name,
        |  c_salutation,
        |  c_preferred_cust_flag,
        |  ss_ticket_number,
        |  cnt
        |from
        |  (select
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    count(*) cnt
        |  from
        |    store_sales
        |    join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |  where
        |    date_dim.d_year in (2020, 2020 + 1, 2020 + 2)
        |    and (date_dim.d_dom between 1 and 3
        |      or date_dim.d_dom between 25 and 28)
        |    and (household_demographics.hd_buy_potential = '>10000'
        |      or household_demographics.hd_buy_potential = 'Unknown')
        |    and household_demographics.hd_vehicle_count > 0
        |    and (case when household_demographics.hd_vehicle_count > 0 then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count else null end) > 1.2
        |    and store.s_county in ('county_1', 'county_2', 'county_3', 'county_4')
        |    and ss_sold_date_sk between 0 and 1095 -- partition key filter
        |  group by
        |    ss_ticket_number,
        |    ss_customer_sk
        |  ) dn
        |join customer_dim on (dn.ss_customer_sk = customer_dim.c_customer_sk)
        |where
        |  cnt between 2 and 20
        |order by
        |  c_last_name,
        |  c_first_name,
        |  c_salutation,
        |  c_preferred_cust_flag desc,
        |  ss_ticket_number
        |limit 1000""".stripMargin),

    ("q42",
      """select
        |  d_year,
        |  i_category,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) as total_price_cents
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join date_dim dt on (dt.d_date_sk = store_sales.ss_sold_date_sk)
        |where
        |  item.i_manager_id = 1
        |  and dt.d_moy = 11
        |  and dt.d_year = 2021
        |  and ss_sold_date_sk between 670 and 699 -- partition key filter
        |group by
        |  d_year,
        |  i_category
        |order by
        |  total_price_cents desc,
        |  d_year,
        |  i_category
        |limit 100""".stripMargin),

    ("q43",
      """select
        |  s_store_name,
        |  s_store_id,
        |  cast(sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) * 100 as bigint) sun_sales_cents,
        |  cast(sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) * 100 as bigint) mon_sales_cents,
        |  cast(sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) * 100 as bigint) tue_sales_cents,
        |  cast(sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) * 100 as bigint) wed_sales_cents,
        |  cast(sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) * 100 as bigint) thu_sales_cents,
        |  cast(sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) * 100 as bigint) fri_sales_cents,
        |  cast(sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) * 100 as bigint) sat_sales_cents
        |from
        |  store_sales
        |  join store on (store_sales.ss_store_sk = store.s_store_sk)
        |  join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |where
        |  s_gmt_offset = -5
        |  and d_year = 2021
        |  and ss_sold_date_sk between 366 and 730 -- partition key filter
        |group by
        |  s_store_name,
        |  s_store_id
        |order by
        |  s_store_name,
        |  s_store_id
        |limit 100""".stripMargin),

    ("q46",
      """select
        |  c_last_name,
        |  c_first_name,
        |  current_addr.ca_city home_city,
        |  bought_city,
        |  ss_ticket_number,
        |  amt_cents,
        |  profit_cents
        |from
        |  (select
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    ca_city bought_city,
        |    cast(sum(ss_coupon_amt) * 100 as bigint) amt_cents,
        |    cast(sum(ss_net_profit) * 100 as bigint) profit_cents
        |  from
        |    store_sales
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    join customer_address on (store_sales.ss_addr_sk = customer_address.ca_address_sk)
        |  where
        |    store.s_city in ('city_1', 'city_2', 'city_3', 'city_4', 'city_5')
        |    and (household_demographics.hd_dep_count = 4
        |      or household_demographics.hd_vehicle_count = 3)
        |    and date_dim.d_dow in (1, 7)
        |    and date_dim.d_year in (2021, 2021 + 1, 2021 + 2)
        |    -- partition key filter: the 2021-Q1 weekend days, enumerated
        |    and ss_sold_date_sk in (367, 368, 374, 375, 381, 382, 388, 389, 395, 396, 402, 403,
        |                            409, 410, 416, 417, 423, 424, 430, 431, 437, 438, 444, 445,
        |                            451, 452)
        |  group by
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    ss_addr_sk,
        |    ca_city
        |  ) dn
        |  join customer_dim on (dn.ss_customer_sk = customer_dim.c_customer_sk)
        |  join customer_address current_addr on (customer_dim.c_address_sk = current_addr.ca_address_sk)
        |where
        |  current_addr.ca_city <> bought_city
        |order by
        |  c_last_name,
        |  c_first_name,
        |  home_city,
        |  bought_city,
        |  ss_ticket_number
        |limit 100""".stripMargin),

    ("q52",
      """select
        |  d_year,
        |  i_brand,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) ext_price_cents
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join date_dim dt on (store_sales.ss_sold_date_sk = dt.d_date_sk)
        |where
        |  i_manager_id = 1
        |  and d_moy = 12
        |  and d_year = 2021
        |  and ss_sold_date_sk between 700 and 730 -- partition key filter
        |group by
        |  d_year,
        |  i_brand
        |order by
        |  d_year,
        |  ext_price_cents desc,
        |  i_brand
        |limit 100""".stripMargin),

    ("q53",
      """select
        |  *
        |from
        |  (select
        |    i_manufact_id,
        |    d_qoy,
        |    cast(sum(ss_sales_price) * 100 as bigint) sum_sales_cents
        |    -- avg(sum(ss_sales_price)) over(partition by i_manufact_id) avg_quarterly_sales
        |  from
        |    store_sales
        |    join item on (store_sales.ss_item_sk = item.i_item_sk)
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |  where
        |    ss_sold_date_sk between 366 and 730 -- partition key filter
        |    and d_month_seq in (1452, 1452 + 1, 1452 + 2, 1452 + 3, 1452 + 4, 1452 + 5, 1452 + 6, 1452 + 7, 1452 + 8, 1452 + 9, 1452 + 10, 1452 + 11)
        |    and (
        |          (i_category in ('cat_1', 'cat_2', 'cat_3')
        |            and i_class in ('class_1', 'class_2'))
        |          or
        |          (i_category in ('cat_4', 'cat_5')
        |            and i_class in ('class_3', 'class_4'))
        |        )
        |  group by
        |    i_manufact_id,
        |    d_qoy
        |  ) tmp1
        |order by
        |  sum_sales_cents,
        |  i_manufact_id,
        |  d_qoy
        |limit 100""".stripMargin),

    ("q55",
      """select
        |  i_brand,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) ext_price_cents
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |where
        |  i_manager_id = 36
        |  and d_moy = 12
        |  and d_year = 2021
        |  and ss_sold_date_sk between 700 and 730 -- partition key filter
        |group by
        |  i_brand
        |order by
        |  ext_price_cents desc,
        |  i_brand
        |limit 100""".stripMargin),

    ("q59",
      """select
        |  s_store_name1,
        |  s_store_id1,
        |  d_week_seq1,
        |  cast(cast(sun_sales1 * 100 as bigint) as double) / cast(sun_sales2 * 100 as bigint) r_sun,
        |  cast(cast(mon_sales1 * 100 as bigint) as double) / cast(mon_sales2 * 100 as bigint) r_mon,
        |  cast(cast(tue_sales1 * 100 as bigint) as double) / cast(tue_sales2 * 100 as bigint) r_tue,
        |  cast(cast(wed_sales1 * 100 as bigint) as double) / cast(wed_sales2 * 100 as bigint) r_wed,
        |  cast(cast(thu_sales1 * 100 as bigint) as double) / cast(thu_sales2 * 100 as bigint) r_thu,
        |  cast(cast(fri_sales1 * 100 as bigint) as double) / cast(fri_sales2 * 100 as bigint) r_fri,
        |  cast(cast(sat_sales1 * 100 as bigint) as double) / cast(sat_sales2 * 100 as bigint) r_sat
        |from
        |  (select
        |    s_store_name s_store_name1,
        |    wss.d_week_seq d_week_seq1,
        |    s_store_id s_store_id1,
        |    sun_sales sun_sales1,
        |    mon_sales mon_sales1,
        |    tue_sales tue_sales1,
        |    wed_sales wed_sales1,
        |    thu_sales thu_sales1,
        |    fri_sales fri_sales1,
        |    sat_sales sat_sales1
        |  from
        |    (select
        |      d_week_seq,
        |      ss_store_sk,
        |      sum(case when(d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
        |      sum(case when(d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
        |      sum(case when(d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
        |      sum(case when(d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
        |      sum(case when(d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
        |      sum(case when(d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
        |      sum(case when(d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
        |    from
        |      store_sales
        |      join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    where
        |      ss_sold_date_sk between 366 and 1095 -- partition key filter
        |    group by
        |      d_week_seq,
        |      ss_store_sk
        |    ) wss
        |    join store on (wss.ss_store_sk = store.s_store_sk)
        |    join date_dim d on (wss.d_week_seq = d.d_week_seq)
        |  where
        |    d_month_seq between 1452 and 1452 + 11
        |  ) y
        |  join
        |  (select
        |    s_store_name s_store_name2,
        |    wss.d_week_seq d_week_seq2,
        |    s_store_id s_store_id2,
        |    sun_sales sun_sales2,
        |    mon_sales mon_sales2,
        |    tue_sales tue_sales2,
        |    wed_sales wed_sales2,
        |    thu_sales thu_sales2,
        |    fri_sales fri_sales2,
        |    sat_sales sat_sales2
        |  from
        |    (select
        |      d_week_seq,
        |      ss_store_sk,
        |      sum(case when(d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
        |      sum(case when(d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
        |      sum(case when(d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
        |      sum(case when(d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
        |      sum(case when(d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
        |      sum(case when(d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
        |      sum(case when(d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
        |    from
        |      store_sales
        |      join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    where
        |      ss_sold_date_sk between 366 and 1095 -- partition key filter
        |    group by
        |      d_week_seq,
        |      ss_store_sk
        |    ) wss
        |    join store on (wss.ss_store_sk = store.s_store_sk)
        |    join date_dim d on (wss.d_week_seq = d.d_week_seq)
        |  where
        |    d_month_seq between 1452 + 12 and 1452 + 23
        |  ) x
        |  on (y.s_store_id1 = x.s_store_id2)
        |where
        |  d_week_seq1 = d_week_seq2 - 52
        |order by
        |  s_store_name1,
        |  s_store_id1,
        |  d_week_seq1
        |limit 100""".stripMargin),

    ("q63",
      """select
        |  *
        |from
        |  (select
        |    i_manager_id,
        |    d_moy,
        |    cast(sum(ss_sales_price) * 100 as bigint) sum_sales_cents
        |    -- avg(sum(ss_sales_price)) over(partition by i_manager_id) avg_monthly_sales
        |  from
        |    store_sales
        |    join item on (store_sales.ss_item_sk = item.i_item_sk)
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |  where
        |    ss_sold_date_sk between 366 and 730 -- partition key filter
        |    and d_month_seq in (1452, 1452 + 1, 1452 + 2, 1452 + 3, 1452 + 4, 1452 + 5, 1452 + 6, 1452 + 7, 1452 + 8, 1452 + 9, 1452 + 10, 1452 + 11)
        |    and (
        |          (i_category in ('cat_1', 'cat_2', 'cat_3')
        |            and i_class in ('class_1', 'class_2'))
        |          or
        |          (i_category in ('cat_4', 'cat_5')
        |            and i_class in ('class_3', 'class_4'))
        |        )
        |  group by
        |    i_manager_id,
        |    d_moy
        |  ) tmp1
        |order by
        |  i_manager_id,
        |  sum_sales_cents,
        |  d_moy
        |limit 100""".stripMargin),

    ("q65",
      """select
        |  s_store_name,
        |  i_item_desc,
        |  cast(sc.revenue * 100 as bigint) revenue_cents,
        |  cast(cast(i_current_price * 100 as bigint) as double) / 100 i_current_price,
        |  cast(cast(i_wholesale_cost * 100 as bigint) as double) / 100 i_wholesale_cost,
        |  i_brand
        |from
        |  (select
        |    ss_store_sk,
        |    ss_item_sk,
        |    sum(ss_sales_price) as revenue
        |  from
        |    store_sales
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |  where
        |    ss_sold_date_sk between 366 and 730 -- partition key filter
        |    and d_month_seq between 1452 and 1452 + 11
        |  group by
        |    ss_store_sk,
        |    ss_item_sk
        |  ) sc
        |  join item on (sc.ss_item_sk = item.i_item_sk)
        |  join store on (sc.ss_store_sk = store.s_store_sk)
        |  join
        |  (select
        |    ss_store_sk,
        |    cast(sum(cast(revenue * 100 as bigint)) as bigint) as sum_rev_c,
        |    count(*) as item_cnt
        |  from
        |    (select
        |      ss_store_sk,
        |      ss_item_sk,
        |      sum(ss_sales_price) as revenue
        |    from
        |      store_sales
        |      join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    where
        |      ss_sold_date_sk between 366 and 730 -- partition key filter
        |      and d_month_seq between 1452 and 1452 + 11
        |    group by
        |      ss_store_sk,
        |      ss_item_sk
        |    ) sa
        |  group by
        |    ss_store_sk
        |  ) sb on (sc.ss_store_sk = sb.ss_store_sk)
        |where
        |  -- revenue <= 0.1 * avg(revenue), cross-multiplied integer-exact
        |  cast(sc.revenue * 100 as bigint) * 10 * sb.item_cnt <= sb.sum_rev_c
        |order by
        |  s_store_name,
        |  i_item_desc,
        |  revenue_cents
        |limit 100""".stripMargin),

    ("q68",
      """select
        |  c_last_name,
        |  c_first_name,
        |  current_addr.ca_city home_city,
        |  bought_city,
        |  ss_ticket_number,
        |  extended_price_cents,
        |  coupon_cents,
        |  list_price_cents
        |from
        |  (select
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    ca_city bought_city,
        |    cast(sum(ss_ext_sales_price) * 100 as bigint) extended_price_cents,
        |    cast(sum(ss_ext_list_price) * 100 as bigint) list_price_cents,
        |    cast(sum(ss_coupon_amt) * 100 as bigint) coupon_cents
        |  from
        |    store_sales
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    join customer_address on (store_sales.ss_addr_sk = customer_address.ca_address_sk)
        |  where
        |    store.s_city in ('city_1', 'city_2')
        |    and (household_demographics.hd_dep_count = 4
        |      or household_demographics.hd_vehicle_count = 3)
        |    and d_date between '2021-01-01' and '2021-03-31'
        |    and ss_sold_date_sk between 366 and 455 -- partition key filter (3 months)
        |  group by
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    ss_addr_sk,
        |    ca_city
        |  ) dn
        |  join customer_dim on (dn.ss_customer_sk = customer_dim.c_customer_sk)
        |  join customer_address current_addr on (customer_dim.c_address_sk = current_addr.ca_address_sk)
        |where
        |  current_addr.ca_city <> bought_city
        |order by
        |  c_last_name,
        |  ss_ticket_number
        |limit 100""".stripMargin),

    ("q7",
      """select
        |  i_item_id,
        |  avg(ss_quantity) agg1,
        |  cast(cast(sum(ss_list_price * 100) as bigint) as double) / count(ss_list_price) / 100 agg2,
        |  cast(cast(sum(ss_coupon_amt * 100) as bigint) as double) / count(ss_coupon_amt) / 100 agg3,
        |  cast(cast(sum(ss_sales_price * 100) as bigint) as double) / count(ss_sales_price) / 100 agg4
        |from
        |  store_sales
        |  join customer_demographics on (store_sales.ss_cdemo_sk = customer_demographics.cd_demo_sk)
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join promotion on (store_sales.ss_promo_sk = promotion.p_promo_sk)
        |  join date_dim on (ss_sold_date_sk = d_date_sk)
        |where
        |  cd_gender = 'M'
        |  and cd_marital_status = 'S'
        |  and cd_education_status = 'College'
        |  and (p_channel_email = 'N'
        |    or p_channel_tv = 'N')
        |  and d_year = 2021
        |  and ss_sold_date_sk between 366 and 730 -- partition key filter
        |group by
        |  i_item_id
        |order by
        |  i_item_id
        |limit 100""".stripMargin),

    ("q73",
      """select
        |  c_last_name,
        |  c_first_name,
        |  c_salutation,
        |  c_preferred_cust_flag,
        |  ss_ticket_number,
        |  cnt
        |from
        |  (select
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    count(*) cnt
        |  from
        |    store_sales
        |    join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    -- join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |  where
        |    store.s_county in ('county_5', 'county_6', 'county_7', 'county_8')
        |    and (household_demographics.hd_buy_potential = '>10000'
        |      or household_demographics.hd_buy_potential = 'Unknown')
        |    and household_demographics.hd_vehicle_count > 0
        |    and case when household_demographics.hd_vehicle_count > 0 then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count else null end > 1
        |    and ss_sold_date_sk between 366 and 455 -- partition key filter (3 months)
        |  group by
        |    ss_ticket_number,
        |    ss_customer_sk
        |  ) dj
        |  join customer_dim on (dj.ss_customer_sk = customer_dim.c_customer_sk)
        |where
        |  cnt between 1 and 5
        |order by
        |  cnt desc,
        |  c_last_name,
        |  c_first_name,
        |  c_salutation,
        |  ss_ticket_number
        |limit 1000""".stripMargin),

    ("q79",
      """select
        |  c_last_name,
        |  c_first_name,
        |  substr(s_city, 1, 30) as city30,
        |  ss_ticket_number,
        |  amt_cents,
        |  profit_cents
        |from
        |  (select
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    s_city,
        |    cast(sum(ss_coupon_amt) * 100 as bigint) amt_cents,
        |    cast(sum(ss_net_profit) * 100 as bigint) profit_cents
        |  from
        |    store_sales
        |    join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |  where
        |    store.s_number_employees between 200 and 295
        |    and (household_demographics.hd_dep_count = 6
        |      or household_demographics.hd_vehicle_count > 2)
        |    and date_dim.d_dow = 1
        |    and date_dim.d_year in (2021, 2021 + 1, 2021 + 2)
        |    and d_date between '2021-01-01' and '2021-03-31'
        |    and ss_sold_date_sk between 366 and 455 -- partition key filter
        |  group by
        |    ss_ticket_number,
        |    ss_customer_sk,
        |    ss_addr_sk,
        |    s_city
        |  ) ms
        |  join customer_dim on (ms.ss_customer_sk = customer_dim.c_customer_sk)
        |order by
        |  c_last_name,
        |  c_first_name,
        |  city30,
        |  profit_cents,
        |  ss_ticket_number
        |limit 100""".stripMargin),

    ("q8",
      """select s_store_name
        |      ,cast(sum(ss_net_profit) * 100 as bigint) profit_cents
        | from store_sales
        |     ,date_dim
        |     ,store,
        |     (select distinct a01.ca_zip
        |     from
        |     (SELECT substr(ca_zip,1,5) ca_zip
        |      FROM customer_address
        |      WHERE substr(ca_zip,1,5) IN ('63652', '71378', '78518', '14787', '15749', '16685', '16704', '17613',
        |      '25532', '25814', '27380', '39850', '51979', '52428', '55556', '56351', '57096', '64580', '69763',
        |      '75084', '77859', '81413', '89048', '94886', '97255', '99925', '10957', '11332', '11586', '12155',
        |      '12278', '12598', '12606', '12710', '13217', '13687', '14632', '15404', '15689', '15707')) a01
        |     inner join
        |     (select ca_zip
        |      from (SELECT substr(ca_zip,1,5) ca_zip,count(*) cnt
        |            FROM customer_address, customer_dim
        |            WHERE ca_address_sk = c_address_sk and
        |                  c_preferred_cust_flag='Y'
        |            group by ca_zip
        |            having count(*) > 1)A1
        |      ) b11
        |      on (a01.ca_zip = b11.ca_zip )) A2
        | where ss_store_sk = s_store_sk
        |  and ss_sold_date_sk = d_date_sk
        |  and ss_sold_date_sk between 456 and 546 -- partition key filter
        |  and d_qoy = 2 and d_year = 2021
        |  and (substr(s_zip,1,2) = substr(a2.ca_zip,1,2))
        | group by s_store_name
        | order by s_store_name
        |limit 100""".stripMargin),

    ("q82",
      """select
        |  i_item_id,
        |  i_item_desc,
        |  cast(cast(i_current_price * 100 as bigint) as double) / 100 i_current_price
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join inventory on (item.i_item_sk = inventory.inv_item_sk)
        |  -- join date_dim on (inventory.inv_date_sk = date_dim.d_date_sk)
        |where
        |  i_current_price between 30 and 30 + 30
        |  and i_manufact_id in (75, 20, 53, 86)
        |  and inv_quantity_on_hand between 100 and 500
        |  and inv_date_sk between 700 and 760 -- partition key filter (~60 days)
        |group by
        |  i_item_id,
        |  i_item_desc,
        |  i_current_price
        |order by
        |  i_item_id
        |limit 100""".stripMargin),

    ("q89",
      """select
        |  *
        |from
        |  (select
        |    i_category,
        |    i_class,
        |    i_brand,
        |    s_store_name,
        |    s_store_id,
        |    d_moy,
        |    cast(sum(ss_sales_price) * 100 as bigint) sum_sales_cents
        |    -- avg(sum(ss_sales_price)) over (partition by i_category, i_brand, s_store_name) avg_monthly_sales
        |  from
        |    store_sales
        |    join item on (store_sales.ss_item_sk = item.i_item_sk)
        |    join store on (store_sales.ss_store_sk = store.s_store_sk)
        |    join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |  where
        |    ss_sold_date_sk between 366 and 730 -- partition key filter
        |    and d_year in (2021)
        |    and ((i_category in ('cat_1', 'cat_2', 'cat_3')
        |          and i_class in ('class_1', 'class_2'))
        |        or (i_category in ('cat_4', 'cat_5')
        |            and i_class in ('class_3', 'class_4'))
        |        )
        |  group by
        |    i_category,
        |    i_class,
        |    i_brand,
        |    s_store_name,
        |    s_store_id,
        |    d_moy
        |  ) tmp1
        |order by
        |  sum_sales_cents,
        |  s_store_name,
        |  i_category,
        |  i_class,
        |  i_brand,
        |  s_store_id,
        |  d_moy
        |limit 100""".stripMargin),

    ("q98",
      """select
        |  i_item_id,
        |  i_item_desc,
        |  i_category,
        |  i_class,
        |  cast(cast(i_current_price * 100 as bigint) as double) / 100 i_current_price,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) as itemrevenue_cents
        |  -- sum(ss_ext_sales_price) * 100 / sum(sum(ss_ext_sales_price)) over (partition by i_class) as revenueratio
        |from
        |  store_sales
        |  join item on (store_sales.ss_item_sk = item.i_item_sk)
        |  join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |where
        |  i_category in ('cat_1', 'cat_2', 'cat_3')
        |  and ss_sold_date_sk between 400 and 429 -- partition key filter (1 calendar month)
        |  and d_date between '2021-02-04' and '2021-03-05'
        |group by
        |  i_item_id,
        |  i_item_desc,
        |  i_category,
        |  i_class,
        |  i_current_price
        |order by
        |  i_category,
        |  i_class,
        |  i_item_id,
        |  i_item_desc
        |limit 1000""".stripMargin),

    ("qSsMax",
      """select
        |  count(*) as total,
        |  count(ss_sold_date_sk) as not_null_total,
        |  count(distinct ss_sold_date_sk) as unique_days,
        |  max(ss_sold_date_sk) as max_ss_sold_date_sk,
        |  max(ss_sold_time_sk) as max_ss_sold_time_sk,
        |  max(ss_item_sk) as max_ss_item_sk,
        |  max(ss_customer_sk) as max_ss_customer_sk,
        |  max(ss_cdemo_sk) as max_ss_cdemo_sk,
        |  max(ss_hdemo_sk) as max_ss_hdemo_sk,
        |  max(ss_addr_sk) as max_ss_addr_sk,
        |  max(ss_store_sk) as max_ss_store_sk,
        |  max(ss_promo_sk) as max_ss_promo_sk
        |from store_sales""".stripMargin))

  /** Pre-rewrite "original" forms (reference ImpalaKitQueries.scala:
    * 1021-1462): qualified JOIN..ON without parens, no surrogate-key
    * pruning (full-fact scans), q59's MAPJOIN broadcast hints. */
  val original: Seq[(String, String)] = Seq(

    ("q3",
      """select  d_year
        |      ,item.i_brand brand
        |      ,cast(sum(ss_ext_sales_price) * 100 as bigint) sum_agg_cents
        | from  date_dim dt
        | JOIN store_sales on dt.d_date_sk = store_sales.ss_sold_date_sk
        | JOIN item on store_sales.ss_item_sk = item.i_item_sk
        | where
        | item.i_manufact_id = 28
        | and dt.d_moy = 12
        | group by d_year
        |      ,item.i_brand
        | order by d_year
        |      ,sum_agg_cents desc
        |      ,brand
        | limit 100""".stripMargin),

    ("q7",
      """select  i_item_id,
        |  avg(ss_quantity) agg1,
        |  cast(cast(sum(ss_list_price * 100) as bigint) as double) / count(ss_list_price) / 100 agg2,
        |  cast(cast(sum(ss_coupon_amt * 100) as bigint) as double) / count(ss_coupon_amt) / 100 agg3,
        |  cast(cast(sum(ss_sales_price * 100) as bigint) as double) / count(ss_sales_price) / 100 agg4
        | from store_sales
        | JOIN customer_demographics ON store_sales.ss_cdemo_sk = customer_demographics.cd_demo_sk
        | JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        | JOIN item ON store_sales.ss_item_sk = item.i_item_sk
        | JOIN promotion ON store_sales.ss_promo_sk = promotion.p_promo_sk
        | where
        | cd_gender = 'F' and
        |  cd_marital_status = 'W' and
        |  cd_education_status = 'Primary' and
        | (p_channel_email = 'N' or p_channel_dmail = 'N') and
        |  d_year = 2021
        | group by i_item_id
        | order by i_item_id
        | limit 100""".stripMargin),

    ("q19",
      """select  i_brand, i_manufact_id,
        |  cast(sum(ss_ext_sales_price) * 100 as bigint) ext_price_cents
        | from date_dim
        | JOIN store_sales ON date_dim.d_date_sk = store_sales.ss_sold_date_sk
        | JOIN item ON store_sales.ss_item_sk = item.i_item_sk
        | JOIN customer_dim ON store_sales.ss_customer_sk = customer_dim.c_customer_sk
        | JOIN customer_address ON customer_dim.c_address_sk = customer_address.ca_address_sk
        | JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        | where
        | i_manager_id = 7
        | and d_moy = 11
        | and d_year = 2021
        | and substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
        | group by i_brand
        |      ,i_manufact_id
        | order by ext_price_cents desc
        |      ,i_brand
        |      ,i_manufact_id
        | limit 100""".stripMargin),

    ("q27",
      """select  i_item_id,
        |  s_state,
        |  avg(ss_quantity) agg1,
        |  cast(cast(sum(ss_list_price * 100) as bigint) as double) / count(ss_list_price) / 100 agg2,
        |  cast(cast(sum(ss_coupon_amt * 100) as bigint) as double) / count(ss_coupon_amt) / 100 agg3,
        |  cast(cast(sum(ss_sales_price * 100) as bigint) as double) / count(ss_sales_price) / 100 agg4
        | from store_sales
        | JOIN customer_demographics ON store_sales.ss_cdemo_sk = customer_demographics.cd_demo_sk
        | JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        | JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        | JOIN item ON store_sales.ss_item_sk = item.i_item_sk
        | where
        | cd_gender = 'F' and
        |  cd_marital_status = 'W' and
        |  cd_education_status = 'Primary' and
        | d_year = 2021 and
        |  s_state = 'state_3'
        | group by i_item_id, s_state
        | order by i_item_id
        |      ,s_state
        | limit 100""".stripMargin),

    ("q34",
      """select c_last_name
        |      ,c_first_name
        |      ,c_salutation
        |      ,c_preferred_cust_flag
        |      ,ss_ticket_number
        |      ,cnt from
        | (select ss_ticket_number
        |       ,ss_customer_sk
        |       ,count(*) cnt
        |  from store_sales
        |  JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |  JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        |  JOIN household_demographics ON store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |  where
        |  (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
        |  and (household_demographics.hd_buy_potential = '>10000' or
        |       household_demographics.hd_buy_potential = 'Unknown')
        |  and household_demographics.hd_vehicle_count > 0
        |  and (case when household_demographics.hd_vehicle_count > 0
        |       then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count
        |       else null
        |       end) > 1.2
        |  and date_dim.d_year in (2020, 2020 + 1, 2020 + 2)
        |  and store.s_county in ('county_1', 'county_1', 'county_1', 'county_1',
        |      'county_2', 'county_3', 'county_4', 'county_4')
        |  group by ss_ticket_number, ss_customer_sk) dn
        | JOIN customer_dim ON dn.ss_customer_sk = customer_dim.c_customer_sk
        | WHERE
        | cnt between 2 and 20
        | order by
        |  c_last_name,
        |  c_first_name,
        |  c_salutation,
        |  c_preferred_cust_flag desc,
        |  ss_ticket_number""".stripMargin),

    ("q42",
      """select  d_year
        |      ,item.i_category
        |      ,cast(sum(ss_ext_sales_price) * 100 as bigint) as s_cents
        | from   date_dim dt
        | JOIN store_sales ON dt.d_date_sk = store_sales.ss_sold_date_sk
        | JOIN item ON store_sales.ss_item_sk = item.i_item_sk
        | where
        | item.i_manager_id = 1
        | and dt.d_moy = 12
        | and dt.d_year = 2021
        | group by  d_year
        |      ,item.i_category
        | order by       s_cents desc, d_year
        |      ,i_category
        | limit 100""".stripMargin),

    ("q43",
      """select  s_store_name, s_store_id,
        |  cast(sum(case when (d_day_name='Sunday') then ss_sales_price else null end) * 100 as bigint) sun_sales_cents,
        | cast(sum(case when (d_day_name='Monday') then ss_sales_price else null end) * 100 as bigint) mon_sales_cents,
        | cast(sum(case when (d_day_name='Tuesday') then ss_sales_price else null end) * 100 as bigint) tue_sales_cents,
        | cast(sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) * 100 as bigint) wed_sales_cents,
        | cast(sum(case when (d_day_name='Thursday') then ss_sales_price else null end) * 100 as bigint) thu_sales_cents,
        | cast(sum(case when (d_day_name='Friday') then ss_sales_price else null end) * 100 as bigint) fri_sales_cents,
        | cast(sum(case when (d_day_name='Saturday') then ss_sales_price else null end) * 100 as bigint) sat_sales_cents
        | from date_dim
        | JOIN store_sales ON date_dim.d_date_sk = store_sales.ss_sold_date_sk
        | JOIN store ON store.s_store_sk = store_sales.ss_store_sk
        | where
        | s_gmt_offset = -5 and
        |  d_year = 2021
        | group by s_store_name, s_store_id
        | order by s_store_name, s_store_id
        | limit 100""".stripMargin),

    ("q46",
      """select  c_last_name
        |      ,c_first_name
        |      ,current_addr.ca_city home_city
        |      ,bought_city
        |      ,ss_ticket_number
        |      ,amt_cents, profit_cents
        | from
        | (select ss_ticket_number
        |       ,ss_customer_sk
        |       ,ca_city as bought_city
        |       ,cast(sum(ss_coupon_amt) * 100 as bigint) as amt_cents
        |       ,cast(sum(ss_net_profit) * 100 as bigint) as profit_cents
        |  from store_sales
        |  JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |  JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        |  JOIN household_demographics ON store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |  JOIN customer_address ON store_sales.ss_addr_sk = customer_address.ca_address_sk
        |  where
        |  (household_demographics.hd_dep_count = 4 or
        |    household_demographics.hd_vehicle_count = 3)
        |  and date_dim.d_dow in (1, 7)
        |  and date_dim.d_year in (2021, 2021 + 1, 2021 + 2)
        |  and store.s_city in ('city_1', 'city_2', 'city_2', 'city_2', 'city_2')
        |  group by ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn
        | JOIN customer_dim ON dn.ss_customer_sk = customer_dim.c_customer_sk
        | JOIN customer_address current_addr ON customer_dim.c_address_sk = current_addr.ca_address_sk
        | where
        | current_addr.ca_city <> dn.bought_city
        | order by c_last_name
        |      ,c_first_name
        |      ,home_city
        |      ,bought_city
        |      ,ss_ticket_number
        | limit 100""".stripMargin),

    ("q52",
      """select  d_year
        |      ,item.i_brand brand
        |      ,cast(sum(ss_ext_sales_price) * 100 as bigint) as ext_price_cents
        | from date_dim
        | JOIN store_sales ON date_dim.d_date_sk = store_sales.ss_sold_date_sk
        | JOIN item ON store_sales.ss_item_sk = item.i_item_sk
        | where
        | item.i_manager_id = 1
        | and date_dim.d_moy = 12
        | and date_dim.d_year = 2021
        | group by d_year
        |      ,item.i_brand
        | order by d_year
        |      ,ext_price_cents desc
        |      ,brand
        | limit 100""".stripMargin),

    ("q55",
      """select  i_brand as brand,
        |  cast(sum(store_sales.ss_ext_sales_price) * 100 as bigint) ext_price_cents
        | from date_dim
        | JOIN store_sales ON date_dim.d_date_sk = store_sales.ss_sold_date_sk
        | JOIN item ON store_sales.ss_item_sk = item.i_item_sk
        | where
        | i_manager_id = 36
        | and d_moy = 12
        | and d_year = 2021
        | group by i_brand
        | order by ext_price_cents desc, brand
        | limit 100""".stripMargin),

    ("q59",
      """select
        |  s_store_name1,
        |  s_store_id1,
        |  d_week_seq1,
        |  cast(cast(sun_sales1 * 100 as bigint) as double) / cast(sun_sales2 * 100 as bigint) r_sun,
        |  cast(cast(mon_sales1 * 100 as bigint) as double) / cast(mon_sales2 * 100 as bigint) r_mon,
        |  cast(cast(tue_sales1 * 100 as bigint) as double) / cast(tue_sales2 * 100 as bigint) r_tue,
        |  cast(cast(wed_sales1 * 100 as bigint) as double) / cast(wed_sales2 * 100 as bigint) r_wed,
        |  cast(cast(thu_sales1 * 100 as bigint) as double) / cast(thu_sales2 * 100 as bigint) r_thu,
        |  cast(cast(fri_sales1 * 100 as bigint) as double) / cast(fri_sales2 * 100 as bigint) r_fri,
        |  cast(cast(sat_sales1 * 100 as bigint) as double) / cast(sat_sales2 * 100 as bigint) r_sat
        |from
        |  (select
        |    /*+ MAPJOIN(store, date_dim) */
        |    s_store_name s_store_name1,
        |    wss.d_week_seq d_week_seq1,
        |    s_store_id s_store_id1,
        |    sun_sales sun_sales1,
        |    mon_sales mon_sales1,
        |    tue_sales tue_sales1,
        |    wed_sales wed_sales1,
        |    thu_sales thu_sales1,
        |    fri_sales fri_sales1,
        |    sat_sales sat_sales1
        |  from
        |    (select
        |      /*+ MAPJOIN(date_dim) */
        |      d_week_seq,
        |      ss_store_sk,
        |      sum(case when(d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
        |      sum(case when(d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
        |      sum(case when(d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
        |      sum(case when(d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
        |      sum(case when(d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
        |      sum(case when(d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
        |      sum(case when(d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
        |    from
        |      store_sales
        |      join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    group by
        |      d_week_seq,
        |      ss_store_sk
        |    ) wss
        |    join store on (wss.ss_store_sk = store.s_store_sk)
        |    join date_dim d on (wss.d_week_seq = d.d_week_seq)
        |  where
        |    d_month_seq between 1452 and 1452 + 11
        |  ) y
        |  join
        |  (select
        |    /*+ MAPJOIN(store, date_dim) */
        |    s_store_name s_store_name2,
        |    wss.d_week_seq d_week_seq2,
        |    s_store_id s_store_id2,
        |    sun_sales sun_sales2,
        |    mon_sales mon_sales2,
        |    tue_sales tue_sales2,
        |    wed_sales wed_sales2,
        |    thu_sales thu_sales2,
        |    fri_sales fri_sales2,
        |    sat_sales sat_sales2
        |  from
        |    (select
        |      /*+ MAPJOIN(date_dim) */
        |      d_week_seq,
        |      ss_store_sk,
        |      sum(case when(d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
        |      sum(case when(d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
        |      sum(case when(d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
        |      sum(case when(d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
        |      sum(case when(d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
        |      sum(case when(d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
        |      sum(case when(d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
        |    from
        |      store_sales
        |      join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        |    group by
        |      d_week_seq,
        |      ss_store_sk
        |    ) wss
        |    join store on (wss.ss_store_sk = store.s_store_sk)
        |    join date_dim d on (wss.d_week_seq = d.d_week_seq)
        |  where
        |    d_month_seq between 1452 + 12 and 1452 + 23
        |  ) x
        |  on (y.s_store_id1 = x.s_store_id2)
        |where
        |  d_week_seq1 = d_week_seq2 - 52
        |order by
        |  s_store_name1,
        |  s_store_id1,
        |  d_week_seq1
        |limit 100""".stripMargin),

    ("q68",
      """select  c_last_name, c_first_name, current_addr.ca_city home_city
        |      ,bought_city, ss_ticket_number, extended_price_cents
        |      ,coupon_cents, list_price_cents
        | from (select ss_ticket_number
        |       ,ss_customer_sk
        |       ,ca_city as bought_city
        |       ,cast(sum(ss_ext_sales_price) * 100 as bigint) as extended_price_cents
        |       ,cast(sum(ss_ext_list_price) * 100 as bigint) as list_price_cents
        |       ,cast(sum(ss_coupon_amt) * 100 as bigint) as coupon_cents
        |  from store_sales
        |  JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |  JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        |  JOIN household_demographics ON store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |  JOIN customer_address ON store_sales.ss_addr_sk = customer_address.ca_address_sk
        |  where
        |  date_dim.d_dom between 1 and 2
        |  and (household_demographics.hd_dep_count = 4 or
        |       household_demographics.hd_vehicle_count = 3)
        |  and date_dim.d_year in (2020, 2020 + 1, 2020 + 2)
        |  and store.s_city in ('city_1', 'city_2')
        |  group by ss_ticket_number
        |      ,ss_customer_sk
        |      ,ss_addr_sk, ca_city) dn
        | JOIN customer_dim ON dn.ss_customer_sk = customer_dim.c_customer_sk
        | JOIN customer_address current_addr ON customer_dim.c_address_sk = current_addr.ca_address_sk
        | where
        | current_addr.ca_city <> dn.bought_city
        | order by c_last_name
        |      ,ss_ticket_number
        | limit 100""".stripMargin),

    ("q73",
      """select c_last_name
        |      ,c_first_name
        |      ,c_salutation
        |      ,c_preferred_cust_flag
        |      ,ss_ticket_number
        |      ,cnt from
        | (select ss_ticket_number
        |       ,ss_customer_sk
        |       ,count(*) cnt
        |  from store_sales
        |  JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |  JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        |  JOIN household_demographics ON store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |  where
        |  date_dim.d_dom between 1 and 2
        |  and (household_demographics.hd_buy_potential = '>10000' or
        |       household_demographics.hd_buy_potential = 'Unknown')
        |  and household_demographics.hd_vehicle_count > 0
        |  and case when household_demographics.hd_vehicle_count > 0 then
        |       household_demographics.hd_dep_count / household_demographics.hd_vehicle_count else null end > 1
        |  and date_dim.d_year in (2020, 2020 + 1, 2020 + 2)
        |  and store.s_county in ('county_5', 'county_6', 'county_7', 'county_8')
        |  group by ss_ticket_number, ss_customer_sk) dj
        | JOIN customer_dim ON dj.ss_customer_sk = customer_dim.c_customer_sk
        | where
        | cnt between 2 and 5
        | order by cnt desc
        |      ,c_last_name
        |      ,c_first_name
        |      ,c_salutation
        |      ,ss_ticket_number""".stripMargin),

    ("q79",
      """select
        |  c_last_name, c_first_name, substr(s_city, 1, 30) as city30, ss_ticket_number, amt_cents, profit_cents
        |  from
        |  (select ss_ticket_number
        |        ,ss_customer_sk
        |        ,store.s_city
        |        ,cast(sum(ss_coupon_amt) * 100 as bigint) amt_cents
        |        ,cast(sum(ss_net_profit) * 100 as bigint) profit_cents
        |   from store_sales
        |   JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |   JOIN store ON store_sales.ss_store_sk = store.s_store_sk
        |   JOIN household_demographics ON store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |   where
        |   (household_demographics.hd_dep_count = 8 or household_demographics.hd_vehicle_count > 0)
        |   and date_dim.d_dow = 1
        |   and date_dim.d_year in (2020, 2020 + 1, 2020 + 2)
        |   and store.s_number_employees between 200 and 295
        |   group by ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms
        |   JOIN customer_dim on ms.ss_customer_sk = customer_dim.c_customer_sk
        | order by c_last_name, c_first_name, city30, profit_cents, ss_ticket_number
        | limit 100""".stripMargin),

    ("qSsMax",
      """select
        |  count(*) as total,
        |  count(ss_sold_date_sk) as not_null_total,
        |  count(distinct ss_sold_date_sk) as unique_days,
        |  max(ss_sold_date_sk) as max_ss_sold_date_sk,
        |  max(ss_sold_time_sk) as max_ss_sold_time_sk,
        |  max(ss_item_sk) as max_ss_item_sk,
        |  max(ss_customer_sk) as max_ss_customer_sk,
        |  max(ss_cdemo_sk) as max_ss_cdemo_sk,
        |  max(ss_hdemo_sk) as max_ss_hdemo_sk,
        |  max(ss_addr_sk) as max_ss_addr_sk,
        |  max(ss_store_sk) as max_ss_store_sk,
        |  max(ss_promo_sk) as max_ss_promo_sk
        |from store_sales""".stripMargin))

  /** name -> SQL for every ImpalaKit entry, catalog-prefixed. */
  val defs: Seq[(String, String)] =
    modified.map { case (n, s) => (s"impala_$n", s) } ++
      original.map { case (n, s) => (s"impala_orig_$n", s) }

  val byName: Map[String, String] = defs.toMap

  // Groupings (reference ImpalaKitQueries.scala:1465-1469) point at the
  // modified Impala-dialect variants, as in the reference.
  val interactive: Seq[String] =
    Seq("q19", "q42", "q52", "q55", "q63", "q68", "q73", "q98").map("impala_" + _)
  val reporting: Seq[String] =
    Seq("q3", "q7", "q27", "q43", "q53", "q89").map("impala_" + _)
  val deepAnalytic: Seq[String] =
    Seq("q34", "q46", "q59", "q65", "q79", "qSsMax").map("impala_" + _)
  val impalaKit: Seq[String] = interactive ++ reporting ++ deepAnalytic

  /** All 37 entries, DuckDB value-oracled over the retail snapshot. */
  val all: Seq[CatalogQuery] = defs.map { case (name, sql) =>
    CatalogQuery(
      name,
      s"ImpalaKit $name [retail snapshot, DuckDB-oracled]",
      (s, _) => { RetailData.views(s); s.sql(sql) },
      Some(RetailData.duckOracle(RetailQueries.duckDialect(sql))))
  }
}
