package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-DS-shaped retail star schema, regenerated from scratch: the full
  * 24-table inventory (three sales channels with returns facts, weekly
  * inventory, and the complete dimension set) that the reference drives
  * through dsdgen (`P/tpcds/Tables.scala`) — here every value is a pure
  * hash of (row id, seed), so any worker can generate any shard with no
  * coordination and checksums are cluster-stable.
  *
  * Column sets use the standard public TPC-DS column names, wide enough
  * to express the q1–q99 query shapes (date/month/week sequences, item
  * hierarchies, demographics, addresses, channel-specific page/site/
  * call-center dims, per-unit + extended money columns), without cloning
  * the spec's DDL text. Money columns are `DECIMAL(7,2)` per unit and
  * `DECIMAL(15,2)` extended, matching the reference's decimal-heavy DDL
  * (`P/tpcds/Tables.scala:283-297,605`); `tables(useDoubleForDecimal =
  * true)` rewrites them to double like the reference's toggle
  * (`P/tpcds/Tables.scala:106-116`).
  */
object StarSchema {

  private def h(c: Column, salt: Long, bound: Long) =
    pmod(xxhash64(c, lit(salt)), lit(bound))

  /** Uniform decimal(7,2) in [lo, hi) cents-exact. */
  private def money(c: Column, salt: Long, loCents: Long, hiCents: Long): Column =
    ((h(c, salt, hiCents - loCents) + loCents).cast(DecimalType(12, 0)) / 100)
      .cast(DecimalType(7, 2))

  private def pick(c: Column, salt: Long, vs: String*): Column =
    element_at(array(vs.map(lit): _*), (h(c, salt, vs.size) + 1).cast("int"))

  /** Calendar dimension: one row per day over `days` days from 2020-01-01. */
  def dateDim(spark: SparkSession, days: Int = 1461): DataFrame =
    spark.range(0, days)
      .select(
        col("id").cast("int").as("d_date_sk"),
        date_add(lit("2020-01-01").cast("date"), col("id").cast("int")).as("d_date"))
      .withColumn("d_year", year(col("d_date")).cast("int"))
      .withColumn("d_qoy", quarter(col("d_date")).cast("int"))
      .withColumn("d_moy", month(col("d_date")).cast("int"))
      .withColumn("d_dom", dayofmonth(col("d_date")).cast("int"))
      .withColumn("d_dow", dayofweek(col("d_date")).cast("int"))
      .withColumn("d_day_name", date_format(col("d_date"), "EEEE"))
      // monotonic sequences anchored like the spec's (1900-based months)
      .withColumn("d_month_seq", ((col("d_year") - 1900) * 12 + col("d_moy") - 1).cast("int"))
      .withColumn("d_week_seq", expr("d_date_sk div 7").cast("int"))
      .withColumn("d_quarter_name", concat(col("d_year"), lit("Q"), col("d_qoy")))
      .withColumn("d_holiday", when(h(col("d_date_sk"), 77, 20) === 0, "Y").otherwise("N"))

  def item(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("i_item_sk"),
        concat(lit("ITEM"), lpad(col("id").cast("string"), 8, "0")).as("i_item_id"),
        concat(lit("desc of item "), col("id"), lit(" "),
          pick(col("id"), seed + 60, "plain", "deluxe", "classic", "compact", "premium")).as("i_item_desc"),
        concat(lit("cat_"), h(col("id"), seed, 10)).as("i_category"),
        concat(lit("class_"), h(col("id"), seed + 61, 20)).as("i_class"),
        concat(lit("brand_"), h(col("id"), seed + 1, 50)).as("i_brand"),
        (h(col("id"), seed + 62, 100) + 1).cast("int").as("i_manufact_id"),
        (h(col("id"), seed + 63, 100) + 1).cast("int").as("i_manager_id"),
        money(col("id"), seed + 2, 1000, 10000).as("i_current_price"),
        money(col("id"), seed + 64, 500, 5000).as("i_wholesale_cost"),
        pick(col("id"), seed + 65, "red", "green", "blue", "ivory", "black",
          "white", "navy", "khaki", "beige", "coral", "plum", "mint").as("i_color"),
        pick(col("id"), seed + 66, "small", "medium", "large", "extra large",
          "economy", "N/A").as("i_size"),
        pick(col("id"), seed + 67, "Each", "Dozen", "Case", "Pallet", "Oz",
          "Lb").as("i_units"))
      // keep the legacy double list price for the rq* suite (derived
      // from the decimal so the two are consistent)
      .withColumn("i_list_price", col("i_current_price").cast("double"))

  def store(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("s_store_sk"),
        concat(lit("STORE"), lpad(col("id").cast("string"), 6, "0")).as("s_store_id"),
        concat(lit("Store "), col("id")).as("s_store_name"),
        concat(lit("state_"), h(col("id"), seed + 3, 10)).as("s_state"),
        concat(lit("county_"), h(col("id"), seed + 68, 30)).as("s_county"),
        concat(lit("city_"), h(col("id"), seed + 69, 60)).as("s_city"),
        lpad((h(col("id"), seed + 70, 90000) + 10000).cast("string"), 5, "0").as("s_zip"),
        h(col("id"), seed + 4, 5).cast("int").as("s_market"),
        (h(col("id"), seed + 71, 300) + 200).cast("int").as("s_number_employees"),
        ((h(col("id"), seed + 72, 9000) + 1000) * 100).cast("int").as("s_floor_space"),
        (h(col("id"), seed + 73, 4) - 8).cast("int").as("s_gmt_offset"))

  def customerDim(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("c_customer_sk"),
        concat(lit("CUST"), lpad(col("id").cast("string"), 10, "0")).as("c_customer_id"),
        pick(col("id"), seed + 130, "Mr.", "Mrs.", "Ms.", "Dr.", "Sir", "Miss").as("c_salutation"),
        concat(lit("first_"), h(col("id"), seed + 74, 500)).as("c_first_name"),
        concat(lit("last_"), h(col("id"), seed + 75, 800)).as("c_last_name"),
        when(h(col("id"), seed + 76, 2) === 0, "Y").otherwise("N").as("c_preferred_cust_flag"),
        (h(col("id"), seed + 5, 60) + 1940).cast("int").as("c_birth_year"),
        (h(col("id"), seed + 77, 12) + 1).cast("int").as("c_birth_month"),
        pick(col("id"), seed + 78, "United States", "Canada", "Mexico",
          "Germany", "Japan", "Brazil").as("c_birth_country"),
        when(h(col("id"), seed + 6, 2) === 0, "M").otherwise("F").as("c_gender"),
        h(col("id"), seed + 40, n).as("c_address_sk"),
        h(col("id"), seed + 41, 720).as("c_hdemo_sk"),
        h(col("id"), seed + 79, 7200).as("c_cdemo_sk"),
        (h(col("id"), seed + 80, 1000) + 50).cast("int").as("c_first_sales_date_sk"),
        (h(col("id"), seed + 80, 1000) + 80).cast("int").as("c_first_shipto_date_sk"))

  /** Cross-product demographics dimension (gender × marital × education
    * × ...), like the spec's fixed 1.9M-row table but compact. */
  def customerDemographics(spark: SparkSession, n: Long = 7200,
      seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("cd_demo_sk"),
        when(col("id") % 2 === 0, "M").otherwise("F").as("cd_gender"),
        element_at(array(lit("M"), lit("S"), lit("D"), lit("W"), lit("U")),
          ((col("id") / 2) % 5 + 1).cast("int")).as("cd_marital_status"),
        element_at(array(lit("Primary"), lit("Secondary"), lit("College"),
          lit("2 yr Degree"), lit("4 yr Degree"), lit("Advanced Degree"),
          lit("Unknown")), ((col("id") / 10) % 7 + 1).cast("int")).as("cd_education_status"),
        ((h(col("id"), seed + 81, 20) + 1) * 500).cast("int").as("cd_purchase_estimate"),
        pick(col("id"), seed + 82, "Low Risk", "Good", "High Risk", "Unknown").as("cd_credit_rating"),
        h(col("id"), seed + 83, 7).cast("int").as("cd_dep_count"),
        h(col("id"), seed + 84, 7).cast("int").as("cd_dep_employed_count"),
        h(col("id"), seed + 85, 7).cast("int").as("cd_dep_college_count"))

  /** Seconds-of-day dimension with hour/minute/shift attributes. */
  def timeDim(spark: SparkSession): DataFrame =
    spark.range(0, 86400)
      .select(
        col("id").as("t_time_sk"),
        (col("id") / 3600).cast("int").as("t_hour"),
        ((col("id") % 3600) / 60).cast("int").as("t_minute"))
      .withColumn("t_shift",
        when(col("t_hour") < 6, "night")
          .when(col("t_hour") < 12, "morning")
          .when(col("t_hour") < 18, "afternoon")
          .otherwise("evening"))
      .withColumn("t_meal_time",
        when(col("t_hour").between(6, 8), "breakfast")
          .when(col("t_hour").between(11, 13), "lunch")
          .when(col("t_hour").between(17, 20), "dinner"))

  def warehouse(spark: SparkSession, n: Long = 5, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("w_warehouse_sk"),
        concat(lit("Warehouse "), col("id")).as("w_warehouse_name"),
        concat(lit("state_"), h(col("id"), seed + 42, 10)).as("w_state"),
        concat(lit("county_"), h(col("id"), seed + 86, 30)).as("w_county"),
        concat(lit("city_"), h(col("id"), seed + 87, 60)).as("w_city"),
        ((h(col("id"), seed + 43, 900) + 100) * 1000).as("w_sqft"))

  def shipMode(spark: SparkSession, n: Long = 10, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("sm_ship_mode_sk"),
        pick(col("id"), seed + 44, "EXPRESS", "OVERNIGHT", "REGULAR",
          "TWO_DAY", "LIBRARY").as("sm_type"),
        concat(lit("carrier_"), h(col("id"), seed + 45, 8)).as("sm_carrier"),
        concat(lit("code_"), h(col("id"), seed + 88, 4)).as("sm_code"))

  def reason(spark: SparkSession, n: Long = 20, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("r_reason_sk"),
        concat(lit("reason_"), col("id")).as("r_reason_desc"))

  /** 20 contiguous $10k income bands. */
  def incomeBand(spark: SparkSession, n: Long = 20): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("ib_income_band_sk"),
        (col("id") * 10000).as("ib_lower_bound"),
        ((col("id") + 1) * 10000).as("ib_upper_bound"))

  def householdDemographics(spark: SparkSession, n: Long = 720,
      seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("hd_demo_sk"),
        h(col("id"), seed + 46, 20).as("hd_income_band_sk"),
        pick(col("id"), seed + 89, ">10000", "5001-10000", "1001-5000",
          "501-1000", "0-500", "Unknown").as("hd_buy_potential"),
        h(col("id"), seed + 47, 10).cast("int").as("hd_dep_count"),
        h(col("id"), seed + 48, 5).cast("int").as("hd_vehicle_count"))

  def customerAddress(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("ca_address_sk"),
        concat(lit("ADDR"), lpad(col("id").cast("string"), 10, "0")).as("ca_address_id"),
        concat(lit("state_"), h(col("id"), seed + 49, 10)).as("ca_state"),
        concat(lit("county_"), h(col("id"), seed + 90, 30)).as("ca_county"),
        concat(lit("city_"), h(col("id"), seed + 50, 200)).as("ca_city"),
        lpad((h(col("id"), seed + 91, 90000) + 10000).cast("string"), 5, "0").as("ca_zip"),
        when(h(col("id"), seed + 92, 20) === 0,
          pick(col("id"), seed + 93, "Canada", "Mexico", "Germany"))
          .otherwise("United States").as("ca_country"),
        pick(col("id"), seed + 94, "condo", "single family", "apartment").as("ca_location_type"),
        (h(col("id"), seed + 51, 4) - 8).cast("int").as("ca_gmt_offset"))

  def callCenter(spark: SparkSession, n: Long = 6, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("cc_call_center_sk"),
        concat(lit("CC"), lpad(col("id").cast("string"), 4, "0")).as("cc_call_center_id"),
        concat(lit("call center "), col("id")).as("cc_name"),
        pick(col("id"), seed + 95, "small", "medium", "large").as("cc_class"),
        (h(col("id"), seed + 96, 500) + 50).cast("int").as("cc_employees"),
        concat(lit("county_"), h(col("id"), seed + 97, 30)).as("cc_county"),
        concat(lit("mgr_"), h(col("id"), seed + 98, 40)).as("cc_manager"))

  def catalogPage(spark: SparkSession, n: Long = 1000, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("cp_catalog_page_sk"),
        concat(lit("CP"), lpad(col("id").cast("string"), 8, "0")).as("cp_catalog_page_id"),
        (h(col("id"), seed + 99, 20) + 1).cast("int").as("cp_catalog_number"),
        (col("id") % 100 + 1).cast("int").as("cp_catalog_page_number"),
        concat(lit("dept_"), h(col("id"), seed + 100, 10)).as("cp_department"),
        pick(col("id"), seed + 101, "monthly", "quarterly", "bi-annual").as("cp_type"))

  def webSite(spark: SparkSession, n: Long = 10, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("web_site_sk"),
        concat(lit("WEB"), lpad(col("id").cast("string"), 4, "0")).as("web_site_id"),
        concat(lit("site_"), col("id")).as("web_name"),
        concat(lit("mgr_"), h(col("id"), seed + 102, 40)).as("web_manager"),
        pick(col("id"), seed + 103, "pri", "ally", "able", "ought", "eing").as("web_company_name"))

  def webPage(spark: SparkSession, n: Long = 100, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("wp_web_page_sk"),
        concat(lit("WP"), lpad(col("id").cast("string"), 6, "0")).as("wp_web_page_id"),
        (h(col("id"), seed + 104, 7000) + 300).cast("int").as("wp_char_count"),
        h(col("id"), seed + 105, 25).cast("int").as("wp_link_count"),
        pick(col("id"), seed + 106, "general", "order", "feedback", "welcome",
          "ad", "protected", "dynamic").as("wp_type"))

  /** Weekly on-hand inventory: one row per (week, item, warehouse) —
    * the id is decomposed arithmetically so any worker can generate any
    * shard without coordination. */
  def inventory(spark: SparkSession, weeks: Int = 208, items: Long = 1000,
      warehouses: Long = 5, seed: Long = 42): DataFrame =
    spark.range(0, weeks.toLong * items * warehouses)
      .select(
        // `div` (integer division): Spark's `/` is always double division,
        // which made inv_item_sk fractional (dropping ~80% of inventory
        // rows from every join to item) and inv_date_sk a daily ramp
        // instead of week-aligned
        expr(s"(id div ${items * warehouses}) * 7").cast("int").as("inv_date_sk"),
        expr(s"(id div $warehouses) % $items").as("inv_item_sk"),
        (col("id") % warehouses).as("inv_warehouse_sk"),
        h(col("id"), seed + 52, 1000).cast("int").as("inv_quantity_on_hand"))

  /** Shared money-column block for a sales fact: per-unit decimal(7,2)
    * prices with the standard relationships (wholesale ≤ sales ≤ list)
    * and extended = per-unit × quantity as decimal(15,2). */
  private def withMoney(df: DataFrame, pfx: String, idc: Column, qty: Column,
      seed: Long): DataFrame =
    df
      .withColumn(s"${pfx}_wholesale_cost", money(idc, seed + 107, 100, 10000))
      .withColumn(s"${pfx}_list_price",
        (col(s"${pfx}_wholesale_cost") *
          (h(idc, seed + 108, 100) + 110).cast(DecimalType(12, 0)) / 100)
          .cast(DecimalType(7, 2)))
      .withColumn(s"${pfx}_sales_price",
        (col(s"${pfx}_list_price") *
          (lit(100) - h(idc, seed + 109, 60)).cast(DecimalType(12, 0)) / 100)
          .cast(DecimalType(7, 2)))
      .withColumn(s"${pfx}_ext_wholesale_cost",
        (col(s"${pfx}_wholesale_cost") * qty).cast(DecimalType(15, 2)))
      .withColumn(s"${pfx}_ext_list_price",
        (col(s"${pfx}_list_price") * qty).cast(DecimalType(15, 2)))
      .withColumn(s"${pfx}_ext_sales_price",
        (col(s"${pfx}_sales_price") * qty).cast(DecimalType(15, 2)))
      .withColumn(s"${pfx}_ext_discount_amt",
        ((col(s"${pfx}_list_price") - col(s"${pfx}_sales_price")) * qty)
          .cast(DecimalType(15, 2)))
      .withColumn(s"${pfx}_coupon_amt",
        when(h(idc, seed + 110, 10) === 0, money(idc, seed + 111, 0, 2000))
          .otherwise(lit(0).cast(DecimalType(7, 2))))
      .withColumn(s"${pfx}_net_paid",
        (col(s"${pfx}_ext_sales_price") - col(s"${pfx}_coupon_amt"))
          .cast(DecimalType(15, 2)))
      .withColumn(s"${pfx}_net_profit",
        (col(s"${pfx}_net_paid") - col(s"${pfx}_ext_wholesale_cost"))
          .cast(DecimalType(15, 2)))

  /** Sales fact. Date is mildly skewed toward later days (growth),
    * quantity 1..10, discount 0..30% of list price in whole percents. */
  def storeSales(spark: SparkSession, n: Long, days: Int = 1461,
      items: Long = 1000, stores: Long = 50, customers: Long = 10000,
      seed: Long = 42): DataFrame = {
    val d = days.toLong
    // ~3 lines per register ticket (TPC-DS per-ticket basket shapes,
    // q34/q46/q68/q79). Ticket-level facts (who, where, when) hash the
    // TICKET id so they're constant within a basket; line-level facts
    // (item, quantity, price) hash the unique line id.
    val tk = expr("id div 3")
    val base = spark.range(0, n)
      .select(
        col("id").as("ss_id"),
        tk.as("ss_ticket_number"),
        // skew: max of two uniforms biases toward high date_sk
        greatest(h(tk, seed + 7, d), h(tk, seed + 8, d))
          .cast("int").as("ss_sold_date_sk"),
        h(col("id"), seed + 9, items).as("ss_item_sk"),
        h(tk, seed + 10, stores).as("ss_store_sk"),
        h(tk, seed + 11, customers).as("ss_customer_sk"),
        h(tk, seed + 112, customers).as("ss_addr_sk"),
        h(tk, seed + 113, 7200).as("ss_cdemo_sk"),
        h(tk, seed + 15, 720).as("ss_hdemo_sk"),
        h(col("id"), seed + 114, 100).as("ss_promo_sk"),
        (h(col("id"), seed + 12, 10) + 1).cast("int").as("ss_quantity"),
        h(col("id"), seed + 13, 31).cast("int").as("ss_discount_pct"),
        h(tk, seed + 14, 86400).as("ss_sold_time_sk"))
    withMoney(base, "ss", col("ss_id"), col("ss_quantity"), seed)
  }

  /** Second/third sales channels (catalog, web): same shape as
    * store_sales with channel-specific key distributions — enables the
    * reference's cross-channel union/intersect queries (q2/q5/q14/q71). */
  def channelSales(spark: SparkSession, channel: String, n: Long,
      days: Int = 1461, items: Long = 1000, customers: Long = 10000,
      seed: Long = 42): DataFrame = {
    val cs = seed + channel.hashCode
    val d = days.toLong
    // ~3 lines per order: multi-line orders make the "shipped from
    // more than one warehouse" EXISTS shapes (TPC-DS q16/q94/q95)
    // non-degenerate. Order-level facts hash the ORDER id (one buyer,
    // one sold date per order); line-level facts (item, quantity,
    // warehouse, ship date) hash the line id.
    val ord = expr("id div 3")
    val base = spark.range(0, n)
      .select(
        col("id").as(s"${channel}_id"),
        ord.as(s"${channel}_order_number"),
        greatest(h(ord, cs + 7, d), h(ord, cs + 8, d))
          .cast("int").as(s"${channel}_sold_date_sk"),
        h(col("id"), cs + 9, items).as(s"${channel}_item_sk"),
        h(ord, cs + 11, customers).as(s"${channel}_customer_sk"),
        // bill and ship customers differ on ~20% of orders (gift ships)
        when(h(ord, cs + 115, 5) === 0, h(ord, cs + 116, customers))
          .otherwise(h(ord, cs + 11, customers)).as(s"${channel}_ship_customer_sk"),
        h(ord, cs + 117, customers).as(s"${channel}_bill_addr_sk"),
        h(ord, cs + 118, customers).as(s"${channel}_ship_addr_sk"),
        h(ord, cs + 119, 7200).as(s"${channel}_bill_cdemo_sk"),
        h(ord, cs + 120, 720).as(s"${channel}_bill_hdemo_sk"),
        h(col("id"), cs + 121, 100).as(s"${channel}_promo_sk"),
        (h(col("id"), cs + 12, 10) + 1).cast("int").as(s"${channel}_quantity"),
        h(col("id"), cs + 13, 10).as(s"${channel}_ship_mode_sk"),
        h(col("id"), cs + 14, 5).as(s"${channel}_warehouse_sk"),
        h(ord, cs + 122, 86400).as(s"${channel}_sold_time_sk"))
      .withColumn(s"${channel}_ship_date_sk",
        col(s"${channel}_sold_date_sk") + 1 +
          h(col(s"${channel}_id"), cs + 15, 120).cast("int"))
    val wm = withMoney(base, channel, col(s"${channel}_id"),
      col(s"${channel}_quantity"), cs)
    channel match {
      case "cs" => wm
        .withColumn("cs_call_center_sk", h(col("cs_id"), cs + 123, 6))
        .withColumn("cs_catalog_page_sk", h(col("cs_id"), cs + 124, 1000))
      case "ws" => wm
        .withColumn("ws_web_site_sk", h(col("ws_id"), cs + 125, 10))
        .withColumn("ws_web_page_sk", h(col("ws_id"), cs + 126, 100))
      case _ => wm
    }
  }

  /** Returns fact for a shipped channel: a deterministic ~6% subset of
    * that channel's sales, tagged with a return reason. */
  def channelReturns(spark: SparkSession, channel: String, retPrefix: String,
      n: Long, days: Int = 1461, items: Long = 1000, customers: Long = 10000,
      seed: Long = 42): DataFrame = {
    val cs = seed + channel.hashCode
    channelSales(spark, channel, n, days, items, customers, seed)
      .filter(h(col(s"${channel}_id"), cs + 22, 100) < 6)
      .select(
        col(s"${channel}_id").as(s"${retPrefix}_sale_id"),
        col(s"${channel}_order_number").as(s"${retPrefix}_order_number"),
        (col(s"${channel}_ship_date_sk") +
          h(col(s"${channel}_id"), cs + 23, 30).cast("int"))
          .as(s"${retPrefix}_returned_date_sk"),
        col(s"${channel}_item_sk").as(s"${retPrefix}_item_sk"),
        col(s"${channel}_customer_sk").as(s"${retPrefix}_customer_sk"),
        col(s"${channel}_ship_addr_sk").as(s"${retPrefix}_returning_addr_sk"),
        col(s"${channel}_quantity").as(s"${retPrefix}_return_quantity"),
        (col(s"${channel}_ext_sales_price"))
          .cast(DecimalType(15, 2)).as(s"${retPrefix}_return_amt"),
        (col(s"${channel}_ext_wholesale_cost") / 2)
          .cast(DecimalType(15, 2)).as(s"${retPrefix}_net_loss"),
        h(col(s"${channel}_id"), cs + 24, 20).as(s"${retPrefix}_reason_sk"))
  }

  /** Returns fact: a deterministic ~8% subset of store sales. */
  def storeReturns(spark: SparkSession, salesRows: Long,
      seed: Long = 42): DataFrame =
    storeSales(spark, salesRows, seed = seed)
      .filter(h(col("ss_id"), seed + 20, 100) < 8)
      .select(
        col("ss_id").as("sr_sale_id"),
        col("ss_ticket_number").as("sr_ticket_number"),
        col("ss_sold_date_sk").as("sr_returned_date_sk"),
        col("ss_item_sk").as("sr_item_sk"),
        col("ss_customer_sk").as("sr_customer_sk"),
        col("ss_store_sk").as("sr_store_sk"),
        col("ss_quantity").as("sr_return_quantity"),
        col("ss_ext_sales_price").cast(DecimalType(15, 2)).as("sr_return_amt"),
        (col("ss_ext_wholesale_cost") / 2).cast(DecimalType(15, 2)).as("sr_net_loss"),
        h(col("ss_id"), seed + 21, 20).as("sr_reason_sk"))

  def promotion(spark: SparkSession, n: Long = 100, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("p_promo_sk"),
        concat(lit("PROMO"), lpad(col("id").cast("string"), 6, "0")).as("p_promo_id"),
        concat(lit("promo_"), col("id")).as("p_promo_name"),
        h(col("id"), seed + 30, 1000).as("p_item_sk"),
        (h(col("id"), seed + 31, 1200)).cast("int").as("p_start_date_sk"),
        (h(col("id"), seed + 31, 1200) + 90).cast("int").as("p_end_date_sk"),
        when(h(col("id"), seed + 32, 2) === 0, "Y").otherwise("N").as("p_channel_dmail"),
        when(h(col("id"), seed + 33, 2) === 0, "Y").otherwise("N").as("p_channel_email"),
        when(h(col("id"), seed + 34, 2) === 0, "Y").otherwise("N").as("p_channel_tv"))

  /** The whole 24-table schema (sf ≈ rows of fact). With
    * `useDoubleForDecimal` every DecimalType column is rewritten to
    * double, mirroring the reference's `useDoubleForDecimal` rewrite of
    * its dsdgen DDL. */
  def tables(spark: SparkSession, factRows: Long = 1000000L,
      seed: Long = 42, useDoubleForDecimal: Boolean = false): Map[String, DataFrame] = {
    val raw: Map[String, DataFrame] = Map(
      "date_dim" -> dateDim(spark),
      "item" -> item(spark, 1000, seed),
      "store" -> store(spark, 50, seed),
      "customer_dim" -> customerDim(spark, 10000, seed),
      "customer_demographics" -> customerDemographics(spark, seed = seed),
      "store_sales" -> storeSales(spark, factRows, seed = seed),
      "catalog_sales" -> channelSales(spark, "cs", factRows / 2, seed = seed),
      "web_sales" -> channelSales(spark, "ws", factRows / 4, seed = seed),
      "store_returns" -> storeReturns(spark, factRows, seed = seed),
      "catalog_returns" -> channelReturns(spark, "cs", "cr", factRows / 2, seed = seed),
      "web_returns" -> channelReturns(spark, "ws", "wr", factRows / 4, seed = seed),
      "promotion" -> promotion(spark, seed = seed),
      "time_dim" -> timeDim(spark),
      "warehouse" -> warehouse(spark, seed = seed),
      "ship_mode" -> shipMode(spark, seed = seed),
      "reason" -> reason(spark, seed = seed),
      "income_band" -> incomeBand(spark),
      "household_demographics" -> householdDemographics(spark, seed = seed),
      "customer_address" -> customerAddress(spark, 10000, seed),
      "call_center" -> callCenter(spark, seed = seed),
      "catalog_page" -> catalogPage(spark, seed = seed),
      "web_site" -> webSite(spark, seed = seed),
      "web_page" -> webPage(spark, seed = seed),
      "inventory" -> inventory(spark, seed = seed))
    if (!useDoubleForDecimal) raw
    else raw.map { case (name, df) =>
      name -> df.schema.fields.foldLeft(df) {
        case (d, f) if f.dataType.isInstanceOf[DecimalType] =>
          d.withColumn(f.name, col(f.name).cast("double"))
        case (d, _) => d
      }
    }
  }
}
