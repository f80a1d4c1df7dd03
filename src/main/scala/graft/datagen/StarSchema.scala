package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shaped retail star schema, regenerated from scratch: a
  * date-partitioned sales fact with date/item/store/customer dims
  * (the reference drives dsdgen for this, `P/tpcds/Tables.scala` —
  * here every value is a pure hash of (row id, seed), so any worker
  * can generate any shard and checksums are cluster-stable).
  *
  * Covers the TPC-DS table inventory the reference drives through
  * dsdgen: three sales channels with matching returns facts, weekly
  * inventory, and the full dimension set (date/time/item/store/
  * warehouse/ship_mode/reason/promotion/customer/address/
  * household_demographics/income_band). Column sets are intentionally
  * compact — enough to express every distinctive TPC-DS query pattern
  * (date_sk partition filters, category/brand hierarchies, shipping
  * lags, demographic buckets, returns reasons) without cloning the
  * spec's DDL text.
  */
object StarSchema {

  private def h(c: org.apache.spark.sql.Column, salt: Long, bound: Long) =
    pmod(xxhash64(c, lit(salt)), lit(bound))

  /** Calendar dimension: one row per day over `days` days from 2020-01-01. */
  def dateDim(spark: SparkSession, days: Int = 1461): DataFrame =
    spark.range(0, days)
      .select(
        col("id").cast("int").as("d_date_sk"),
        date_add(lit("2020-01-01").cast("date"), col("id").cast("int")).as("d_date"))
      .withColumn("d_year", year(col("d_date")).cast("int"))
      .withColumn("d_qoy", quarter(col("d_date")).cast("int"))
      .withColumn("d_moy", month(col("d_date")).cast("int"))
      .withColumn("d_dow", dayofweek(col("d_date")).cast("int"))

  def item(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("i_item_sk"),
        concat(lit("cat_"), h(col("id"), seed, 10)).as("i_category"),
        concat(lit("brand_"), h(col("id"), seed + 1, 50)).as("i_brand"),
        ((h(col("id"), seed + 2, 9000) + 1000).cast("double") / 100.0).as("i_list_price"))

  def store(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("s_store_sk"),
        concat(lit("state_"), h(col("id"), seed + 3, 10)).as("s_state"),
        h(col("id"), seed + 4, 5).cast("int").as("s_market"))

  def customerDim(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("c_customer_sk"),
        (h(col("id"), seed + 5, 60) + 1940).cast("int").as("c_birth_year"),
        when(h(col("id"), seed + 6, 2) === 0, "M").otherwise("F").as("c_gender"),
        h(col("id"), seed + 40, n).as("c_address_sk"),
        h(col("id"), seed + 41, 720).as("c_hdemo_sk"))

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

  def warehouse(spark: SparkSession, n: Long = 5, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("w_warehouse_sk"),
        concat(lit("state_"), h(col("id"), seed + 42, 10)).as("w_state"),
        ((h(col("id"), seed + 43, 900) + 100) * 1000).as("w_sqft"))

  def shipMode(spark: SparkSession, n: Long = 10, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("sm_ship_mode_sk"),
        element_at(
          array(lit("EXPRESS"), lit("OVERNIGHT"), lit("REGULAR"), lit("TWO_DAY"), lit("LIBRARY")),
          (h(col("id"), seed + 44, 5) + 1).cast("int")).as("sm_type"),
        concat(lit("carrier_"), h(col("id"), seed + 45, 8)).as("sm_carrier"))

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
        h(col("id"), seed + 47, 10).cast("int").as("hd_dep_count"),
        h(col("id"), seed + 48, 5).cast("int").as("hd_vehicle_count"))

  def customerAddress(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("ca_address_sk"),
        concat(lit("state_"), h(col("id"), seed + 49, 10)).as("ca_state"),
        concat(lit("city_"), h(col("id"), seed + 50, 200)).as("ca_city"),
        (h(col("id"), seed + 51, 4) - 8).cast("int").as("ca_gmt_offset"))

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

  /** Sales fact. Date is mildly skewed toward later days (growth),
    * quantity 1..10, discount 0..30% of list price in whole percents. */
  def storeSales(spark: SparkSession, n: Long, days: Int = 1461,
      items: Long = 1000, stores: Long = 50, customers: Long = 10000,
      seed: Long = 42): DataFrame = {
    val d = days.toLong
    spark.range(0, n)
      .select(
        col("id").as("ss_id"),
        // skew: max of two uniforms biases toward high date_sk
        greatest(h(col("id"), seed + 7, d), h(col("id"), seed + 8, d))
          .cast("int").as("ss_sold_date_sk"),
        h(col("id"), seed + 9, items).as("ss_item_sk"),
        h(col("id"), seed + 10, stores).as("ss_store_sk"),
        h(col("id"), seed + 11, customers).as("ss_customer_sk"),
        (h(col("id"), seed + 12, 10) + 1).cast("int").as("ss_quantity"),
        h(col("id"), seed + 13, 31).cast("int").as("ss_discount_pct"),
        h(col("id"), seed + 14, 86400).as("ss_sold_time_sk"),
        h(col("id"), seed + 15, 720).as("ss_hdemo_sk"))
  }

  /** Second/third sales channels (catalog, web): same shape as
    * store_sales with channel-specific key distributions — enables the
    * reference's cross-channel union/intersect queries (q2/q5/q14/q71). */
  def channelSales(spark: SparkSession, channel: String, n: Long,
      days: Int = 1461, items: Long = 1000, customers: Long = 10000,
      seed: Long = 42): DataFrame = {
    val cs = seed + channel.hashCode
    val d = days.toLong
    spark.range(0, n)
      .select(
        col("id").as(s"${channel}_id"),
        greatest(h(col("id"), cs + 7, d), h(col("id"), cs + 8, d))
          .cast("int").as(s"${channel}_sold_date_sk"),
        h(col("id"), cs + 9, items).as(s"${channel}_item_sk"),
        h(col("id"), cs + 11, customers).as(s"${channel}_customer_sk"),
        (h(col("id"), cs + 12, 10) + 1).cast("int").as(s"${channel}_quantity"),
        h(col("id"), cs + 13, 10).as(s"${channel}_ship_mode_sk"),
        h(col("id"), cs + 14, 5).as(s"${channel}_warehouse_sk"))
      .withColumn(s"${channel}_ship_date_sk",
        col(s"${channel}_sold_date_sk") + 1 +
          h(col(s"${channel}_id"), cs + 15, 120).cast("int"))
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
        (col(s"${channel}_ship_date_sk") +
          h(col(s"${channel}_id"), cs + 23, 30).cast("int"))
          .as(s"${retPrefix}_returned_date_sk"),
        col(s"${channel}_item_sk").as(s"${retPrefix}_item_sk"),
        col(s"${channel}_customer_sk").as(s"${retPrefix}_customer_sk"),
        col(s"${channel}_quantity").as(s"${retPrefix}_return_quantity"),
        h(col(s"${channel}_id"), cs + 24, 20).as(s"${retPrefix}_reason_sk"))
  }

  /** Returns fact: a deterministic ~8% subset of store sales. */
  def storeReturns(spark: SparkSession, salesRows: Long,
      seed: Long = 42): DataFrame =
    storeSales(spark, salesRows, seed = seed)
      .filter(h(col("ss_id"), seed + 20, 100) < 8)
      .select(
        col("ss_id").as("sr_sale_id"),
        col("ss_sold_date_sk").as("sr_returned_date_sk"),
        col("ss_item_sk").as("sr_item_sk"),
        col("ss_customer_sk").as("sr_customer_sk"),
        col("ss_quantity").as("sr_return_quantity"))

  def promotion(spark: SparkSession, n: Long = 100, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select(
        col("id").as("p_promo_sk"),
        h(col("id"), seed + 30, 1000).as("p_item_sk"),
        (h(col("id"), seed + 31, 1200)).cast("int").as("p_start_date_sk"),
        (h(col("id"), seed + 31, 1200) + 90).cast("int").as("p_end_date_sk"))

  /** Register the whole schema as temp views (sf ≈ rows of fact). */
  def tables(spark: SparkSession, factRows: Long = 1000000L,
      seed: Long = 42): Map[String, DataFrame] = Map(
    "date_dim" -> dateDim(spark),
    "item" -> item(spark, 1000, seed),
    "store" -> store(spark, 50, seed),
    "customer_dim" -> customerDim(spark, 10000, seed),
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
    "inventory" -> inventory(spark, seed = seed))
}
