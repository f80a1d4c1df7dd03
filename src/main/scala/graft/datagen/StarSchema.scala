package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shaped retail star schema, regenerated from scratch: a
  * date-partitioned sales fact with date/item/store/customer dims
  * (the reference drives dsdgen for this, `P/tpcds/Tables.scala` —
  * here every value is a pure hash of (row id, seed), so any worker
  * can generate any shard and checksums are cluster-stable).
  *
  * Column set is intentionally compact: enough to express the
  * distinctive TPC-DS query patterns (date_sk partition filters,
  * category/brand hierarchies, store locality, demographic buckets)
  * without reproducing the reference's 24-table DDL.
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
        when(h(col("id"), seed + 6, 2) === 0, "M").otherwise("F").as("c_gender"))

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
        h(col("id"), seed + 13, 31).cast("int").as("ss_discount_pct"))
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
        (h(col("id"), cs + 12, 10) + 1).cast("int").as(s"${channel}_quantity"))
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
    "promotion" -> promotion(spark, seed = seed))
}
