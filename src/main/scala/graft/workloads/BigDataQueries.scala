package graft.workloads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Benchmark, ExecutionMode, Query}

/** AMPLab Big-Data Benchmark workload (reference
  * `P/bigdata/Queries.scala:25-165`): scan/filter (q1), grouped
  * substring aggregation (q2), join + date-range + top-revenue (q3),
  * each in A/B/C selectivity tiers — re-expressed over
  * hash-deterministic rankings/uservisits tables.
  */
class BigDataBenchmark(spark: SparkSession, scale: Long = 100000L)
    extends Benchmark(spark) {

  private def h(c: org.apache.spark.sql.Column, salt: Long, bound: Long) =
    pmod(xxhash64(c, lit(salt)), lit(bound))

  /** rankings(pageURL, pageRank, avgDuration) */
  def rankings: DataFrame =
    spark.range(0, scale)
      .select(
        concat(lit("url_"), col("id")).as("pageURL"),
        h(col("id"), 1, 10000).cast("int").as("pageRank"),
        (h(col("id"), 2, 190) + 10).cast("int").as("avgDuration"))

  /** uservisits(sourceIP, destURL, visitDate, adRevenue, countryCode) */
  def uservisits: DataFrame =
    spark.range(0, scale * 10)
      .select(
        concat(lit("10."), h(col("id"), 3, 256), lit("."),
          h(col("id"), 4, 256), lit("."), h(col("id"), 5, 256)).as("sourceIP"),
        concat(lit("url_"), h(col("id"), 6, scale)).as("destURL"),
        date_add(lit("2000-01-01").cast("date"),
          h(col("id"), 7, 3653).cast("int")).as("visitDate"),
        (h(col("id"), 8, 100000).cast("double") / 100.0).as("adRevenue"),
        concat(lit("C"), h(col("id"), 9, 50)).as("countryCode"))

  override def allTables: Map[String, DataFrame] =
    Map("rankings" -> rankings, "uservisits" -> uservisits)

  private def q(name: String, sql: String): Query =
    new Query(name, spark.sql(sql), sqlText = Some(sql),
      executionMode = ExecutionMode.HashResults)

  /** q1 tiers: rank cutoffs (A/B/C selectivity sweep). */
  def queries: Seq[Query] =
    Seq(1000, 100, 10).zip(Seq("A", "B", "C")).map { case (cut, t) =>
      q(s"bd_q1$t",
        s"SELECT pageURL, pageRank FROM rankings WHERE pageRank > ${10000 - cut}")
    } ++ Seq(8, 10, 12).zip(Seq("A", "B", "C")).map { case (len, t) =>
      // q2: substring-prefix revenue aggregation (adRevenue in integer
      // cents so checksums are partitioning-stable)
      q(s"bd_q2$t",
        s"""SELECT substring(sourceIP, 1, $len) AS ipPrefix,
           |  CAST(sum(CAST(round(adRevenue * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS totalRevenue
           |FROM uservisits GROUP BY 1""".stripMargin)
    } ++ Seq(("1h", 365), ("1m", 1200), ("1y", 3653)).map { case (tag, days) =>
      // q3: join + date window + top source by revenue
      q(s"bd_q3_$tag",
        s"""SELECT sourceIP,
           |  CAST(sum(CAST(round(adRevenue * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS totalRevenue,
           |  avg(pageRank) AS avgPageRank
           |FROM rankings JOIN uservisits ON pageURL = destURL
           |WHERE visitDate BETWEEN DATE '2000-01-01'
           |  AND date_add(DATE '2000-01-01', $days)
           |GROUP BY sourceIP
           |ORDER BY totalRevenue DESC, sourceIP
           |LIMIT 1""".stripMargin)
    }
}
