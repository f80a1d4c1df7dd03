package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seed-stable synthetic data (SURVEY §7.1.4): the
  * reference shells out to dsdgen with a pinned RNGSEED; we instead
  * derive every value as a pure hash of (row id, seed) — the same value
  * for a given (table, n, seed) regardless of partitioning, cluster
  * size, or evaluation order, which keeps checksum-based correctness
  * stable. Generation is `spark.range` + codegen'd expressions: no
  * driver-side data, O(n/partitions) per task, arbitrarily scalable.
  */
object Generators {

  /** Uniform pseudo-random long in [0, bound) from (id, seed). */
  private def h(idCol: org.apache.spark.sql.Column, seed: Long, bound: Long) =
    pmod(xxhash64(idCol, lit(seed)), lit(bound))

  /** Reference `intsN` tables (`P/AggregationPerformance.scala:13-18`):
    * numGroups groups × rowsPerGroup rows, b uniform. */
  def ints(spark: SparkSession, numGroups: Long, rowsPerGroup: Long,
      seed: Long = 42): DataFrame =
    spark.range(0, numGroups * rowsPerGroup)
      .select(
        (col("id") % numGroups).as("a"),
        h(col("id"), seed, 100000L).as("b"))

  /** Reference `twoGroups` (`P/AggregationPerformance.scala:20-25`). */
  def twoGroups(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(0, n)
      .select((col("id") % 2).as("a"), h(col("id"), seed, 1000000L).as("b"))

  /** Reference `NmilintsT` join inputs (`P/JoinPerformance.scala:14-31`):
    * plain id column, optionally repartitioned to k files. */
  def milints(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    val base = spark.range(0, n).select(col("id"))
    if (partitions > 0) base.repartition(partitions) else base
  }

  /** Uniform random directed edges over [0, nodes) — deterministic. */
  def randomEdges(spark: SparkSession, nodes: Long, edges: Long,
      seed: Long = 42): DataFrame =
    spark.range(0, edges)
      .select(
        h(col("id"), seed, nodes).as("source"),
        h(col("id"), seed + 1, nodes).as("target"))

  /** Zipf-ish skewed pairs (`P/TrafficEstimation.scala` skew tables):
    * source key frequency ∝ rank^-1 approximated by hashing into a
    * squared-uniform space. */
  def skewedEdges(spark: SparkSession, nodes: Long, edges: Long,
      seed: Long = 42): DataFrame =
    spark.range(0, edges)
      .select(
        // square a uniform in [0,1) → density concentrated near 0
        (h(col("id"), seed, 1000000L) * h(col("id"), seed, 1000000L)
          / lit(1000000L * 1000000L / nodes)).cast("long").as("source"),
        h(col("id"), seed + 1, nodes).as("target"))

  /** Duplicated-key table for numMatches join explosion
    * (`P/JoinPerformance.scala:64-70`, union ×k). */
  def replicated(df: DataFrame, copies: Int): DataFrame =
    (1 until copies).foldLeft(df)((acc, _) => acc.union(df))
}
