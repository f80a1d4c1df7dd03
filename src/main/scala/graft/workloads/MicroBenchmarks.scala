package graft.workloads

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{ExecutionMode, Query}
import graft.datagen.Generators

/** Micro-benchmark suites over generated data — the reference's
  * Join/Aggregation/Dataset performance workloads
  * (`P/JoinPerformance.scala`, `P/AggregationPerformance.scala`,
  * `P/DatasetPerformance.scala`), parameterized by size so the same
  * shapes run at laptop and cluster scale.
  */
object MicroBenchmarks {

  /** Join matrix: sizes × join types, COUNT(*) over the joined result
    * (J:38-48). Broadcast disabled per-query via hint-free sizes — the
    * point is exercising shuffle joins. */
  def joinMatrix(spark: SparkSession, sizes: Seq[Long] = Seq(100000L, 1000000L)): Seq[Query] =
    for {
      n1 <- sizes
      n2 <- sizes
      joinType <- Seq("inner", "left_outer", "right_outer", "full_outer")
    } yield new Query(
      s"join_${n1}_${n2}_$joinType",
      {
        val a = Generators.milints(spark, n1).as("a")
        val b = Generators.milints(spark, n2).as("b")
        a.join(b, col("a.id") === col("b.id"), joinType).select(lit(1).as("one"))
      },
      description = s"$joinType join of $n1 x $n2 longs",
      executionMode = ExecutionMode.CountResults)

  /** Aggregation cardinality sweep: numGroups from 10 to 10^k, 10k rows
    * per group semantics scaled down (A:11-25). */
  def aggSweep(spark: SparkSession, groupCounts: Seq[Long] = Seq(10L, 1000L, 100000L)): Seq[Query] =
    groupCounts.map { g =>
      new Query(
        s"agg_groups_$g",
        Generators.ints(spark, g, 1000000L / g max 1L)
          .groupBy(col("a")).agg(avg(col("b"))).select(lit(1).as("one")),
        description = s"AVG(b) GROUP BY a over $g groups",
        executionMode = ExecutionMode.ForeachResults)
    }

  /** Scalar aggregates over N longs (A:48-66) incl. the complex-input
    * sum (9 chained additions). */
  def scalarAggs(spark: SparkSession, n: Long = 10000000L): Seq[Query] = Seq(
    new Query(s"scalar_sum_$n",
      Generators.milints(spark, n).agg(sum(col("id"))),
      executionMode = ExecutionMode.CollectResults),
    new Query(s"scalar_stats_$n",
      Generators.milints(spark, n).agg(avg(col("id")), count(lit(1)), stddev(col("id"))),
      executionMode = ExecutionMode.CollectResults),
    new Query(s"scalar_complex_$n",
      Generators.milints(spark, n)
        .agg(sum((1 to 9).map(_ => col("id")).reduce(_ + _))),
      executionMode = ExecutionMode.CollectResults))

  /** Duplicate-key join explosion ×{1,2,4,8} (J:64-70). */
  def numMatches(spark: SparkSession, n: Long = 100000L): Seq[Query] =
    Seq(1, 2, 4, 8).map { k =>
      new Query(
        s"join_matches_$k",
        {
          val base = Generators.replicated(Generators.milints(spark, n), k).as("a")
          val other = Generators.replicated(Generators.milints(spark, n), k).as("b")
          base.join(other, col("a.id") === col("b.id")).select(lit(1).as("one"))
        },
        description = s"self join with $k duplicates per key",
        executionMode = ExecutionMode.CountResults)
    }

  /** Typed vs untyped API tiers over the same pipeline (D:38-100). */
  def apiTiers(spark: SparkSession, n: Long = 10000000L): Seq[Query] = {
    import spark.implicits._
    Seq(
      new Query(s"tier_df_filter_$n",
        Generators.milints(spark, n)
          .filter("id % 100 != 0").filter("id % 101 != 0").select(lit(1).as("one")),
        executionMode = ExecutionMode.CountResults),
      new Query(s"tier_ds_filter_$n",
        Generators.milints(spark, n).as[Long]
          .filter(_ % 100 != 0).filter(_ % 101 != 0).toDF().select(lit(1).as("one")),
        executionMode = ExecutionMode.CountResults),
      new Query(s"tier_rdd_filter_$n",
        {
          val c = spark.sparkContext.range(0, n)
            .filter(_ % 100 != 0).filter(_ % 101 != 0).count()
          spark.range(c).select(lit(1).as("one")) // surface as DataFrame row count
        },
        executionMode = ExecutionMode.CountResults))
  }

  def all(spark: SparkSession): Seq[Query] =
    joinMatrix(spark) ++ aggSweep(spark) ++ scalarAggs(spark) ++
      numMatches(spark) ++ apiTiers(spark)
}
