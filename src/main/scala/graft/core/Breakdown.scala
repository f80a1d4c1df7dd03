package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-operator execution breakdown (reference `P/Query.scala:86-116`).
  *
  * The reference re-executed every physical subtree bottom-up and
  * differenced wall times — infeasible on public API in Spark 4 (and
  * wasteful). This reads each node's own SQLMetrics after one
  * execution instead. AQE is pinned off for the run because
  * AdaptiveSparkPlanExec is a leaf node that hides the final plan from
  * tree traversal (SURVEY §7.4 hard-parts note).
  */
case class BreakdownResult(
    nodeName: String,
    simpleString: String,
    metrics: Map[String, Long])

object Breakdown {

  def of(spark: SparkSession, buildDf: => DataFrame): Seq[BreakdownResult] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = buildDf
      val qe = df.queryExecution
      // drive THIS plan instance's RDD (df.foreach / a noop write each
      // build a fresh QueryExecution whose metrics we'd never see);
      // SQLMetrics are accumulators, so task completion updates them
      // on the driver without materializing any rows here
      qe.toRdd.foreach(_ => ())
      qe.executedPlan.collect {
        case p =>
          BreakdownResult(
            p.nodeName,
            p.simpleString(25),
            p.metrics.map { case (k, m) => k -> m.value })
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
