package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-operator execution breakdown (reference `P/Query.scala:86-116`).
  *
  * The reference re-executed every physical subtree bottom-up and
  * differenced wall times — infeasible on public API in Spark 4 (and
  * wasteful). This reads each node's own SQLMetrics after one
  * execution instead.
  *
  * AQE-aware: `AdaptiveSparkPlanExec` is a leaf node whose children are
  * only reachable through its public `executedPlan` (the final re-plan,
  * stable once execution finishes), and materialized stages hide their
  * subtree behind `QueryStageExec.plan` — the traversal descends
  * through both, so the breakdown reports the plan that actually ran,
  * including AQE's runtime join/skew rewrites.
  */
case class BreakdownResult(
    nodeName: String,
    simpleString: String,
    metrics: Map[String, Long])

object Breakdown {

  /** Pre-order flatten that descends into AQE wrapper nodes. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: children.flatMap(flatten)
  }

  def of(spark: SparkSession, buildDf: => DataFrame): Seq[BreakdownResult] = {
    val df = buildDf
    val qe = df.queryExecution
    // drive THIS plan instance's RDD (df.foreach / a noop write each
    // build a fresh QueryExecution whose metrics we'd never see);
    // SQLMetrics are accumulators, so task completion updates them
    // on the driver without materializing any rows here
    qe.toRdd.foreach(_ => ())
    flatten(qe.executedPlan).map { p =>
      BreakdownResult(
        p.nodeName,
        p.simpleString(25),
        p.metrics.map { case (k, m) => k -> m.value })
    }
  }
}
