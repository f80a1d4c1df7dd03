package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named, benchmarkable query (reference `P/Query.scala:29-169`).
  *
  * `buildDataFrame` is by-name so every benchmark run re-derives a
  * fresh logical plan (no cached analysis between iterations —
  * cf. reference `P/Query.scala:29-31,63`). Phase times are read off
  * the public `df.queryExecution` lazy vals: forcing each val in order
  * isolates parse/analyze/optimize/plan wall time
  * (`P/Query.scala:73-84`).
  */
class Query(
    val name: String,
    buildDataFrame: => DataFrame,
    val description: String = "",
    val sqlText: Option[String] = None,
    val executionMode: ExecutionMode = ExecutionMode.CountResults) {

  def newDataFrame(): DataFrame = buildDataFrame

  /** Tables referenced by the (analyzed) plan — used for
    * auto-provisioning (`P/Benchmark.scala:342-374` semantics). */
  def tablesInvolved: Set[String] = {
    val plan = newDataFrame().queryExecution.analyzed
    plan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.tableName
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.catalogTable.map(_.identifier.table).getOrElse("")
    }.filter(_.nonEmpty).toSet
  }

  /** Table names without requiring analysis: spark.sql resolves
    * eagerly, so for SQL-text queries over not-yet-registered tables
    * the names must come from the *parsed* (unresolved) plan. */
  def referencedTables(spark: SparkSession): Set[String] = sqlText match {
    case Some(txt) =>
      spark.sessionState.sqlParser.parsePlan(txt).collect {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          r.tableName
      }.toSet
    case None =>
      scala.util.Try(tablesInvolved).getOrElse(Set.empty)
  }

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e6, r)
  }

  /** One measured run. Never throws: failures are recorded
    * (`P/Query.scala:157-163`). Per-node metric breakdown is the
    * separate `Breakdown.of` diagnostic (AQE-aware). */
  def doBenchmark(): BenchmarkResult = {
    try {
      val df = newDataFrame()
      val qe = df.queryExecution
      val (parseT, _) = timed(qe.logical)
      val (analysisT, _) = timed(qe.analyzed)
      val (optT, _) = timed(qe.optimizedPlan)
      val (planT, _) = timed(qe.executedPlan)
      // scrape join types from the optimized logical plan: under AQE the
      // executed plan is a single AdaptiveSparkPlanExec wrapper until
      // execution, so physical node names aren't visible yet
      val joinTypes = qe.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          s"${j.joinType.sql} Join"
      }.distinct

      val (execT, scalar) = timed {
        executionMode match {
          case ExecutionMode.CollectResults => df.collect().length.toLong
          case ExecutionMode.ForeachResults => df.foreach(_ => ()); 0L
          case ExecutionMode.CountResults => df.count()
          case ExecutionMode.WriteParquet(loc) =>
            df.write.mode("overwrite").parquet(s"$loc/$name.parquet"); 0L
          case ExecutionMode.HashResults =>
            val row = df
              .selectExpr("sum(crc32(concat_ws(',', *))) AS checksum")
              .head()
            if (row.isNullAt(0)) 0L else row.getLong(0)
        }
      }

      BenchmarkResult(
        name = name,
        mode = executionMode.name,
        parsingTime = Some(parseT),
        analysisTime = Some(analysisT),
        optimizationTime = Some(optT),
        planningTime = Some(planT),
        executionTime = Some(execT),
        result = Some(scalar),
        joinTypes = joinTypes)
    } catch {
      // Throwable, not Exception: a fatal Error (driver OOM on collect,
      // codegen StackOverflowError) must be RECORDED — letting it kill
      // the runner thread makes benchmarkWithTimeout mislabel the death
      // as a timeout
      case e: Throwable =>
        BenchmarkResult(name = name, mode = executionMode.name,
          failure = Some(Failure(e.getClass.getName,
            Option(e.getMessage).getOrElse("").take(2000))))
    }
  }

  /** Run with a timeout: the query executes in a daemon thread inside
    * its own job group; on timeout the job group is cancelled
    * (`P/Benchmarkable.scala:67-107` semantics on public API).
    */
  def benchmarkWithTimeout(spark: SparkSession, timeoutMs: Long): BenchmarkResult = {
    @volatile var result: Option[BenchmarkResult] = None
    val jobGroup = s"graft-$name-${System.nanoTime()}"
    val runner = new Thread(s"benchmark runner $name") {
      override def run(): Unit = {
        spark.sparkContext.setJobGroup(jobGroup, s"benchmark $name", true)
        try result = Some(doBenchmark())
        finally spark.sparkContext.clearJobGroup()
      }
    }
    runner.setDaemon(true)
    runner.start()
    runner.join(timeoutMs)
    result.getOrElse {
      spark.sparkContext.cancelJobGroup(jobGroup)
      runner.interrupt()
      BenchmarkResult(name = name, mode = executionMode.name,
        failure = Some(Failure("Timeout", s"did not finish within ${timeoutMs}ms")))
    }
  }
}

object Query {
  /** SQL-text query (reference `P/Benchmark.scala:200-207`). */
  def sql(spark: SparkSession, name: String, sqlText: String,
      description: String = "",
      executionMode: ExecutionMode = ExecutionMode.CountResults): Query =
    new Query(name, spark.sql(sqlText), description, Some(sqlText), executionMode)
}
