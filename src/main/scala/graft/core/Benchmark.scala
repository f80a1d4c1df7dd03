package graft.core

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A configuration dimension swept during an experiment (reference
  * `P/Benchmark.scala:60-92` Variation): the experiment runs the full
  * cartesian product of all variations' options. */
case class Variation[T](name: String, options: Seq[T])(val setup: T => Unit)

/** Experiment orchestration (reference `P/Benchmark.scala:109-549`,
  * redesigned without runtime reflection: tables and queries are
  * explicit registries — Scala 2.13-safe, and the discovery surface the
  * reflection provided is now just `Map` lookups).
  *
  * An experiment = iterations × cartesian(variations) × queries, run
  * asynchronously; results accumulate as `ExperimentRun` records and
  * are written as single-file JSON for the self-hosted analysis
  * queries.
  */
class Benchmark(
    val spark: SparkSession,
    val resultsLocation: String = "/tmp/graft-results") {

  /** Named tables this benchmark can provision (name → DataFrame). */
  def allTables: Map[String, DataFrame] = Map.empty

  /** Register every not-yet-registered table from `allTables`
    * (`P/Benchmark.scala:342-374` auto-provisioning semantics, via temp
    * views instead of saveAsTable — no metastore dependency).
    *
    * All registry tables are registered, not just referenced ones:
    * name extraction can only work pre-analysis for SQL-text queries
    * (DataFrame builders analyze eagerly and throw on missing tables,
    * and probing them would also eagerly run any actions inside the
    * builder). Temp views are lazy, so over-registration costs nothing.
    *
    * Registration always replaces: a table in this benchmark's own
    * registry must reflect *this* benchmark's configuration, even if a
    * previous benchmark in the same session registered the same name
    * at a different scale.
    */
  def provisionTables(queries: Seq[Query]): Unit =
    allTables.foreach { case (name, df) => df.createOrReplaceTempView(name) }

  private def crossProduct(variations: Seq[Variation[_]]): Seq[Seq[(Variation[_], Any)]] =
    variations.foldLeft(Seq(Seq.empty[(Variation[_], Any)])) { (acc, v) =>
      for (combo <- acc; opt <- v.options) yield combo :+ (v -> (opt: Any))
    }

  private def currentConfiguration(): BenchmarkConfiguration =
    BenchmarkConfiguration(
      sparkVersion = spark.version,
      scalaVersion = scala.util.Properties.versionNumberString,
      sqlConf = spark.conf.getAll,
      defaultParallelism = spark.sparkContext.defaultParallelism)

  /** Handle on a running experiment (`ExperimentStatus` in the
    * reference, `P/Benchmark.scala:299-549`). */
  class ExperimentStatus(
      queries: Seq[Query],
      iterations: Int,
      variations: Seq[Variation[_]],
      tags: Map[String, String],
      timeoutMs: Long) {

    val timestamp: Long = System.currentTimeMillis()
    @volatile var currentRuns: Seq[ExperimentRun] = Nil
    @volatile var currentQuery: String = ""
    @volatile var failures: Int = 0

    val resultPath = s"$resultsLocation/timestamp=$timestamp"

    @volatile var error: Option[Throwable] = None

    private val work: Future[Unit] = Future {
      try {
        val combos = crossProduct(variations)
        val runs = for {
          i <- 1 to iterations
          combo <- combos
        } yield {
          combo.foreach { case (v, opt) =>
            v.asInstanceOf[Variation[Any]].setup(opt)
          }
          val comboTags = combo.map { case (v, opt) => v.name -> opt.toString }.toMap
          val results = queries.map { q =>
            currentQuery = q.name
            val r = q.benchmarkWithTimeout(spark, timeoutMs)
            if (r.failure.isDefined) failures += 1
            r
          }
          val run = ExperimentRun(timestamp, i, tags ++ comboTags,
            currentConfiguration(), results)
          currentRuns = currentRuns :+ run
          run
        }
        import spark.implicits._
        spark.createDataset(runs).coalesce(1).write.mode("overwrite").json(resultPath)
      } catch {
        case t: Throwable =>
          // surface setup/sink failures to pollers, not only to
          // waitForFinish callers
          error = Some(t)
          throw t
      } finally {
        // post-run block cleanup (`P/Benchmarkable.scala:58-65`
        // semantics on public API), even on failure: drop cached blocks
        // so back-to-back experiments don't compound memory pressure
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }

    /** Minimal HTML status report (`P/Benchmark.scala:518-548`). */
    def statusHtml(): String = {
      val done = currentRuns.size
      s"""<html><body>
         |<h1>Experiment $timestamp</h1>
         |<b>Runs completed:</b> $done<br/>
         |<b>Current query:</b> $currentQuery<br/>
         |<b>Failures:</b> $failures<br/>
         |</body></html>""".stripMargin
    }

    def waitForFinish(timeoutSeconds: Int): Unit =
      Await.result(work, Duration(timeoutSeconds, "s"))

    /** Per-query stats over completed runs (reference
      * `P/RunBenchmark.scala:155-174`). */
    def getCurrentResults(): DataFrame = {
      import spark.implicits._
      // empty case keeps the full schema (spark.emptyDataFrame has no
      // columns and would break downstream selects)
      spark.createDataset(currentRuns).toDF()
        .select(col("iteration"), explode(col("results")).as("result"))
        .select(col("iteration"), col("result.*"))
    }

    def summarize(): DataFrame =
      getCurrentResults()
        .filter(col("failure").isNull)
        .groupBy(col("name"))
        .agg(
          min(col("executionTime")).as("minTimeMs"),
          max(col("executionTime")).as("maxTimeMs"),
          avg(col("executionTime")).as("avgTimeMs"),
          stddev(col("executionTime")).as("stdDev"))
        .orderBy(col("name"))
  }

  def runExperiment(
      queries: Seq[Query],
      iterations: Int = 3,
      variations: Seq[Variation[_]] = Nil,
      tags: Map[String, String] = Map.empty,
      timeoutMs: Long = 1000 * 60 * 30): ExperimentStatus = {
    provisionTables(queries)
    new ExperimentStatus(queries, iterations, variations, tags, timeoutMs)
  }
}

object Benchmark {

  /** Read results back and summarize across experiments (reference
    * `P/RunBenchmark.scala:150-196` baseline comparison). */
  def analyze(spark: SparkSession, resultsLocation: String): DataFrame = {
    // note: fields that were null in every record (e.g. `failure` on a
    // clean run) are absent from the written JSON entirely — only
    // reference fields guaranteed present
    spark.read.json(s"$resultsLocation/timestamp=*")
      .select(col("timestamp"), explode(col("results")).as("result"))
      .select(col("timestamp"), col("result.name").as("name"),
        col("result.executionTime").as("executionTime"))
      .filter(col("executionTime").isNotNull)
      .groupBy(col("timestamp"), col("name"))
      .agg(min("executionTime").as("minTimeMs"),
        max("executionTime").as("maxTimeMs"),
        avg("executionTime").as("avgTimeMs"))
      .orderBy(col("timestamp"), col("name"))
  }

  /** Dashboard score per the reference's published methodology
    * (`src/main/notebooks/performance.dashboard.scala:106-147`):
    * drop each query's first iteration as warmup, take the median of
    * the remaining iterations, and score the run as the GEOMETRIC
    * mean of those medians — medians resist stragglers, the geomean
    * weights every query equally regardless of absolute runtime.
    * Returns one row per timestamp: (timestamp, queries, scoreMs). */
  def dashboardScore(spark: SparkSession, resultsLocation: String): DataFrame = {
    val runs = spark.read.json(s"$resultsLocation/timestamp=*")
      .select(col("timestamp"), col("iteration"), explode(col("results")).as("result"))
      .select(col("timestamp"), col("iteration"), col("result.name").as("name"),
        col("result.executionTime").as("executionTime"))
      .filter(col("executionTime").isNotNull)
    val iterStats = runs.groupBy(col("timestamp"), col("name"))
      .agg(min(col("iteration")).as("warmupIteration"),
        countDistinct(col("iteration")).as("nIter"))
    val medians = runs.join(iterStats, Seq("timestamp", "name"))
      // single-iteration runs have nothing to drop
      .filter(col("nIter") === 1 || col("iteration") =!= col("warmupIteration"))
      .groupBy(col("timestamp"), col("name"))
      .agg(expr("percentile(executionTime, 0.5)").as("medianMs"))
    medians.groupBy(col("timestamp"))
      .agg(count(lit(1)).as("queries"),
        exp(avg(log(col("medianMs")))).as("scoreMs"))
      .orderBy(col("timestamp"))
  }

  /** Percent change of this run vs a baseline timestamp
    * (`P/RunBenchmark.scala:177-196`). */
  def compareToBaseline(spark: SparkSession, resultsLocation: String,
      baselineTimestamp: Long, currentTimestamp: Long): DataFrame = {
    val stats = analyze(spark, resultsLocation)
      .filter(col("timestamp").isin(baselineTimestamp, currentTimestamp))
    val base = stats.filter(col("timestamp") === baselineTimestamp)
      .select(col("name"), col("avgTimeMs").as("baselineMs"))
    val cur = stats.filter(col("timestamp") === currentTimestamp)
      .select(col("name"), col("avgTimeMs").as("currentMs"))
    base.join(cur, "name")
      .withColumn("percentChange",
        round((col("currentMs") - col("baselineMs")) * 100.0 / col("baselineMs"), 2))
      .orderBy(col("name"))
  }
}
