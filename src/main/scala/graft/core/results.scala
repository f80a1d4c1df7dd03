package graft.core

/** Result model for experiment runs, written as JSON and re-analyzed
  * with Spark SQL. Port of the reference's nested record schema
  * (`P/results.scala:28-85`): ExperimentRun{timestamp, iteration, tags,
  * configuration, results[]} — the only nested/array data in the
  * system, deliberately kept so the self-analysis queries (explode +
  * groupBy) exercise generators and struct access.
  */
case class Failure(className: String, message: String)

case class BenchmarkResult(
    name: String,
    mode: String,
    parsingTime: Option[Double] = None,
    analysisTime: Option[Double] = None,
    optimizationTime: Option[Double] = None,
    planningTime: Option[Double] = None,
    executionTime: Option[Double] = None,
    /** Mode-dependent scalar: row count (Count/Collect/Foreach) or
      * crc32 checksum (HashResults). */
    result: Option[Long] = None,
    joinTypes: Seq[String] = Nil,
    failure: Option[Failure] = None)

case class BenchmarkConfiguration(
    sparkVersion: String,
    scalaVersion: String,
    sqlConf: Map[String, String],
    defaultParallelism: Int)

case class ExperimentRun(
    timestamp: Long,
    iteration: Int,
    tags: Map[String, String],
    configuration: BenchmarkConfiguration,
    results: Seq[BenchmarkResult])
