package graft.core

/** Free-form benchmarkable: arbitrary non-DataFrame work flowing
  * through the same experiment machinery and results schema as SQL
  * queries — the reference's `SparkPerfResults` prepare()/run() mode
  * (`P/Benchmark.scala:231-269`), re-expressed as a Query subclass so
  * timeouts, job-group cancellation, failure capture, the JSON results
  * sink and the analysis queries all apply unchanged.
  *
  * `prepare` runs untimed (data generation / cache warm-up); `run` is
  * the timed body and may return a quality metric, recorded in the
  * `result` column as `round(metric * 1e6)` (the schema's scalar slot
  * is integral).
  */
class FreeformQuery(
    name: String,
    description: String,
    prepare: () => Unit,
    runBody: () => Option[Double])
  extends Query(
    name,
    sys.error(s"free-form benchmarkable $name has no DataFrame"),
    description, None, ExecutionMode.ForeachResults) {

  override def doBenchmark(): BenchmarkResult =
    try {
      prepare()
      val t0 = System.nanoTime()
      val metric = runBody()
      val ms = (System.nanoTime() - t0) / 1e6
      BenchmarkResult(name = name, mode = "freeform",
        executionTime = Some(ms),
        result = metric.map(m => math.round(m * 1e6)))
    } catch {
      case e: Throwable =>
        BenchmarkResult(name = name, mode = "freeform",
          failure = Some(Failure(e.getClass.getName,
            Option(e.getMessage).getOrElse("").take(2000))))
    }
}
