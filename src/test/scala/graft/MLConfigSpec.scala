package graft

import graft.ml.{MLParams, MLYaml, MLBenchmarksRunner}

/** YAML config parsing, cartesian expansion semantics, and the
  * free-form experiment flow end-to-end into the JSON results sink. */
class MLConfigSpec extends SparkSpec {

  private val sample =
    """# comment
      |output: /tmp/graft-ml-test
      |timeoutSeconds: 600
      |iterations: 2
      |common:
      |  numExamples: [1000, 2000]
      |  numFeatures: 5
      |benchmarks:
      |  - name: LogisticRegression
      |  - name: KMeans
      |    params:
      |      k: [3, 4]
      |      numExamples: 1500
      |""".stripMargin

  test("cartesian expansion: lists multiply, scalars ride along, overrides replace") {
    val cfg = MLYaml.parse(sample)
    assert(cfg.output == "/tmp/graft-ml-test")
    assert(cfg.iterations == 2 && cfg.timeoutSeconds == 600)
    // LogisticRegression: 2 numExamples x 1 numFeatures = 2 cells;
    // KMeans: numExamples overridden to scalar, k: [3,4] -> 2 cells
    val lr = cfg.experiments.filter(_._1 == "LogisticRegression")
    val km = cfg.experiments.filter(_._1 == "KMeans")
    assert(lr.map(_._2) == Seq(
      MLParams(numExamples = 1000, numFeatures = 5),
      MLParams(numExamples = 2000, numFeatures = 5)))
    assert(km.map(_._2).toSet == Set(
      MLParams(numExamples = 1500, numFeatures = 5, k = 3),
      MLParams(numExamples = 1500, numFeatures = 5, k = 4)))
  }

  test("strict field mapping: unknown params key fails loudly") {
    val bad = sample + "  - name: LDA\n    params:\n      bogusKnob: 7\n"
    val e = intercept[IllegalArgumentException](MLYaml.parse(bad))
    assert(e.getMessage.contains("bogusKnob"))
  }

  test("unknown algorithm name fails loudly") {
    val e = intercept[RuntimeException](
      MLBenchmarksRunner.cell(spark, "NotAnAlgo", MLParams(), "x"))
    assert(e.getMessage.contains("NotAnAlgo"))
  }

  test("config grid runs through the experiment sink: one JSON result per cell") {
    val cfg = MLYaml.parse(
      """output: /tmp/graft-ml-test-run
        |timeoutSeconds: 600
        |iterations: 1
        |common:
        |  numExamples: 500
        |  numFeatures: 5
        |benchmarks:
        |  - name: LogisticRegression
        |    params:
        |      numExamples: [500, 800]
        |""".stripMargin)
    assert(cfg.experiments.size == 2)
    val exp = MLBenchmarksRunner.runConfig(spark, cfg)
    exp.waitForFinish(600)
    assert(exp.failures == 0)
    val results = spark.read.json(exp.resultPath)
    import org.apache.spark.sql.functions._
    val rows = results.select(explode(col("results")).as("r")).select("r.*")
    assert(rows.count() == 2)
    assert(rows.filter(col("mode") === "freeform").count() == 2)
    // timed fit + a recorded quality metric (testMetric * 1e6)
    assert(rows.filter(col("executionTime") > 0).count() == 2)
    assert(rows.filter(col("result") > 0).count() == 2)
  }
}
