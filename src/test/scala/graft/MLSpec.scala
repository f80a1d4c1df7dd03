package graft

import graft.ml.{MLBenchmarks, MLParams}

/** All 9 ML benchmark algorithms fit + score on small seeded data, and
  * learn actual structure (the generators embed a true model). */
class MLSpec extends SparkSpec {

  private val params = MLParams(numExamples = 2000, numFeatures = 8, k = 3,
    vocabSize = 30, numUsers = 50, numItems = 50)

  test("classification algorithms beat chance on separable data") {
    for (algo <- Seq(MLBenchmarks.LogisticRegressionBenchmark,
        MLBenchmarks.DecisionTreeBenchmark,
        MLBenchmarks.RandomForestBenchmark, MLBenchmarks.GBTBenchmark)) {
      val r = algo.run(spark, params)
      assert(r.testMetric > 0.7, s"${algo.name} test metric ${r.testMetric}")
      assert(r.trainingTimeMs > 0)
    }
  }

  test("regression algorithms recover the linear model (r2 > 0.8)") {
    for (algo <- Seq(MLBenchmarks.LinearRegressionBenchmark, MLBenchmarks.GLMBenchmark)) {
      val r = algo.run(spark, params)
      assert(r.testMetric > 0.8, s"${algo.name} r2 ${r.testMetric}")
    }
  }

  test("kmeans separates the generated clusters (silhouette > 0.5)") {
    val r = MLBenchmarks.KMeansBenchmark.run(spark, params)
    assert(r.testMetric > 0.5, s"silhouette ${r.testMetric}")
  }

  test("LDA fits and reports finite perplexity") {
    val r = MLBenchmarks.LDABenchmark.run(spark, params.copy(numExamples = 500))
    assert(!r.testMetric.isNaN && !r.testMetric.isInfinite)
  }

  test("ALS learns the rating structure (rmse < 1.0)") {
    val r = MLBenchmarks.ALSBenchmark.run(spark, params.copy(numExamples = 5000))
    assert(r.trainMetric < 1.0, s"train rmse ${r.trainMetric}")
  }
}
