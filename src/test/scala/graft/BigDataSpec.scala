package graft

import graft.workloads.BigDataBenchmark

/** AMPLab-style workload through the harness. */
class BigDataSpec extends SparkSpec {

  test("all 9 queries run with stable checksums") {
    val bench = new BigDataBenchmark(spark, scale = 10000L)
    val exp = bench.runExperiment(bench.queries, iterations = 2)
    exp.waitForFinish(600)
    assert(exp.failures == 0)
    // checksums identical between the two iterations
    val byIter = exp.currentRuns.map(_.results.map(r => r.name -> r.result.get).toMap)
    assert(byIter(0) == byIter(1))
    assert(byIter(0).size == 9)
  }

  test("selectivity tiers are ordered (q1A superset of q1B superset of q1C)") {
    val bench = new BigDataBenchmark(spark, scale = 10000L)
    bench.provisionTables(bench.queries)
    def n(name: String) =
      bench.queries.find(_.name == name).get.newDataFrame().count()
    assert(n("bd_q1A") > n("bd_q1B"))
    assert(n("bd_q1B") > n("bd_q1C"))
  }
}
