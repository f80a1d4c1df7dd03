package graft

import graft.core.Benchmark
import graft.workloads.MicroBenchmarks

/** Micro-benchmark suites run through the harness end-to-end (small
  * sizes: shape coverage, not load). */
class MicroBenchSpec extends SparkSpec {

  test("join matrix runs all 4 join types") {
    val qs = MicroBenchmarks.joinMatrix(spark, sizes = Seq(1000L))
    assert(qs.size == 4)
    val bench = new Benchmark(spark)
    val exp = bench.runExperiment(qs, iterations = 1)
    exp.waitForFinish(300)
    assert(exp.failures == 0)
    // inner join of identical ranges: count == n
    val inner = exp.currentRuns.head.results.find(_.name == "join_1000_1000_inner").get
    assert(inner.result.contains(1000L))
  }

  test("agg sweep and scalar aggs complete") {
    val qs = MicroBenchmarks.aggSweep(spark, Seq(10L, 100L)) ++
      MicroBenchmarks.scalarAggs(spark, 100000L)
    val bench = new Benchmark(spark)
    val exp = bench.runExperiment(qs, iterations = 1)
    exp.waitForFinish(300)
    assert(exp.failures == 0)
  }

  test("numMatches join explodes quadratically in duplication factor") {
    val qs = MicroBenchmarks.numMatches(spark, 1000L)
    val bench = new Benchmark(spark)
    val exp = bench.runExperiment(qs, iterations = 1)
    exp.waitForFinish(300)
    val byName = exp.currentRuns.head.results.map(r => r.name -> r.result.get).toMap
    assert(byName("join_matches_1") == 1000L)
    assert(byName("join_matches_2") == 4000L)   // 2 copies x 2 copies
    assert(byName("join_matches_4") == 16000L)
    assert(byName("join_matches_8") == 64000L)
  }
}
