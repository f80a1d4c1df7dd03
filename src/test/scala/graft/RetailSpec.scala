package graft

import graft.core.ExecutionMode
import graft.workloads.{RetailBenchmark, RetailQueries}

/** Retail star-schema suite: auto-provisioning from parsed SQL,
  * checksum determinism across runs and input partitionings. */
class RetailSpec extends SparkSpec {

  private val factRows = 100000L

  test("experiment auto-provisions tables and all queries succeed") {
    spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(_.name)
      .filter(Set("date_dim", "item", "store", "customer_dim", "store_sales"))
      .foreach(spark.catalog.dropTempView)
    val bench = new RetailBenchmark(spark, factRows)
    val exp = bench.runExperiment(bench.queries, iterations = 1)
    exp.waitForFinish(600)
    assert(exp.failures == 0)
    val results = exp.currentRuns.head.results
    assert(results.size == RetailQueries.defs.size)
    assert(results.forall(_.result.isDefined))
  }

  test("checksums are stable across runs and input repartitioning") {
    val bench = new RetailBenchmark(spark, factRows)
    bench.provisionTables(bench.queries)
    val first = bench.queries.map(q => q.name -> q.doBenchmark().result.get).toMap

    // re-register fact table with a different partitioning: results
    // must not change (hash determinism + order-insensitive checksum)
    graft.datagen.StarSchema.tables(spark, factRows)
      .map { case (n, df) => n -> df.repartition(13) }
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val second = bench.queries.map(q => q.name -> q.doBenchmark().result.get).toMap
    assert(first == second, s"checksum drift: $first vs $second")
  }

  test("rq6 date-range scan is selective") {
    val bench = new RetailBenchmark(spark, factRows)
    bench.provisionTables(bench.queries)
    val q = bench.queries.find(_.name == "rq6_date_range_scan").get
    val rows = q.newDataFrame().collect()
    assert(rows.nonEmpty && rows.length <= 3) // at most years 2021-2022
  }
}
