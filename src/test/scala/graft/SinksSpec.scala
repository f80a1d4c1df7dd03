package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Breakdown
import graft.sources.{Sinks, Tables}

/** Materialization surfaces + per-operator breakdown. */
class SinksSpec extends SparkSpec {

  test("partitioned write enables partition pruning on read") {
    val out = Files.createTempDirectory("graft-part").toString
    val orders = Tables.table(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
    Sinks.partitioned(orders, out, "status")
    val read = spark.read.parquet(out).filter(col("status") === "F")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"no partition pruning:\n$plan")
    assert(read.count() > 0)
  }

  test("clustered write produces the requested file count") {
    val out = Files.createTempDirectory("graft-clu").toString
    Sinks.clustered(Tables.table(spark, sfDir, "orders"), out, "o_custkey", 3)
    val files = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(files == 3)
  }

  test("bucketed table join avoids the shuffle exchange on the bucket side") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    val loc = new java.io.File("spark-warehouse/orders_bucketed")
    if (loc.exists) { // stale location from a killed run
      loc.listFiles.foreach(_.delete()); loc.delete()
    }
    Sinks.bucketed(Tables.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice"), "orders_bucketed", "o_orderkey", 4)
    val t = spark.table("orders_bucketed")
    val joined = t.as("a").join(t.as("b"), "o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // self-join of a bucketed table: no Exchange above either scan
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketing did not avoid shuffle:\n$plan")
  }

  test("single-file sink writes exactly one part file") {
    val out = Files.createTempDirectory("graft-one").toString + "/res"
    Sinks.singleFile(Tables.table(spark, sfDir, "nation"), out, "json")
    val parts = new java.io.File(out).listFiles.count(_.getName.startsWith("part-"))
    assert(parts == 1)
  }

  test("breakdown reports per-node metrics including rows") {
    val rows = Breakdown.of(spark,
      Tables.table(spark, sfDir, "lineitem")
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").count())
    assert(rows.exists(_.nodeName.contains("HashAggregate")))
    assert(rows.exists(_.nodeName.contains("Scan")))
    val scan = rows.find(_.nodeName.contains("Scan")).get
    assert(scan.metrics.getOrElse("numOutputRows", 0L) > 0L)
  }
}
