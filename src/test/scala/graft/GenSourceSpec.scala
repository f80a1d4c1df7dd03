package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native DSv2 generator source (sources/GenSource): determinism
  * under repartitioning, honored options, column pruning reaching the
  * reader, and id-range filter pushdown narrowing the generated span. */
class GenSourceSpec extends SparkSpec {

  private def read(parts: Int, rows: Long = 10000L): DataFrame =
    spark.read.format("graft-gen")
      .option("rows", rows).option("seed", 7).option("partitions", parts)
      .load()

  private def checksum(df: DataFrame): Long =
    df.agg(expr("bit_xor(xxhash64(id, grp, val, tag))"))
      .collect()(0).getLong(0)

  test("graft-gen: deterministic content under any partitioning; options honored") {
    val a = read(3)
    val b = read(11)
    assert(a.count() == 10000 && b.count() == 10000)
    assert(a.rdd.getNumPartitions == 3 && b.rdd.getNumPartitions == 11)
    assert(checksum(a) == checksum(b),
      "partitioning changed generated content — the pure-hash contract is broken")
    // values in their documented ranges
    assert(a.filter(col("grp") < 0 || col("grp") >= 100).count() == 0)
    assert(a.select(countDistinct(col("tag"))).collect()(0).getLong(0) == 8)
  }

  test("graft-gen: column pruning reaches the reader") {
    val df = read(4).select("grp")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan in the plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("grp"),
      s"reader not pruned: ${scans.head.scan.readSchema()}")
  }

  test("graft-gen: id-range pushdown narrows the span before partition planning") {
    val df = read(4).filter(col("id") >= 9000L && col("id") < 9500L)
    assert(df.count() == 500)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("PushedIdRange: [9000, 9500)"),
      s"range not pushed: ${scans.head.scan.description()}")
    // pushdown must not change results vs post-scan filtering
    val viaPost = read(4).collect()
      .filter(r => r.getLong(0) >= 9000L && r.getLong(0) < 9500L)
      .map(_.toString).sorted.toSeq
    assert(df.collect().map(_.toString).sorted.toSeq == viaPost)
  }
}
