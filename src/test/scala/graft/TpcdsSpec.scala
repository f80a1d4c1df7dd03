package graft

import graft.datagen.RetailData
import graft.workloads.{TpcdsBenchmark, TpcdsCatalog}

/** Gates for the TPC-DS 1.4 catalog:
  *   1. all 104 queries parse, analyze, and optimize against the
  *      snapshot schema (catches column/table drift at test time);
  *   2. the runnable allowlist executes (non-degenerate: a fixed floor
  *      of them must return rows on the snapshot);
  *   3. checksums of the ImpalaKit subset are identical across shuffle
  *      partitioning configs (HashResults is an order-independent crc32
  *      sum, so this catches any partition-dependent value).
  */
class TpcdsSpec extends SparkSpec {

  private def views(): Unit = RetailData.views(spark)

  test("all 104 tpcds queries parse, analyze and optimize") {
    views()
    assert(TpcdsCatalog.defs.size == 104)
    val bad = TpcdsCatalog.defs.flatMap { case (name, sql) =>
      try { spark.sql(sql).queryExecution.optimizedPlan; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(bad.isEmpty, s"queries failing analysis:\n${bad.mkString("\n")}")
  }

  test("runnable allowlist executes on the snapshot; most are non-degenerate") {
    views()
    val counts = TpcdsCatalog.runnable.map { name =>
      name -> spark.sql(TpcdsCatalog.byName(name)).count()
    }.toMap
    // every query must run; a healthy majority must produce rows
    // (highly selective parameterizations may legitimately hit zero
    // on the small snapshot)
    val nonEmpty = counts.count(_._2 > 0)
    assert(nonEmpty >= counts.size * 7 / 10,
      s"too many degenerate results: ${counts.filter(_._2 == 0).keys.toSeq.sorted}")
  }

  test("ImpalaKit subset checksums are partition-count invariant") {
    views()
    def sums(parts: String): Map[String, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try new TpcdsBenchmark(spark, TpcdsCatalog.impalaKit)
        .queries.map(q => q.name -> q.doBenchmark().result.get).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val a = sums("4")
    val b = sums("7")
    assert(a == b, s"checksum drift: ${a.keys.filter(k => a(k) != b(k))}")
  }
}
