package graft.workloads

import org.apache.spark.sql.SparkSession

import graft.core.{Benchmark, ExecutionMode, Query}
import graft.datagen.RetailData

/** The assembled TPC-DS v1.4 catalog: all 99 queries by name (q1–q99,
  * with the q14/q23/q24/q39 a/b variants and qSsMax — 104 entries),
  * the curated `runnable` allowlist, and the ImpalaKit-style
  * interactive / reporting / deepAnalytic groupings.
  *
  * Re-expresses the reference's catalog surface
  * (`P/tpcds/TPCDS_1_4_Queries.scala:36-3861` query set,
  * `:3866-3877` runnable allowlist;
  * `P/tpcds/ImpalaKitQueries.scala:1465-1469` groupings) over the
  * generated star schema.
  */
object TpcdsCatalog {

  /** name -> SQL, all 104 entries. */
  val defs: Seq[(String, String)] =
    TpcdsQueries1.defs ++ TpcdsQueries2.defs ++ TpcdsQueries3.defs

  /** Resolves both the TPC-DS names and the ImpalaKit variants, so a
    * benchmark built from a grouping can mix the two catalogs. */
  val byName: Map[String, String] = defs.toMap ++ ImpalaQueries.byName

  /** Multi-CTE giants staged out of the default execution set — each
    * makes 3+ full passes over every sales channel (q14: cross-channel
    * item intersect + avg subquery per HAVING; q23: three stacked
    * customer CTEs; q64: 19-table two-year self-join; q72: catalog ×
    * weekly-inventory equi-explosion). They parse, plan, and execute,
    * but a scale run schedules them deliberately, exactly like the
    * reference's allowlist concept. */
  val heavy: Set[String] = Set("q14a", "q14b", "q23a", "q23b", "q64", "q72")

  /** Queries in the default execution set (98 of 104). */
  val runnable: Seq[String] = defs.map(_._1).filterNot(heavy)

  // ImpalaKit groupings (reference ImpalaKitQueries.scala:1465-1469):
  // these point at the Impala-dialect variants, exactly as the
  // reference's groupings do — the plain q-name TPC-DS transcriptions
  // stay in `runnable`.
  val interactive: Seq[String] = ImpalaQueries.interactive
  val reporting: Seq[String] = ImpalaQueries.reporting
  val deepAnalytic: Seq[String] = ImpalaQueries.deepAnalytic
  val impalaKit: Seq[String] = ImpalaQueries.impalaKit
}

/** TPC-DS suite, checksum-gated (HashResults: order-independent sum of
  * row crc32s, so a result must be value-stable across runs,
  * partitionings, and configs).
  *
  * `names` picks the subset (default: the runnable allowlist).
  * `factRows = 0` (default) runs over the fixed parquet snapshot — the
  * corpus DuckDB value-checks; `factRows > 0` regenerates the whole
  * schema at that scale in-flight (generators are pure hash(id, seed)),
  * which is how the suite demonstrates 100×+ headroom with identical
  * plans. */
class TpcdsBenchmark(spark: SparkSession,
    names: Seq[String] = TpcdsCatalog.runnable,
    resultsLocation: String = "/tmp/graft-results",
    factRows: Long = 0L)
    extends Benchmark(spark, resultsLocation) {

  override def allTables: Map[String, org.apache.spark.sql.DataFrame] =
    if (factRows > 0) graft.datagen.StarSchema.tables(spark, factRows)
    else {
      RetailData.ensure(spark)
      RetailData.tableNames.map(n =>
        n -> spark.read.parquet(s"${RetailData.dir}/$n")).toMap
    }

  def queries: Seq[Query] = names.map { name =>
    val sql = TpcdsCatalog.byName(name)
    new Query(name, spark.sql(sql), s"TPC-DS 1.4 $name", Some(sql),
      ExecutionMode.HashResults)
  }
}
