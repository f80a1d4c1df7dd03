package graft.workloads

import graft.CatalogQuery
import graft.datagen.RetailData

/** Value-level oracle gate for the TPC-DS catalog: the subset of
  * queries whose SQL is engine-portable AND whose output columns are
  * parity-safe (strings, BIGINT counts, exact integer cents from
  * decimal sums) runs in DuckDB over the same snapshot parquet and
  * must match Spark value-for-value — a strictly stronger check than
  * TpcdsSpec's checksum stability.
  *
  * Excluded by design: queries whose OUTPUT carries raw DECIMAL or
  * engine-specific float formatting (ratio columns q12/q20/q98, rounded
  * decimal averages q9/q28, stddev q17/q39), and those whose row
  * membership hinges on decimal-division comparisons where the two
  * engines' division type rules differ (q4/q11/q31/q74), and q47 whose
  * window avg is exact DECIMAL in Spark but DOUBLE in DuckDB (the
  * cents cast then truncates differently). Those remain
  * checksum-gated.
  */
object TpcdsOracle {

  /** Oracle-safe query names (36 of 104). q12/q20/q98's ratio-to-report
    * qualifies because the ratio divides exact integer cents (BIGINT /
    * BIGINT → the same IEEE double in both engines); q47/q57's window
    * average is integer-exact (windowed cents sum ÷ windowed count,
    * with the 10% deviation predicate cross-multiplied into integer
    * form). */
  val names: Seq[String] = Seq(
    "q1", "q3", "q12", "q15", "q16", "q19", "q20", "q21", "q25", "q29",
    "q30", "q34", "q38", "q40", "q42", "q43", "q45", "q46", "q47", "q50",
    "q52", "q55", "q57", "q62", "q68", "q71", "q73", "q76", "q79", "q87",
    "q88", "q93", "q96", "q97", "q98", "q99")

  val all: Seq[CatalogQuery] = names.map { name =>
    val sql = TpcdsCatalog.byName(name)
    CatalogQuery(
      s"tpcds_$name",
      s"TPC-DS 1.4 $name [retail snapshot, DuckDB-oracled]",
      (s, _) => { RetailData.views(s); s.sql(sql) },
      Some(RetailData.duckOracle(RetailQueries.duckDialect(sql))))
  }
}
