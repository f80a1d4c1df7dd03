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
  * engine-specific float formatting (rounded decimal averages q9/q28,
  * stddev q17/q39). The decimal-division-membership family
  * (q4/q11/q31/q74) is covered by derived `_exact` variants below;
  * the verbatim forms remain checksum-gated.
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

  /** The year-over-year growth family (q4/q11/q74) and the county
    * growth query (q31) hinge on DECIMAL-division comparisons where
    * Spark and DuckDB derive different result scales, so their verbatim
    * forms stay checksum-gated. These `_exact` variants are derived
    * mechanically from the catalog text: every channel total becomes
    * exact BIGINT cents and every growth ratio divides as IEEE DOUBLE —
    * exact integers < 2^53 divide to the identical double in both
    * engines (same trick that oracles q12/q20/q98's ratio-to-report),
    * turning row membership into a value-checkable predicate. */
  private val exactNames = Seq("q4", "q11", "q31", "q74")

  private[workloads] def exactForm(sql: String): String = sql
    .replaceAll(
      """sum\((.*?)\) AS (year_total|store_sales|web_sales)""",
      "CAST(sum($1) * 100 AS BIGINT) AS $2")
    .replaceAll("""sum\((.*?)\), '([csw])'""", "CAST(sum($1) * 100 AS BIGINT), '$2'")
    .replaceAll(
      """(\w+\.(?:year_total|store_sales|web_sales)) /""",
      "CAST($1 AS DOUBLE) /")

  val all: Seq[CatalogQuery] = names.map { name =>
    val sql = TpcdsCatalog.byName(name)
    CatalogQuery(
      s"tpcds_$name",
      s"TPC-DS 1.4 $name [retail snapshot, DuckDB-oracled]",
      (s, _) => { RetailData.views(s); s.sql(sql) },
      Some(RetailData.duckOracle(RetailQueries.duckDialect(sql))))
  } ++ exactNames.map { name =>
    val sql = exactForm(TpcdsCatalog.byName(name))
    CatalogQuery(
      s"tpcds_${name}_exact",
      s"TPC-DS 1.4 $name, growth ratios reformulated integer-exact [DuckDB-oracled]",
      (s, _) => { RetailData.views(s); s.sql(sql) },
      Some(RetailData.duckOracle(RetailQueries.duckDialect(sql))))
  }
}
