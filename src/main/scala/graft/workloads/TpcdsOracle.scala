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
  * Excluded by design: only the decimal-division-membership family
  * (q4/q11/q31/q74), covered by derived `_exact` variants below; the
  * verbatim forms remain checksum-gated. Every other catalog query is
  * value-oracled — DECIMAL averages are stated in exact-cents DOUBLE
  * form in the catalog text itself (see `names` note).
  */
object TpcdsOracle {

  /** Oracle-safe query names — 99 of the 103 catalog entries; the four
    * missing (q4/q11/q31/q74) are the DECIMAL-division-membership
    * family covered by the `_exact` variants below. Ratio outputs
    * qualify because they divide exact integer cents as IEEE DOUBLE
    * (identical in both engines); averages over DECIMAL columns are
    * stated as exact-cents BIGINT sums divided as DOUBLE (q9/q18/q22/
    * q26/q27/q85/q89 form); q47/q57's window average is integer-exact
    * with the 10% deviation predicate cross-multiplied; q1/q30's
    * correlated avg threshold is cross-multiplied likewise. */
  val names: Seq[String] = Seq(
    "q1", "q2", "q3", "q5", "q6", "q7", "q8", "q9", "q10", "q12", "q13",
    "q14a", "q14b", "q15", "q16", "q17", "q18", "q19", "q20", "q21",
    "q22", "q23a", "q23b", "q24a", "q24b", "q25", "q26", "q27", "q28",
    "q29", "q30", "q32", "q33", "q34", "q35", "q36", "q37", "q38",
    "q39a", "q39b", "q40", "q41", "q42", "q43", "q44", "q45", "q46",
    "q47", "q48", "q49", "q50", "q51", "q52", "q53", "q54", "q55",
    "q56", "q57", "q58", "q59", "q60", "q61", "q62", "q63", "q64",
    "q65", "q66", "q67", "q68", "q69", "q70", "q71", "q72", "q73",
    "q75", "q76", "q77", "q78", "q79", "q80", "q81", "q82", "q83",
    "q84", "q85", "q86", "q87", "q88", "q89", "q90", "q91", "q92",
    "q93", "q94", "q95", "q96", "q97", "q98", "q99")

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
