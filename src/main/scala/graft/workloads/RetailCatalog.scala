package graft.workloads

import graft.CatalogQuery
import graft.datagen.RetailData

/** Correctness surface for the retail suite: every rq* query as a
  * driver-facing CatalogQuery over the deterministic parquet snapshot,
  * with a value-level DuckDB oracle (the oracle SQL binds each table
  * name to the snapshot's parquet files by absolute path — see
  * [[RetailData.duckOracle]]). This graduates the retail suite from
  * checksum self-stability (which a deterministically wrong answer
  * passes) to real cross-engine value equality.
  */
object RetailCatalog {

  val all: Seq[CatalogQuery] = RetailQueries.defs.map { case (name, desc, sql) =>
    CatalogQuery(
      name,
      desc + " [retail snapshot]",
      (s, _) => { RetailData.views(s); s.sql(sql) },
      Some(RetailData.duckOracle(RetailQueries.duckDialect(sql))))
  }
}
