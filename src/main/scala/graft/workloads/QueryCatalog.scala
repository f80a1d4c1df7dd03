package graft.workloads

import graft.CatalogQuery

/** Union of all workload catalogs — the engine's full query surface. */
object QueryCatalog {
  def all: Seq[CatalogQuery] =
    RelationalQueries.all ++ GraphQueries.all ++ EventQueries.all ++ TypedQueries.all
}
