package graft.workloads

import graft.CatalogQuery
import graft.ext

/** Union of all workload catalogs — the engine's full query surface. */
object QueryCatalog {
  def all: Seq[CatalogQuery] =
    RelationalQueries.all ++ MiscQueries.all ++ GraphQueries.all ++ EventQueries.all ++ TypedQueries.all ++
      RetailCatalog.all ++ TpcdsOracle.all ++ ImpalaQueries.all ++
      ext.DedupQueries.all ++ ext.SimilarityQueries.all ++ ext.TextQueries.all ++
      ext.PipelineQueries.all ++ ext.MultimodalQueries.all
}
