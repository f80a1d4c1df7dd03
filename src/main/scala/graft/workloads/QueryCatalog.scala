package graft.workloads

import graft.CatalogQuery
import graft.ext

/** Union of all workload catalogs — the engine's full query surface. */
object QueryCatalog {
  /** The LLM-data-pipeline suites (SURVEY §2.14) — the single source
    * for both `all` and RunBenchmark's `-b pipeline`. */
  def pipeline: Seq[CatalogQuery] =
    ext.DedupQueries.all ++ ext.SimilarityQueries.all ++ ext.TextQueries.all ++
      ext.PipelineQueries.all ++ ext.MultimodalQueries.all

  def all: Seq[CatalogQuery] =
    RelationalQueries.all ++ MiscQueries.all ++ GraphQueries.all ++ EventQueries.all ++ TypedQueries.all ++
      RetailCatalog.all ++ TpcdsOracle.all ++ ImpalaQueries.all ++ pipeline
}
