package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan quality gates: these are the properties that decide
  * whether a query survives a 100× scale-up — filter pushdown to the
  * parquet scan, column pruning, broadcast joins for small dims, and
  * whole-stage codegen coverage. A plan regression here is a perf bug
  * even while results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: shipdate filter is pushed to the parquet scan and columns pruned") {
    val plan = planOf(run("q01_pricing_summary"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"missing pushdown:\n$plan")
    // scan must not read join keys it doesn't need (e.g. l_suppkey)
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_suppkey") && !readSchema.contains("l_partkey"),
      s"unpruned scan: $readSchema")
  }

  test("q03: dimension filter pushed below the join") {
    val plan = planOf(run("q03_top_orders"))
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"), s"filter not pushed:\n$plan")
  }

  test("q05: small dims join via broadcast, not shuffle") {
    val plan = planOf(run("q05_region_volume"))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    // nation/region/supplier must NOT appear as sort-merge sides
    val smjCount = "SortMergeJoin".r.findAllIn(plan).size
    assert(smjCount <= 2, s"too many shuffle joins ($smjCount):\n$plan")
  }

  test("q27: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf(run("q27_topk"))
    assert(plan.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$plan")
  }

  test("impala_q19: surrogate-key partition filter pushed to the fact scan, dims broadcast") {
    val plan = planOf(run("impala_q19"))
    // the dialect's point: the sk range prunes the fact scan directly,
    // without waiting for the date_dim join
    assert(plan.contains("GreaterThanOrEqual(ss_sold_date_sk,670)")
      && plan.contains("LessThanOrEqual(ss_sold_date_sk,699)"),
      s"sk range not pushed to store_sales scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a 30-day fact slice joining 5 small dims must broadcast them all:\n$plan")
  }

  test("impala_orig_q59: MAPJOIN hints broadcast store and date_dim") {
    val plan = planOf(run("impala_orig_q59"))
    assert(plan.contains("BroadcastHashJoin"), s"hint ignored:\n$plan")
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // AQE only materializes codegen stages at execution: run first,
    // then read the final plan ("*(n)" marks codegen stages)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val df = run("q01_pricing_summary")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true") && plan.contains("*("),
      s"no codegen stages:\n$plan")
  }

  test("dd06: custom ArrayDotProduct expression participates in codegen") {
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val df = run("dd06_embedding_neardup")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the expression must appear inside a codegen stage ("*(n) ...
    // array_dot"), not a fallback project
    assert(plan.contains("array_dot"), s"expression missing:\n$plan")
    val codegenLines = plan.linesIterator.filter(_.contains("array_dot")).toSeq
    assert(codegenLines.exists(_.contains("*(")), s"array_dot outside codegen:\n$plan")
  }

  test("ss01: ArrayDivide (normalize) participates in codegen; no lambda transform") {
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val df = run("ss01_ann_bruteforce")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // normalize must be the codegen'd array_div expression — the old
    // transform() lambda ran interpreted AND defeated subexpression
    // elimination (fresh LambdaFunction variable ids per call site), so
    // collapsed projections re-evaluated it per referencing expression
    assert(plan.contains("array_div"), s"expression missing:\n$plan")
    val lines = plan.linesIterator.filter(_.contains("array_div")).toSeq
    assert(lines.exists(_.contains("*(")), s"array_div outside codegen:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda re-entered the normalize path:\n$plan")
  }

  test("ss02: signature pass is a union of flat projections, not a Generate") {
    // Generate re-evaluates its input array expression per OUTPUT row;
    // routing the 48 plane dots through explode(array(struct(...)))
    // measured 77 s vs 3.8 s for one 500k-vector pass (SCALING.md).
    // topNeighbors' posexplode of the tiny top-k array is the ONLY
    // generator this plan may contain.
    val plan = planOf(run("ss02_ann_lsh"))
    val nGen = plan.linesIterator.count(l =>
      l.contains("Generate (") || l.trim.startsWith("Generate"))
    // 2 allowed: one per topNeighbors' posexplode consumer (the plan
    // dedups via ReusedExchange; the signature path itself must be none)
    assert(nGen <= 2, s"signature path regressed to a Generate ($nGen found):\n$plan")
    assert(plan.contains("posexplode") || nGen == 0,
      s"unexpected generator kind:\n$plan")
    assert(plan.contains("Union"), s"expected union-stacked signatures:\n$plan")
  }

  test("e01: window aggregation keys the shuffle by (window, event_type)") {
    val plan = planOf(run("e01_tumbling_window"))
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q40: disjunctive date-range predicate is pushed to the scan as an Or filter") {
    val plan = planOf(run("q40_or_ranges"))
    assert(plan.contains("PushedFilters") && plan.contains("Or("),
      s"OR-of-ranges not pushed:\n$plan")
  }

  test("tpcds q55: dimension filters pushed to the snapshot parquet scans") {
    graft.datagen.RetailData.views(spark)
    val plan = planOf(spark.sql(graft.workloads.TpcdsCatalog.byName("q55")))
    // manager filter must reach the item scan, month/year the date scan
    assert(plan.contains("EqualTo(i_manager_id,28)"), s"item filter not pushed:\n$plan")
    assert(plan.contains("EqualTo(d_moy,11)"), s"date filter not pushed:\n$plan")
    // the fact scan must not read money columns this query never touches
    val factRead = plan.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains("ss_")).mkString
    assert(!factRead.contains("ss_net_profit") && !factRead.contains("ss_wholesale_cost"),
      s"unpruned fact scan: $factRead")
  }

  test("tpcds q55: dims broadcast — the fact side never shuffles for the star join") {
    graft.datagen.RetailData.views(spark)
    val plan = planOf(spark.sql(graft.workloads.TpcdsCatalog.byName("q55")))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim join degraded to shuffle:\n$plan")
  }

  test("ss01: ANN top-k is a bounded aggregation, not a per-query window sort") {
    val df = run("ss01_ann_bruteforce")
    val plan = planOf(df)
    assert(!plan.contains("RunningWindowFunction") && !plan.toLowerCase.contains("window"),
      s"window sort crept back into the ANN re-rank:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"bounded top-k aggregation missing:\n$plan")
  }

  test("tpcds q67: rank() <= k plans as WindowGroupLimit, not a full partition sort") {
    // the 8-column ROLLUP explodes the row count; the rk <= 100 filter
    // must push into the window operator (per-partition top-k) or the
    // whole rollup output gets globally sorted at scale
    graft.datagen.RetailData.views(spark)
    val df = spark.sql(graft.workloads.TpcdsCatalog.byName("q67"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter not pushed into the window:\n$plan")
  }

  test("tx07: stratified sample is one scan — no join, no aggregate, one exchange at most") {
    val df = run("tx07_stratified_sample")
    val plan = planOf(df)
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"sampling must be a pure scan+filter:\n$plan")
    // the only allowed exchange is the final ORDER BY's range partitioning
    // (formatted explain lists each node twice: "Exchange (4)" in the tree
    // and "(4) Exchange" in the detail — count tree entries only)
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 1, s"unexpected shuffles ($exchanges):\n$plan")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("text"), s"unpruned scan reads text: $readSchema")
  }

  test("tx08: eval shingle set joins via broadcast — the corpus never shuffles for the probe") {
    val plan = planOf(run("tx08_decontamination"))
    assert(plan.contains("BroadcastHashJoin"), s"eval set not broadcast:\n$plan")
  }

  test("tx06: repetition metrics keep partial (map-side) aggregation") {
    val plan = planOf(run("tx06_ngram_repetition"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no map-side partial aggregation:\n$plan")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      s"unpruned documents scan: $readSchema")
  }

  test("tpcds q14a: repeated cross-channel CTE scans reuse exchanges") {
    // cross_items/avg_sales appear once per channel; without exchange
    // reuse the same aggregation subtree executes 3x over the facts
    graft.datagen.RetailData.views(spark)
    val df = spark.sql(graft.workloads.TpcdsCatalog.byName("q14a"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"no exchange reuse in the multi-channel plan:\n$plan")
  }

  test("dd09: keep-first is a partial-aggregated min, never a content window") {
    val plan = planOf(run("dd09_chunk_dedup"))
    // keep-first must shuffle on chunk CONTENT (co-locates duplicates)…
    assert(plan.contains("hashpartitioning(chunk_text"),
      s"keep-first not keyed by chunk content:\n$plan")
    // …as an AGGREGATION with map-side partials — a row_number() window
    // cannot partial-aggregate, so a boilerplate chunk with millions of
    // copies would funnel them all onto one reducer
    assert(plan.contains("partial_min"),
      s"min-of-struct lost map-side partials:\n$plan")
    assert(!plan.contains("Window"), s"skew-prone window in dedup:\n$plan")
  }

  test("dp01: packing cumsum is one bucket-keyed window — no global sort before it") {
    val plan = planOf(run("dp01_concat_chunks"))
    assert(plan.contains("hashpartitioning(bucket"),
      s"cumsum window not partitioned by bucket:\n$plan")
    // exactly two exchanges: the window's hash partitioning and the
    // final ORDER BY's range partitioning — nothing else may shuffle
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 2, s"unexpected shuffles ($exchanges):\n$plan")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"packing is scan + window only:\n$plan")
  }

  test("dp02: train split is scan + one aggregate, zero joins, text column pruned") {
    val plan = planOf(run("dp02_train_split"))
    assert(!plan.contains("Join"), s"split needs no join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"aggregate lost map-side partials:\n$plan")
  }

  test("tx09: PII pipeline is a pure per-row scan — at most the ORDER BY exchange") {
    val plan = planOf(run("tx09_pii_redact"))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"redaction must be scan + project:\n$plan")
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 1, s"unexpected shuffles ($exchanges):\n$plan")
  }

  test("ss04: metadata filter prunes before scoring; queries broadcast") {
    val plan = planOf(run("ss04_ann_filtered"))
    // the lang predicate must be pushed to the documents parquet scan,
    // not evaluated after the vectors are already scored
    assert(plan.contains("EqualTo(lang,en)"),
      s"lang filter not pushed to the documents scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"query set should broadcast against the filtered corpus:\n$plan")
    assert(plan.contains("partial_topkbyscore"),
      s"top-k must stay a bounded aggregation:\n$plan")
  }

  test("tx10: tf-idf aggregations keep map-side partials; window bounded by doc") {
    val plan = planOf(run("tx10_tfidf_terms"))
    assert(plan.contains("partial_count"),
      s"token counting lost map-side partials:\n$plan")
    assert(plan.contains("hashpartitioning(doc_id"),
      s"top-terms window should partition by doc_id:\n$plan")
  }

  test("dp05: greedy packing is one bucket shuffle feeding a streamed sorted group") {
    val plan = planOf(run("dp05_greedy_pack"))
    // the sequential fill must ride ONE exchange (the bucket hash) plus
    // the final ORDER BY — any more means the typed path re-shuffled
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 2, s"unexpected shuffles ($exchanges):\n$plan")
    assert(plan.contains("MapGroups"), s"typed sorted-groups node missing:\n$plan")
  }

  test("tx11: BPE pair counting keeps partial aggregation and bounded top-k") {
    val plan = planOf(run("tx11_bpe_pairs"))
    assert(plan.contains("partial_count"),
      s"pair counting lost map-side partials:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must not be a global sort:\n$plan")
  }

  test("mm03: frame sampling is a pure scan — no shuffle before the final sort") {
    val plan = planOf(run("mm03_frame_sample"))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"frame sampling must be scan + generate:\n$plan")
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 1, s"unexpected shuffles ($exchanges):\n$plan")
  }

  test("tx12: BM25 stats broadcast back to the scan; top-10 is bounded") {
    val plan = planOf(run("tx12_bm25_search"))
    // the 1-row stats aggregate must broadcast — per-doc scoring never
    // shuffles — and the top-10 must not be a global sort
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"stats row not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 planned as a full sort:\n$plan")
  }

  test("dp07: per-source cap is a bounded aggregation, not a window sort") {
    val plan = planOf(run("dp07_source_cap"))
    assert(!plan.contains("RunningWindowFunction") &&
      !plan.toLowerCase.contains("window"),
      s"window crept into the per-source cap:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"bounded top-k aggregation missing:\n$plan")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("text"), s"cap scan reads text: $readSchema")
  }

  test("ss06: kNN graph ranks via bounded aggregation — no window over the edge stream") {
    val plan = planOf(run("ss06_knn_graph"))
    assert(!plan.contains("RunningWindowFunction") &&
      !plan.toLowerCase.contains("window"),
      s"window sort over the kNN edge stream:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"bounded top-k aggregation missing:\n$plan")
  }

  test("ss07: candidate set and query vector broadcast; final top-10 bounded") {
    val plan = planOf(run("ss07_hybrid_search"))
    assert(plan.contains("BroadcastHashJoin"),
      s"50-row candidate set not broadcast into the embedding join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k planned as a full sort:\n$plan")
  }

  test("tx13: hashed linear scorer is scan -> explode -> one partial-agg shuffle, no join") {
    val plan = planOf(run("tx13_model_quality_filter"))
    assert(!plan.contains("Join"), s"weight lookup must be element_at, not a join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no map-side partial aggregation:\n$plan")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unpruned documents scan: $readSchema")
  }

  test("tx14: boilerplate doc-frequency pre-folds map-side (partial aggregation)") {
    val plan = planOf(run("tx14_boilerplate_removal"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"doc-frequency not partial-aggregated:\n$plan")
    assert(!plan.toLowerCase.contains("window"),
      s"window crept into boilerplate removal:\n$plan")
  }

  test("ss08: probes broadcast into the bucket join; top-5 via bounded aggregation, no window") {
    val plan = planOf(run("ss08_ann_ivf_quantized")).toLowerCase
    assert(plan.contains("broadcasthashjoin"),
      s"probe set not broadcast into the bucket join:\n$plan")
    assert(!plan.contains("windowspecdefinition"),
      s"window crept into the composed ANN:\n$plan")
    assert(plan.contains("objecthashaggregate") || plan.contains("sortaggregate"),
      s"bounded top-k aggregation missing:\n$plan")
  }

  test("g07b: pagerank top-100 via bounded aggregation — no window, no global sort of all nodes") {
    val plan = planOf(run("g07b_pagerank_top100"))
    assert(!plan.toLowerCase.contains("window"),
      s"window crept into the pagerank top-k:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"bounded top-k aggregation missing:\n$plan")
  }

  test("tx15: eval shingles broadcast; kept set is bounded aggregation, not a window") {
    val plan = planOf(run("tx15_contamination_report")).toLowerCase
    assert(plan.contains("broadcasthashjoin"),
      s"eval shingle set not broadcast into the corpus join:\n$plan")
    // wordShingleRows' per-doc lead() windows are fine (bounded by one
    // document); the CAP winner set must NOT be a per-source window —
    // that's dp07's whole point (a 100M-page source would funnel
    // through one window reducer)
    assert(!plan.contains("windowspecdefinition(source"),
      s"per-source window crept into the capped winner set:\n$plan")
    assert(plan.contains("objecthashaggregate") || plan.contains("sortaggregate"),
      s"bounded top-k aggregation missing:\n$plan")
  }

  test("dd15: doc-frequency pre-folds map-side; only digests shuffle, no window") {
    val plan = planOf(run("dd15_substring_dedup"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"doc-frequency not partial-aggregated:\n$plan")
    assert(!plan.toLowerCase.contains("count(distinct"),
      s"countDistinct over the raw window stream:\n$plan")
  }

  test("ss09: PQ scan carries pq_encode/pq_adc_sum codegen expressions, no per-subspace projections") {
    val plan = planOf(run("ss09_ann_pq"))
    assert(plan.contains("pq_encode") && plan.contains("pq_adc_sum"),
      s"compact PQ expressions missing from the plan:\n$plan")
    assert(!plan.contains("ivf_assign(slice"),
      s"per-subspace IvfAssign projections crept back (Janino blowup):\n$plan")
    assert(!plan.toLowerCase.contains("windowspecdefinition"),
      s"window crept into the PQ ranking:\n$plan")
  }

  test("dp09: manifest is dp01's one bucket-window plus a generate — no extra shuffle") {
    val plan = planOf(run("dp09_pack_manifest"))
    // formatted mode lists each node once in the tree and once in the
    // details, so count the numbered detail headers — one exchange for
    // the bucket-cumsum window + one for the presentation sort
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"extra shuffles in the manifest plan ($exchanges):\n$plan")
    assert(plan.contains("Generate"), s"chunk-span explode missing:\n$plan")
  }

  test("g10: edge-sample filter reaches every join leg — no cartesian, no unfiltered leg") {
    val plan = planOf(run("g10_triangle_estimate"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"unbounded join in the sampled plan:\n$plan")
    // the md5 coin must gate each of the three self-join legs BELOW the
    // joins (a filter hoisted above a join would pay full wedge fanout)
    val nCoins = "md5_seg32".r.findAllIn(plan).size
    assert(nCoins >= 3, s"sample filter missing from a join leg ($nCoins):\n$plan")
  }

  test("tx23: attribution joins are hashed and the matrix agg keeps map-side partial") {
    val plan = planOf(run("tx23_cross_source_neardup"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"unbounded join:\n$plan")
    assert(plan.contains("partial_count"), s"no partial aggregation:\n$plan")
  }

  test("mm07: no single-partition exchange — all windows stay per-media") {
    val plan = planOf(run("mm07_static_detection"))
    assert(!plan.contains("SinglePartition"),
      s"a global (single-partition) stage crept into mm07:\n$plan")
  }

  test("dp13: exactly one Window node ranking only the derived <=N/10 tail — the threshold job never enters this plan") {
    val plan = planOf(run("dp13_balanced_shards"))
    // the p90 threshold derivation (histogram cumsum) runs as its own
    // bounded single-row job BEFORE this plan is built; the returned
    // plan must contain exactly the heavy-rank window, gated by the
    // derived literal, plus the windowless hashed light path. A second
    // Window or any HashAggregate here means the histogram subtree
    // leaked into (and is recomputed by) the main per-doc plan.
    val windows = plan.linesIterator.count(_.matches("\\(\\d+\\) Window.*"))
    assert(windows == 1, s"expected 1 Window (heavy tail only), got $windows:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"histogram subtree leaked into the per-doc plan:\n$plan")
  }

  test("tx25: a pure per-row map — no aggregate or join, one presentation-sort exchange, merge chain in codegen") {
    val plan = planOf(run("tx25_bpe_tokenize"))
    // the whole merge application is nested built-in string
    // expressions (all codegen'd) in Project nodes; any aggregate or
    // join here means the tokenizer grew a corpus-sized stage
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"tx25 grew a non-map stage:\n$plan")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"extra shuffle in a per-row map ($exchanges):\n$plan")
    assert(plan.contains("replace("),
      s"merge chain missing from the projection:\n$plan")
  }

  test("dd20: group-first is an aggregate, never a per-digest window; no unbounded join") {
    val plan = planOf(run("dd20_span_removal"))
    // a row_number window partitioned by digest would serialize a
    // billion-doc boilerplate window into one task; the min(struct)
    // aggregate map-combines instead. The only windows allowed are
    // the gram frame's per-doc lead passes — no ranking expression,
    // no single-partition stage, and no Expand (a countDistinct here
    // would double the shuffled digest stream)
    assert(!plan.contains("row_number"),
      s"group-first became a ranking window:\n$plan")
    assert(!plan.contains("Expand"),
      s"a distinct-aggregate Expand crept into the digest pass:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"a global single-partition stage in dd20:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("mm08: frame join hashed with flood guards; the only window is per-pair") {
    val plan = planOf(run("mm08_video_offset_neardup"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"unbounded frame join:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"a global single-partition stage in mm08:\n$plan")
    // the argmax window must be keyed on the media pair, not global
    assert(plan.contains("partial_count"),
      s"vote count lost its map-side partial:\n$plan")
  }

  test("tx27: one projection scan + one map-combined groupBy — no join, bounded output") {
    val plan = planOf(run("tx27_tokenizer_fertility"))
    assert(!plan.contains("Join"), s"tx27 grew a join:\n$plan")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    // one hash exchange for the lang groupBy + the presentation sort
    assert(exchanges <= 2, s"extra shuffles ($exchanges):\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"fertility agg lost its map-side partial:\n$plan")
  }

  test("dp17: one per-source admission window; the only nested-loop joins are the 1-row broadcast totals") {
    val plan = planOf(run("dp17_plan_reconciliation"))
    val windows = plan.linesIterator.count(_.matches("\\(\\d+\\) Window.*"))
    assert(windows == 1,
      s"expected exactly the per-source cumsum window, got $windows:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"a real cartesian crept into dp17:\n$plan")
  }

  test("dd21: attribution join hashed, per-source fold keeps map-side partials, no window") {
    val plan = planOf(run("dd21_dedup_impact"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"source fold lost its map-side partial:\n$plan")
    val windows = plan.linesIterator.count(_.matches("\\(\\d+\\) Window.*"))
    assert(windows == 0, s"a window crept into dd21 ($windows):\n$plan")
  }

  test("dd19: the per-cluster argmax is an aggregate, never a ranking window") {
    val plan = planOf(run("dd19_best_rep_dedup"))
    // dd19's target corpora (boilerplate-padded dup groups) are where
    // one cluster goes mega; a row_number partition would serialize
    // it into one task. The packed-long min map-combines instead.
    assert(!plan.contains("row_number"),
      s"the argmax became a ranking window:\n$plan")
    val windows = plan.linesIterator.count(_.matches("\\(\\d+\\) Window.*"))
    assert(windows == 0, s"a window crept into dd19 ($windows):\n$plan")
    assert(plan.contains("partial_min"),
      s"the argmax lost its map-side partial:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
  }

  test("dd23: the md5 coin filters in the scan stage, the dup join is shuffle-hash, no window") {
    val plan = planOf(run("dd23_substring_dup_estimate"))
    // the estimator's whole value is cutting 7/8 of the stream BEFORE
    // the shuffle: the coin must survive as an in-plan filter (if it
    // disappears, something started sampling post-shuffle or not at
    // all), the hinted shuffle-hash join must hold (SMJ would sort
    // the full sampled stream), and no ranking window may appear
    assert(plan.contains("substring(md5"),
      s"the sampling coin vanished from the plan:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"the dup join lost its shuffle-hash shape:\n$plan")
    val windows = plan.linesIterator.count(_.matches("\\(\\d+\\) Window.*"))
    assert(windows == 0, s"a window crept into dd23 ($windows):\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
  }

  test("tx21: no exchange carries the raw shingle string — the flat (h1, h2) key holds") {
    // The round-16 reshape: tx21's shingle is hashed to the two-long
    // window key at the generator's edge, so the doc_id join-back,
    // the (source, shingle) distinct, and the self-join all move
    // longs. If a raw `el`/`_el` string attribute re-appears in ANY
    // exchange's partitioning, the 2.2x at 500k (ShingleKeyProbe) is
    // silently gone.
    // executedPlan.toString, not formatted explain: the formatted mode
    // moves an Exchange's partitioning expressions to a detail section,
    // so a single-line match can never see them
    val plan = run("tx21_source_overlap")
      .queryExecution.executedPlan.toString
    val badEx = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("el#") || l.contains("_el#"))).toSeq
    assert(badEx.isEmpty,
      s"a string-keyed exchange crept back into tx21:\n${badEx.mkString("\n")}")
    val keyEx = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("h1#"))
    assert(keyEx >= 2,
      s"the flat window-key lanes vanished from tx21's exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
  }

  test("tx17: ONE window-key exchange serves both aggregation levels; the doc-id guard doesn't add a shuffle") {
    // The r15 reshape's whole point: the explicit repartition on
    // (h1, h2) satisfies the clustered distribution of BOTH the finer
    // (h1, h2, doc_id) grouping and the coarser (h1, h2) one, so the
    // 36.7M-row gram stream shuffles ONCE. The round-16 per-row
    // doc_id guard sits between the two levels — a Filter preserves
    // partitioning, and this gate holds it to that.
    val plan = run("tx17_novelty_score")
      .queryExecution.executedPlan.toString
    val keyExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("h1#"))
    assert(keyExchanges == 1,
      s"the gram stream should shuffle exactly once on (h1, h2), " +
        s"found $keyExchanges key exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
  }

  test("tpcds q72: the 10-way join keeps every dimension broadcast") {
    graft.datagen.RetailData.views(spark)
    val df = spark.sql(graft.workloads.TpcdsCatalog.byName("q72"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in q72:\n$plan")
  }
}
