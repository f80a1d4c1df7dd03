package graft

/** Per-query bench noise floors (seconds, sf0.1, local[32]).
  *
  * Why they exist: the global sentinel (Bench.scala) catches whole-run
  * environment degradation but not LOCALIZED episodes — in the r9
  * driver bench the sentinel passed (ratio 0.86) while ~25-30s of
  * phantom time landed on 6 queries (ss03 was charged 14.26s that
  * re-runs at 1.06s). A per-query floor lets the bench flag any
  * reading that exceeds FLAG_RATIO x its own historical cost, so a
  * consumer can mechanically separate "this query regressed" from
  * "a VM episode intersected this query's reps".
  *
  * Values = the builder's median over spread catalog passes at sf0.1
  * (three full passes, reps non-adjacent — see Bench.scala). Only
  * queries with floor >= 0.5s are pinned: below that, scheduler
  * jitter alone exceeds the flag ratio and the flag would cry wolf.
  * Re-pin a query's floor only when its code changes.
  */
object BenchFloors {
  /** A reading above FLAG_RATIO x floor is flagged as a suspected
    * environment episode (or a real regression — the flag marks it
    * for isolated re-run, it does not excuse it). */
  val FlagRatio = 3.0

  /** The readings that exceed FlagRatio x their pinned floor, as
    * (query, reading, floor) — extracted from Bench's reporting loop so
    * the spec can prove the mechanism actually fires (the r10 version
    * shipped with zero floors pinned, making `"flagged":{}` vacuous). */
  def flagged(readings: Seq[(String, Double)]): Seq[(String, Double, Double)] =
    readings.collect {
      case (k, v) if floors.get(k).exists(f => v > FlagRatio * f) =>
        (k, v, floors(k))
    }

  // 140 queries >= 0.5s, min over 7 round-11 boards + 5 round-13
  // boards (dd18/tx22/tx23 added; g09/tx21 mins refreshed lower)
  val floors: Map[String, Double] = Map(
    "dd03_minhash_lsh" -> 2.323,
    "dd04_simhash" -> 2.412,
    "dd05_ngram_jaccard" -> 1.689,
    "dd06_embedding_neardup" -> 0.518,
    "dd07_simhash_wide" -> 2.105,
    "dd08_dedup_clusters" -> 3.166,
    "dd10_dedup_clusters_lsh" -> 3.084,
    "dd12_embedding_neardup_lsh" -> 1.182,
    "dd13_semdedup" -> 2.847,
    "dd16_cc_star" -> 3.170,
    "dd17_incremental_minhash" -> 0.556,
    "dd18_sequential_admission" -> 2.785,
    "dp10_curation_funnel" -> 0.580,
    "dp12_token_budget_plan" -> 0.502,
    "e03_sessionize" -> 0.565,
    "e04_first_event_dedup" -> 0.505,
    "g01_chain_count" -> 0.500,
    "g03_triangle_count" -> 0.928,
    "g04_square_count" -> 1.165,
    "g07_pagerank" -> 1.277,
    "g07b_pagerank_top100" -> 1.615,
    "g08_hypercube_triangle" -> 1.825,
    "g08b_hypercube_square" -> 1.878,
    "g08c_hypercube_planned" -> 1.375,
    "g09_kcore_peel" -> 1.436,
    "impala_orig_q59" -> 0.568,
    "impala_q59" -> 0.530,
    "impala_q65" -> 0.636,
    "mm04_media_neardup" -> 0.765,
    "mm05_alignment_filter" -> 0.840,
    "mm06_segment_dedup" -> 0.591,
    "q03_top_orders" -> 0.884,
    "q04_order_priority" -> 0.551,
    "q05_region_volume" -> 0.816,
    "q08_left_join" -> 0.537,
    "q12_correlated_subquery" -> 0.797,
    "q13_uncorrelated_subquery" -> 0.679,
    "q14_window_rank" -> 0.645,
    "q18_rollup" -> 0.578,
    "q19_cube" -> 0.520,
    "q20_grouping_sets" -> 0.811,
    "q35_cast_key_join" -> 0.772,
    "q37_rollup_rank" -> 1.074,
    "q41_range_join" -> 0.610,
    "rq10_channel_rollup" -> 0.561,
    "rq11_return_ratio" -> 0.505,
    "rq1_category_rollup_rank" -> 0.735,
    "rq21_inventory_shift" -> 0.511,
    "rq22_inventory_rollup" -> 0.600,
    "rq26_basket_size" -> 0.507,
    "rq4_top_brands_per_state" -> 0.572,
    "rq9_cross_channel_customers" -> 0.515,
    "ss01_ann_bruteforce" -> 0.519,
    "ss02_ann_lsh" -> 1.164,
    "ss03_ann_ivf" -> 1.101,
    "ss03b_ann_ivf_fixed" -> 0.726,
    "ss04_ann_filtered" -> 0.506,
    "ss06_knn_graph" -> 1.135,
    "ss07_hybrid_search" -> 0.902,
    "ss08_ann_ivf_quantized" -> 0.584,
    "ss09_ann_pq" -> 0.611,
    "ss10_recall_eval" -> 0.769,
    "tpcds_q1" -> 0.590,
    "tpcds_q10" -> 0.548,
    "tpcds_q11" -> 0.561,
    "tpcds_q11_exact" -> 0.503,
    "tpcds_q14a" -> 2.041,
    "tpcds_q14b" -> 1.697,
    "tpcds_q17" -> 0.554,
    "tpcds_q2" -> 0.511,
    "tpcds_q22" -> 0.528,
    "tpcds_q23a" -> 0.801,
    "tpcds_q23b" -> 0.831,
    "tpcds_q24a" -> 0.806,
    "tpcds_q24b" -> 0.534,
    "tpcds_q25" -> 0.518,
    "tpcds_q30" -> 0.601,
    "tpcds_q31_exact" -> 0.538,
    "tpcds_q31_verbatim" -> 0.512,
    "tpcds_q33" -> 0.511,
    "tpcds_q34" -> 0.511,
    "tpcds_q35" -> 0.624,
    "tpcds_q36" -> 0.591,
    "tpcds_q38" -> 0.573,
    "tpcds_q39a" -> 0.601,
    "tpcds_q4" -> 0.647,
    "tpcds_q44" -> 0.551,
    "tpcds_q47" -> 1.362,
    "tpcds_q49" -> 0.662,
    "tpcds_q4_exact" -> 0.752,
    "tpcds_q5" -> 0.526,
    "tpcds_q50" -> 0.512,
    "tpcds_q51" -> 0.594,
    "tpcds_q53" -> 0.515,
    "tpcds_q54" -> 0.563,
    "tpcds_q56" -> 0.507,
    "tpcds_q57" -> 0.950,
    "tpcds_q58" -> 0.562,
    "tpcds_q59" -> 0.518,
    "tpcds_q6" -> 0.502,
    "tpcds_q60" -> 0.505,
    "tpcds_q63" -> 0.585,
    "tpcds_q64" -> 0.764,
    "tpcds_q65" -> 0.676,
    "tpcds_q66" -> 0.521,
    "tpcds_q67" -> 0.656,
    "tpcds_q69" -> 0.534,
    "tpcds_q70" -> 0.632,
    "tpcds_q71" -> 0.554,
    "tpcds_q72" -> 1.310,
    "tpcds_q74" -> 0.508,
    "tpcds_q74_exact" -> 0.500,
    "tpcds_q75" -> 0.738,
    "tpcds_q76" -> 0.504,
    "tpcds_q77" -> 0.568,
    "tpcds_q78" -> 0.547,
    "tpcds_q8" -> 0.543,
    "tpcds_q80" -> 0.601,
    "tpcds_q81" -> 0.566,
    "tpcds_q87" -> 0.530,
    "tpcds_q88" -> 0.514,
    "tpcds_q89" -> 0.535,
    "tpcds_q95" -> 0.508,
    "tpcds_q97" -> 0.550,
    "tx04_fingerprint" -> 1.066,
    "tx05_heavy_hitters" -> 0.615,
    "tx05b_heavy_hitters_exact" -> 0.848,
    "tx06_ngram_repetition" -> 0.895,
    "tx08_decontamination" -> 1.149,
    "tx10_tfidf_terms" -> 1.272,
    "tx11_bpe_pairs" -> 0.597,
    "tx12_bm25_search" -> 0.772,
    "tx13_model_quality_filter" -> 0.518,
    "tx16_lm_bigram_score" -> 0.888,
    "tx18_cms_counts" -> 1.048,
    "tx19_scored_decontamination" -> 1.267,
    "tx20_quality_gate" -> 0.578,
    "tx21_source_overlap" -> 1.971,
    "tx22_source_overlap_estimate" -> 0.838,
    "tx23_cross_source_neardup" -> 2.300,
    // round-14 additions >= 0.5s (min over the r14 boards; tx25 /
    // e09 / dp14-class stay unpinned below the noise bar)
    "tx26_bpe_train" -> 0.753,
    "ss12_embedding_split_drift" -> 0.619,
    "dd19_best_rep_dedup" -> 2.728,
    // round-14 session-2 additions >= 0.5s (final session board;
    // tx27 / ss14 / dp16 / e10 stay unpinned below the noise bar)
    "dd20_span_removal" -> 2.640,
    "dd21_dedup_impact" -> 3.550,
    "dd22_threshold_sweep" -> 2.310,
    "mm08_video_offset_neardup" -> 1.050,
    "g11_link_prediction" -> 1.110,
    "g12_bounded_reach" -> 2.110,
    "ss13_ivf_probe_sweep" -> 3.160,
    "e11_attribution_window" -> 0.500,
    "dp17_plan_reconciliation" -> 0.530,
  )

}
