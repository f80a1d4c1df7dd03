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

  // 196 queries >= 0.5s, min over the round-14 FORCED-EVALUATION
  // board; the 24 queries whose code changed in round 15 (the shingle
  // generator/window-key family dd03/10/15/17-23, tx04/06/08/15-19/
  // 21-23/26, dp10, ss13) re-pinned from the round-15 clean local[32]
  // board (sentinel ratio 0.995, degraded:false), per the
  // re-pin-only-on-code-change convention; dd23/dd24/dd25 newly pinned and
  // tx17 re-pinned (1.378) from post-reshape local[32] median-of-3
  // runs taken after that board.
  // Round 16 re-pins the 9 code-changed queries (windowKey lane fix:
  // dd15/dd20/dd23/dd24/dd25/tx17; doc_id guards: dd19/dd20/tx17;
  // tx21 flat key; tx26 persist) as the MIN of the two round-16 clean
  // local[32] boards (sentinel ratios 1.008 and 0.964, both
  // degraded:false, flagged:{}); tx21 from the second board only (the
  // first predates its flat-key change).
  // The round-16 candidate-narrowed LSH verify sets (lshNearDupPairs/
  // lshProbePairs) re-pin their 9 consumers (dd03/dd05/dd10/dd17/dd18/
  // dd19/dd21/dd22/tx23) from the third clean board (ratio 0.987,
  // flagged:{}) — the narrowing trades a small-sf checkpoint constant
  // for a 25x cut in shuffled set mass at 500k (SCALING.md receipts).
  // Round 18 re-pins the code-changed queries (CC two-hop loop:
  // dd08/dd10/dd19/dd21; sequentialAdmit one-job rounds: dd18;
  // recompute-elimination checkpoints: tx15/tx19/tx22/dp17; plus q38,
  // whose r17 HashAggregate fix never got its re-pin — old floor 4.819
  // vs a 1.4-2.2 s post-fix cost) as the MIN of the two round-18 clean
  // final boards (ratios 1.011 and 0.951, both flagged:{}). DOWNWARD
  // pins only: dd13/ss10/g12 also changed but their round-18 minima
  // (4.03/3.18/1.93) sit above the old floors because this round's
  // environment never matched the old floors' session (sentinel ratio
  // never below 0.885) — keeping the old lower floors is the stricter
  // protection, and no round-18 reading comes near FlagRatio of either.
  // Round 14 changed the instrument itself: Bench previously
  // timed count(), under which Catalyst join-eliminated and
  // projection-pruned part of many plans (dd15's dup chain, tx17's
  // attribution, q38's 12 aggregates never ran in the timed window —
  // SCALING.md receipts). Every pre-r14 floor was therefore the min of
  // a PARTIALLY-PRUNED plan and would flag phantom episodes against
  // honest times; the whole map is re-pinned from the first forced
  // board rather than mixed across instruments.
  val floors: Map[String, Double] = Map(
    "dd03_minhash_lsh" -> 3.105,
    "dd04_simhash" -> 3.280,
    "dd05_ngram_jaccard" -> 3.271,
    "dd06_embedding_neardup" -> 0.556,
    "dd07_simhash_wide" -> 2.723,
    "dd08_dedup_clusters" -> 3.865,
    "dd09_chunk_dedup" -> 1.003,
    "dd10_dedup_clusters_lsh" -> 3.459,
    "dd12_embedding_neardup_lsh" -> 1.500,
    "dd13_semdedup" -> 3.919,
    "dd14_bloom_prefilter" -> 0.644,
    "dd15_substring_dedup" -> 2.348,
    "dd16_cc_star" -> 4.143,
    "dd17_incremental_minhash" -> 3.765,
    "dd18_sequential_admission" -> 3.534,
    "dd19_best_rep_dedup" -> 3.136,
    "dd20_span_removal" -> 2.643,
    "dd21_dedup_impact" -> 3.730,
    "dd22_threshold_sweep" -> 2.849,
    "dd23_substring_dup_estimate" -> 1.855,
    "dd24_dup_source_estimate" -> 1.515,
    "dd25_incremental_substring" -> 1.620,
    "dp08_temperature_sample" -> 0.532,
    "dp10_curation_funnel" -> 2.104,
    "dp12_token_budget_plan" -> 0.844,
    "dp13_balanced_shards" -> 0.654,
    "dp15_bpe_pack" -> 1.079,
    "dp17_plan_reconciliation" -> 0.991,
    "e03_sessionize" -> 0.707,
    "e05_json_extract" -> 0.537,
    "e08_funnel_conversion" -> 0.867,
    "e09_stream_drift" -> 0.619,
    "e11_attribution_window" -> 0.719,
    "g01_chain_count" -> 0.668,
    "g03_triangle_count" -> 1.143,
    "g04_square_count" -> 1.383,
    "g07_pagerank" -> 2.099,
    "g07b_pagerank_top100" -> 1.569,
    "g08_hypercube_triangle" -> 2.071,
    "g08b_hypercube_square" -> 2.570,
    "g08c_hypercube_planned" -> 1.530,
    "g09_kcore_peel" -> 2.034,
    "g10_triangle_estimate" -> 0.603,
    "g11_link_prediction" -> 0.965,
    "g12_bounded_reach" -> 1.752,
    "impala_orig_q19" -> 0.516,
    "impala_orig_q34" -> 0.539,
    "impala_orig_q46" -> 0.547,
    "impala_orig_q59" -> 1.110,
    "impala_orig_qSsMax" -> 0.526,
    "impala_q59" -> 1.118,
    "impala_q65" -> 0.831,
    "impala_q8" -> 0.513,
    "impala_qSsMax" -> 0.556,
    "mm04_media_neardup" -> 0.976,
    "mm05_alignment_filter" -> 1.032,
    "mm06_segment_dedup" -> 1.153,
    "mm07_static_detection" -> 0.821,
    "mm08_video_offset_neardup" -> 1.404,
    "q01_pricing_summary" -> 0.774,
    "q02_scalar_stats" -> 0.891,
    "q03_top_orders" -> 1.183,
    "q04_order_priority" -> 0.610,
    "q05_region_volume" -> 1.290,
    "q08_left_join" -> 0.685,
    "q12_correlated_subquery" -> 1.114,
    "q13_uncorrelated_subquery" -> 0.966,
    "q14_window_rank" -> 0.982,
    "q16_window_ratio" -> 0.821,
    "q17_window_lag" -> 0.559,
    "q18_rollup" -> 0.754,
    "q19_cube" -> 0.693,
    "q20_grouping_sets" -> 0.986,
    "q21_union" -> 0.608,
    "q35_cast_key_join" -> 1.010,
    "q36_approx_distinct" -> 3.325,
    "q37_rollup_rank" -> 1.440,
    "q38_wide_agg" -> 1.680,
    "q39_asof_join" -> 0.989,
    "q41_range_join" -> 0.717,
    "rq10_channel_rollup" -> 0.684,
    "rq14_above_average_returns" -> 0.524,
    "rq17_category_share" -> 0.556,
    "rq18_channel_except" -> 0.559,
    "rq1_category_rollup_rank" -> 0.902,
    "rq22_inventory_rollup" -> 0.705,
    "rq26_basket_size" -> 0.515,
    "rq2_channel_union" -> 0.510,
    "rq4_top_brands_per_state" -> 0.702,
    "rq8_wide_scan_max" -> 0.562,
    "rq9_cross_channel_customers" -> 0.612,
    "ss01_ann_bruteforce" -> 0.771,
    "ss02_ann_lsh" -> 1.915,
    "ss03_ann_ivf" -> 1.592,
    "ss03b_ann_ivf_fixed" -> 1.098,
    "ss06_knn_graph" -> 1.944,
    "ss07_hybrid_search" -> 1.265,
    "ss08_ann_ivf_quantized" -> 0.941,
    "ss09_ann_pq" -> 1.289,
    "ss10_recall_eval" -> 2.174,
    "ss11_mmr_rerank" -> 0.614,
    "ss12_embedding_split_drift" -> 0.784,
    "ss13_ivf_probe_sweep" -> 3.259,
    "tpcds_q1" -> 0.620,
    "tpcds_q10" -> 0.641,
    "tpcds_q11" -> 0.627,
    "tpcds_q11_exact" -> 0.747,
    "tpcds_q14a" -> 3.066,
    "tpcds_q14b" -> 2.170,
    "tpcds_q17" -> 0.799,
    "tpcds_q2" -> 0.806,
    "tpcds_q20" -> 0.502,
    "tpcds_q22" -> 0.701,
    "tpcds_q23a" -> 1.250,
    "tpcds_q23b" -> 1.011,
    "tpcds_q24a" -> 1.192,
    "tpcds_q24b" -> 1.103,
    "tpcds_q25" -> 0.697,
    "tpcds_q28" -> 0.962,
    "tpcds_q29" -> 0.658,
    "tpcds_q30" -> 0.661,
    "tpcds_q31_exact" -> 0.755,
    "tpcds_q31_verbatim" -> 0.621,
    "tpcds_q33" -> 0.541,
    "tpcds_q34" -> 0.528,
    "tpcds_q35" -> 0.636,
    "tpcds_q36" -> 0.648,
    "tpcds_q38" -> 0.553,
    "tpcds_q39a" -> 0.731,
    "tpcds_q39b" -> 0.658,
    "tpcds_q4" -> 0.857,
    "tpcds_q46" -> 0.543,
    "tpcds_q47" -> 1.492,
    "tpcds_q49" -> 0.959,
    "tpcds_q4_exact" -> 0.946,
    "tpcds_q5" -> 0.825,
    "tpcds_q50" -> 0.576,
    "tpcds_q51" -> 0.729,
    "tpcds_q53" -> 0.516,
    "tpcds_q54" -> 0.845,
    "tpcds_q56" -> 0.517,
    "tpcds_q57" -> 1.132,
    "tpcds_q58" -> 0.664,
    "tpcds_q59" -> 0.987,
    "tpcds_q6" -> 0.653,
    "tpcds_q60" -> 0.529,
    "tpcds_q63" -> 0.580,
    "tpcds_q64" -> 1.106,
    "tpcds_q65" -> 0.798,
    "tpcds_q66" -> 0.687,
    "tpcds_q67" -> 1.180,
    "tpcds_q69" -> 0.566,
    "tpcds_q70" -> 0.961,
    "tpcds_q71" -> 0.681,
    "tpcds_q72" -> 2.780,
    "tpcds_q74" -> 0.747,
    "tpcds_q74_exact" -> 0.865,
    "tpcds_q75" -> 1.358,
    "tpcds_q76" -> 0.539,
    "tpcds_q77" -> 0.866,
    "tpcds_q78" -> 1.069,
    "tpcds_q79" -> 0.510,
    "tpcds_q8" -> 0.600,
    "tpcds_q80" -> 0.798,
    "tpcds_q81" -> 0.641,
    "tpcds_q86" -> 0.528,
    "tpcds_q87" -> 0.632,
    "tpcds_q88" -> 1.144,
    "tpcds_q89" -> 0.640,
    "tpcds_q9" -> 0.689,
    "tpcds_q95" -> 0.534,
    "tpcds_q97" -> 0.617,
    "tpcds_q98" -> 0.518,
    "tx04_fingerprint" -> 1.366,
    "tx05_heavy_hitters" -> 0.615,
    "tx05b_heavy_hitters_exact" -> 0.739,
    "tx06_ngram_repetition" -> 1.500,
    "tx08_decontamination" -> 1.553,
    "tx10_tfidf_terms" -> 1.519,
    "tx11_bpe_pairs" -> 0.629,
    "tx12_bm25_search" -> 1.032,
    "tx13_model_quality_filter" -> 0.558,
    "tx14_boilerplate_removal" -> 1.202,
    "tx15_contamination_report" -> 1.698,
    "tx16_lm_bigram_score" -> 1.732,
    "tx17_novelty_score" -> 1.676,
    "tx18_cms_counts" -> 2.495,
    "tx19_scored_decontamination" -> 1.764,
    "tx20_quality_gate" -> 0.757,
    "tx21_source_overlap" -> 2.160,
    "tx22_source_overlap_estimate" -> 1.490,
    "tx23_cross_source_neardup" -> 2.846,
    "tx24_split_drift_psi" -> 0.539,
    "tx25_bpe_tokenize" -> 0.911,
    "tx26_bpe_train" -> 1.071,
    "tx27_tokenizer_fertility" -> 1.075
  )

}
